"""Line-list driver tests: ExoMol, PS/TiO binary, Plez VO, lineread CLI."""

import numpy as np
import pytest

from bart_tpu import constants as const
from bart_tpu.linelist.exomol import read_exomol
from bart_tpu.linelist.hitran import TREF
from bart_tpu.linelist.kurucz_mol import (
    gf_to_s296,
    read_plez_vo,
    read_ps_binary,
    write_ps_binary,
)
from bart_tpu.linelist.lineread import build_tli, main as lineread_main
from bart_tpu.linelist.tips import partition_function
from bart_tpu.linelist.tli import load_tli


def test_exomol_roundtrip(tmp_path):
    # 3 states, 2 transitions with known quantities
    states = tmp_path / "mol.states"
    states.write_text(
        "1  0.0000  4  0.5\n"
        "2  1500.0  8  1.5\n"
        "3  3100.0  12  2.5\n"
    )
    trans = tmp_path / "mol.trans"
    trans.write_text(
        "3  1  2.5e-2\n"   # nu = 3100
        "2  1  1.0e-3\n"   # nu = 1500
    )
    pf = tmp_path / "mol.pf"
    pf.write_text("100 50.0\n296 107.1\n1000 300.0\n")

    ll = read_exomol(str(states), str(trans), "CO", str(pf))
    assert ll.nlines == 2
    np.testing.assert_allclose(ll.wn0, [1500.0, 3100.0])
    # check S296 for the first line against the formula:
    c2 = const.C2
    nu, g_up, A, e_lo, q296 = 1500.0, 8.0, 1.0e-3, 0.0, 107.1
    want = (
        g_up * A / (8 * np.pi * const.C_LIGHT * nu**2)
        * np.exp(-c2 * e_lo / TREF) * (1 - np.exp(-c2 * nu / TREF)) / q296
    )
    assert ll.s296[0] == pytest.approx(want, rel=1e-12)
    # wn-range trim:
    ll2 = read_exomol(str(states), str(trans), "CO", str(pf), wn_min=2000.0)
    assert ll2.nlines == 1 and ll2.wn0[0] == pytest.approx(3100.0)


def test_ps_binary_roundtrip(tmp_path):
    wl_nm = np.array([2500.0, 3000.0, 3500.0])   # 4000, 3333, 2857 cm-1
    elo = np.array([100.0, 500.0, 1500.0])
    gf = np.array([1e-6, 3e-5, 2e-4])
    path = tmp_path / "h2o.bin"
    write_ps_binary(str(path), wl_nm, elo, gf)

    ll = read_ps_binary(str(path), "H2O")
    assert ll.nlines == 3
    np.testing.assert_allclose(np.sort(1e7 / ll.wn0), np.sort(wl_nm), rtol=1e-5)
    q296 = float(partition_function("H2O")(TREF))
    want = gf_to_s296(gf[::-1], 1e7 / wl_nm[::-1], elo[::-1], q296)
    np.testing.assert_allclose(ll.s296, want, rtol=1e-4)


def test_plez_vo(tmp_path):
    path = tmp_path / "vo.dat"
    path.write_text(
        "# Plez VO list\n"
        "1000.0  0.1  -2.0\n"
        "1050.0  0.5  -1.5\n"
        "bad line here\n"
        "1100.0  1.0  -3.0\n"
    )
    ll = read_plez_vo(str(path), "VO")
    assert ll.nlines == 3
    np.testing.assert_allclose(np.sort(1e7 / ll.wn0), [1000.0, 1050.0, 1100.0])
    assert np.all(ll.elower >= 0)


def test_lineread_cli(tmp_path):
    # HITRAN record + config, run the CLI main()
    rec = (
        " 61" + " 3028.752190" + " 1.216E-19" + " 7.845E+00"
        + ".0633" + ".0791" + " 1293.1413" + "0.73" + "-.007280" + " " * 93
    )
    par = tmp_path / "ch4.par"
    par.write_text(rec + "\n")
    cfgf = tmp_path / "pyline.cfg"
    cfgf.write_text(
        "[Parameters]\n"
        f"db_list = {par}\n"
        "part_list = implicit\n"
        "dbtype = hit\n"
        f"output = {tmp_path}/out.tli\n"
        "iwav = 2.0\n"
        "fwav = 4.0\n"
    )
    assert lineread_main(["-c", str(cfgf)]) == 0
    data = load_tli(str(tmp_path / "out.tli.npz"))
    assert data.species == ["CH4"]
    assert data.lines["CH4"].nlines == 1


def test_build_tli_multi_db_merge(tmp_path):
    # two PS binaries of the same species merge sorted
    for k, wl in enumerate([np.array([2600.0]), np.array([2510.0])]):
        write_ps_binary(str(tmp_path / f"b{k}.bin"), wl,
                        np.array([100.0]), np.array([1e-5]))
    data = build_tli(
        [str(tmp_path / "b0.bin"), str(tmp_path / "b1.bin")],
        ["ps", "ps"], None, "", 2.0, 4.0,
    )
    ll = data.lines["H2O"]
    assert ll.nlines == 2
    assert np.all(np.diff(ll.wn0) > 0)
