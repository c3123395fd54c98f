"""Line-list driver tests: ExoMol, PS/TiO binary, Plez VO, lineread CLI."""

import numpy as np
import pytest

from bart_tpu import constants as const
from bart_tpu.linelist.exomol import read_exomol
from bart_tpu.linelist.hitran import TREF
from bart_tpu.linelist.kurucz_mol import (
    PS_ISOTOPES,
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
    # wavelengths quantized to 1 part in 2e6; gf to 0.001 dex
    np.testing.assert_allclose(np.sort(1e7 / ll.wn0), np.sort(wl_nm), rtol=1e-5)
    q296 = float(partition_function("H2O")(TREF))
    want = gf_to_s296(gf[::-1], 1e7 / wl_nm[::-1], elo[::-1], q296,
                      iso_frac=PS_ISOTOPES[0][2])
    np.testing.assert_allclose(ll.s296, want, rtol=3e-3)


def test_ps_binary_hand_decoded_golden(tmp_path):
    """Byte-exact golden: hand-packed records in the real Kurucz layout
    (little-endian [i4 iwl][i2 ielo][i2 igflog]; wl = exp(iwl*ln(1+1/2e6))
    nm; gf = 10^(0.001*(|igflog|-16384)); iso = 2*(ielo<0)+(igflog<0))."""
    import struct

    ratiolog = np.log(1.0 + 1.0 / 2e6)
    # record 1: wl=2500 nm, E''=100 cm-1, log10 gf = -6.000, iso 0
    iwl1 = int(round(np.log(2500.0) / ratiolog))          # 15649930
    rec1 = struct.pack("<ihh", iwl1, 100, 16384 - 6000)
    # record 2: wl=3000 nm, E''=750 cm-1, log10 gf = -4.523, iso 3
    # (both sign bits set: ielo<0 and igflog<0)
    iwl2 = int(round(np.log(3000.0) / ratiolog))
    rec2 = struct.pack("<ihh", iwl2, -750, -(16384 - 4523))
    path = tmp_path / "golden.bin"
    path.write_bytes(rec1 + rec2)

    q = np.array([[200.0, 300.0], [150.0, 180.0]])  # (T, Q) table w/ TREF
    pf = (np.array([200.0, 400.0]), np.array([150.0, 200.0]))
    del q
    ll = read_ps_binary(str(path), "H2O", pf_table=pf)
    assert ll.nlines == 2
    # wavelength-sorted file -> wavenumber-DEscending records, reader
    # returns wavenumber-ascending
    np.testing.assert_allclose(
        1e7 / ll.wn0,
        [np.exp(iwl2 * ratiolog), np.exp(iwl1 * ratiolog)], rtol=1e-12)
    np.testing.assert_allclose(ll.elower, [750.0, 100.0])
    assert list(ll.iso) == [3, 0]
    q296 = np.interp(TREF, pf[0], pf[1])
    want0 = gf_to_s296(10.0 ** -4.523, 1e7 / 3000.0, 750.0, q296,
                       PS_ISOTOPES[3][2])
    np.testing.assert_allclose(ll.s296[0], want0, rtol=1e-12)


def test_ps_binary_window_binsearch(tmp_path):
    """The wavenumber window is cut by binary search on the packed iwl
    field without reading the whole file."""
    wl_nm = np.linspace(2000.0, 5000.0, 301)  # sorted by wavelength
    elo = np.full(301, 200.0)
    gf = np.full(301, 1e-5)
    path = tmp_path / "win.bin"
    write_ps_binary(str(path), wl_nm, elo, gf)
    # window 3000-4000 cm-1 <-> 2500-3333.3 nm
    ll = read_ps_binary(str(path), "H2O", wn_min=3000.0, wn_max=4000.0)
    ratiolog = np.log(1.0 + 1.0 / 2e6)
    wl_q = np.exp(np.round(np.log(wl_nm) / ratiolog) * ratiolog)
    want = np.sum((1e7 / wl_q > 3000.0) & (1e7 / wl_q < 4000.0))
    assert ll.nlines == want
    assert np.all(ll.wn0 > 3000.0) and np.all(ll.wn0 < 4000.0)


def test_tio_binary_16byte_stride(tmp_path):
    """Schwenke TiO: same packing on a 16-byte record stride."""
    from bart_tpu.linelist.kurucz_mol import TIO_ISOTOPES, read_tio_binary

    wl_nm = np.array([500.0, 700.0, 900.0])
    elo = np.array([0.0, 3000.0, 12000.0])
    gf = np.array([1e-3, 1e-4, 1e-5])
    path = tmp_path / "tio.bin"
    write_ps_binary(str(path), wl_nm, elo, gf, iso=[0, 1, 2],
                    record_size=16)
    assert path.stat().st_size == 3 * 16
    ll = read_tio_binary(str(path), "TiO")
    assert ll.nlines == 3
    np.testing.assert_allclose(np.sort(1e7 / ll.wn0), wl_nm, rtol=1e-5)
    assert sorted(ll.iso.tolist()) == [0, 1, 2]
    assert TIO_ISOTOPES[2][2] > 0.7  # 48TiO dominant (50TiO folded in)


def test_kurucz_partition_reader(tmp_path):
    from bart_tpu.linelist.kurucz_mol import read_kurucz_partition

    path = tmp_path / "h2opartfn.dat"
    path.write_text(
        "Partition functions for H2O isotopologues\n"
        "   T     1H1H16O   1H1H17O   1H1H18O   1H2H16O\n"
        "  100.0   50.0      51.0      52.0      53.0\n"
        "  296.0  174.0     176.0     178.0     180.0\n"
        " 1000.0  900.0     910.0     920.0     930.0\n"
    )
    t, q = read_kurucz_partition(str(path))
    np.testing.assert_allclose(t, [100.0, 296.0, 1000.0])
    np.testing.assert_allclose(q, [51.5, 177.0, 915.0])


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


def test_lineread_cli_validate(tmp_path, capsys):
    """--validate: dry run, per-record diagnostics, no output file;
    exit 0 on a clean file, 1 when records were dropped."""
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
    assert lineread_main(["-c", str(cfgf), "--validate"]) == 0
    assert not (tmp_path / "out.tli.npz").exists()     # dry run
    assert "1/1 records parsed" in capsys.readouterr().out

    # corrupt the wavenumber field -> dropped record -> exit 1
    bad = rec[:3] + "  GARBAGE   " + rec[15:]
    par.write_text(rec + "\n" + bad + "\n")
    assert lineread_main(["-c", str(cfgf), "--validate"]) == 1
    out = capsys.readouterr().out
    assert "line 2" in out and "wn0" in out


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


def test_molfile_registry(tmp_path):
    """molecules.dat-format molfile extends/overrides the registry
    (reference: scripts/broadening.py:146-188 readmol)."""
    from bart_tpu.linelist.molecules import (
        MOLECULES, get_molecule, load_molfile, register_molecules,
    )

    path = tmp_path / "molecules.dat"
    path.write_text(
        "Molecular data file\n"
        "more header text\n"
        "# ID  name  mass  diameter\n"
        "# --------------------------\n"
        "101   PH3   33.997238  4.23\n"
        "102   CH4   16.031300  9.99\n"
        "\n"
        "trailing text ignored\n"
    )
    mols = load_molfile(str(path))
    assert set(mols) == {"PH3", "CH4"}
    old_ch4 = MOLECULES["CH4"]
    try:
        register_molecules(mols)
        ph3 = get_molecule("PH3")
        assert ph3.mass == 33.997238 and ph3.diameter == 4.23
        # override takes the molfile diameter but keeps registry
        # spectroscopic constants
        ch4 = get_molecule("CH4")
        assert ch4.diameter == 9.99
        assert ch4.rot_const == old_ch4.rot_const
        assert ch4.hitran_id == old_ch4.hitran_id
    finally:
        MOLECULES["CH4"] = old_ch4
        MOLECULES.pop("PH3", None)


def test_exomol_broad_files(tmp_path):
    """ExoMol .broad J''-dependent widths mix over the H2/He bath and
    land in gamma_air/n_air (per-atm convention)."""
    from bart_tpu.linelist.exomol import read_broad, read_exomol

    states = tmp_path / "mol.states"
    states.write_text(
        "1  0.0000  4  0\n"
        "2  1500.0  8  1\n"
        "3  3100.0  12  2\n"
    )
    trans = tmp_path / "mol.trans"
    trans.write_text("3  1  2.5e-2\n" "3  2  1.0e-3\n")  # J''=0 and J''=1
    h2b = tmp_path / "mol__H2.broad"
    h2b.write_text("a0  0.0800  0.40  0\na0  0.0700  0.45  1\n")
    heb = tmp_path / "mol__He.broad"
    heb.write_text("a0  0.0400  0.30  0\na0  0.0300  0.35  1\n")

    jt, gt, nt, dg, dn = read_broad(str(h2b))
    np.testing.assert_allclose(gt, [0.08, 0.07])

    pf = tmp_path / "mol.pf"
    pf.write_text("100 50.0\n296 107.1\n1000 300.0\n")
    ll = read_exomol(str(states), str(trans), "CO", str(pf),
                     broadeners=[(str(h2b), 0.85), (str(heb), 0.15)])
    assert ll.nlines == 2
    # line order: wn ascending -> [1500 (J''=1), 3100 (J''=0)]
    g_want_j1 = (0.85 * 0.07 + 0.15 * 0.03) * 1.01325
    g_want_j0 = (0.85 * 0.08 + 0.15 * 0.04) * 1.01325
    np.testing.assert_allclose(ll.gamma_air, [g_want_j1, g_want_j0],
                               rtol=1e-12)
    n_want_j0 = 0.85 * 0.40 + 0.15 * 0.30
    np.testing.assert_allclose(ll.n_air[1], n_want_j0, rtol=1e-12)
