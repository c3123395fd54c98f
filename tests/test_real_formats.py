"""External-format golden tests on hand-authored, format-faithful fixtures.

Every fixture in this file is composed BY HAND, byte-for-byte, following
the published format definitions — none is produced by a bart_tpu writer
(no writer-reader roundtrips).  Expected values are literals obtained by
independently decoding the fixture bytes (and, where stated, from
published reference data), so these tests pin the readers' column
layouts and unit conventions, not their self-consistency.

Formats covered (reference consumption points in parentheses):

* HITRAN 2004+ 160-char .par records   (pylineread dbtype 'hit';
  format: Rothman et al. 2005, JQSRT 96, 139, Table 1)
* transit/Borysow CIA grid tables      (csfile; cia.c)
* HITRAN-format CIA blocks             (manual tex:508 "HITRAN
  cross-section format"; Richard et al. 2012, JQSRT 113, 1276)
* Kurucz .pck stellar grids            (code/kurucz_inten.py:160-317)
* NIST-JANAF ASCII thermo tables       (TEA readJANAF.py)
* CEA thermo.inp NASA-9 records        (TEA-grade thermo, incl. ions)
* ExoMol .states/.trans/.pf/.broad     (modern line-list standard)
* Plez VO ASCII lists                  (pylineread dbtype 'vo')

Published-value anchors used below:
* CO X1Sigma+ constants: band origin nu0 = 2143.2711 cm-1,
  B0 = 1.922529, B1 = 1.905017 cm-1 (Le Floch 1991 / HITRAN CO) —
  R(0) = nu0 + 2 B1 = 2147.081134, P(1) = nu0 - 2 B0 = 2139.426042.
* JANAF CO(g): S(298.15) = 197.653 J/mol/K, dHf(298.15) = -110.527
  kJ/mol (Chase 1998).
* CEA 'e-' record: a3 = 2.5, b1 = -745.375, b2 = -11.7208 — exactly
  reproducing H(298.15) = 0 and S(298.15) = 20.98 J/mol/K
  (Sackur-Tetrode), asserted from first principles below.
"""

import os

import numpy as np
import pytest

from bart_tpu import constants as const
from bart_tpu.linelist.hitran import TREF, parse_par_bytes

R_GAS = 8.31446261815324


# ---------------------------------------------------------------------------
# HITRAN .par


def _par_record(mol, iso, nu12, s10, a10, gair5, gself5, e10, nair4, dair8,
                gp7="    3.0", gpp7="    1.0"):
    """Assemble one 160-char HITRAN-2004 record from hand-written field
    strings (field widths per Rothman et al. 2005 Table 1); the
    assembly only concatenates — every field's content is authored by
    hand above."""
    fields = [
        (f"{mol:2d}", 2), (f"{iso:1d}", 1), (nu12, 12), (s10, 10),
        (a10, 10), (gair5, 5), (gself5, 5), (e10, 10), (nair4, 4),
        (dair8, 8),
        ("             1 ", 15),   # V' global quanta (class 1)
        ("             0 ", 15),   # V''
        ("               ", 15),   # Q' local quanta
        ("     R  0      ", 15),   # Q''
        ("457774", 6), (" 5 2 1 1 5 7", 12), (" ", 1),
        (gp7, 7), (gpp7, 7),
    ]
    for s, w in fields:
        assert len(s) == w, (s, w)
    rec = "".join(s for s, _ in fields)
    assert len(rec) == 160
    return rec


# Hand-authored records: 12C16O fundamental R(0)/P(1), 13C16O R(0),
# 12C16O 2-0 R(0), and one CH4 nu3 line.  Line positions from the
# published CO constants in the module docstring; S296 of the first two
# records computed by hand from the HITRAN intensity definition with
# A(R0) = 33.66 s-1, A(P1) = 11.0 s-1, Q296(CO) = 107.42 (worked out
# again independently in test_exomol_matches_hitran_convention).
PAR_FIXTURE = "\n".join([
    _par_record(5, 1, " 2147.081134", " 2.706E-19", " 3.366E+01",
                ".0601", ".0664", "    0.0000", "0.69", "-.000026"),
    _par_record(5, 1, " 2139.426042", " 2.914E-20", " 1.100E+01",
                ".0658", ".0712", "    3.8450", "0.71", "-.000021",
                gp7="    1.0", gpp7="    3.0"),
    _par_record(5, 2, " 2099.083004", " 2.890E-21", " 3.200E+01",
                ".0601", ".0664", "    0.0000", "0.69", "-.000025"),
    _par_record(5, 1, " 4263.837197", " 2.217E-21", " 7.000E-01",
                ".0572", ".0610", "    0.0000", "0.66", "-.002241"),
    _par_record(6, 1, " 3018.920000", " 1.123E-19", " 2.500E+01",
                ".0600", ".0760", "   62.8768", "0.75", "-.004000"),
]) + "\n"


def test_hitran_par_fixed_width_fields():
    out = parse_par_bytes(PAR_FIXTURE.encode())
    assert set(out) == {"CO", "CH4"}
    co, ch4 = out["CO"], out["CH4"]
    assert co.nlines == 4 and ch4.nlines == 1

    # sorted ascending by wavenumber
    np.testing.assert_allclose(
        co.wn0, [2099.083004, 2139.426042, 2147.081134, 4263.837197],
        rtol=0, atol=0)
    np.testing.assert_allclose(
        co.s296, [2.890e-21, 2.914e-20, 2.706e-19, 2.217e-21], rtol=0)
    np.testing.assert_allclose(
        co.elower, [0.0, 3.8450, 0.0, 0.0], rtol=0)
    np.testing.assert_allclose(
        co.gamma_air, [0.0601, 0.0658, 0.0601, 0.0572], rtol=0)
    np.testing.assert_allclose(
        co.gamma_self, [0.0664, 0.0712, 0.0664, 0.0610], rtol=0)
    np.testing.assert_allclose(co.n_air, [0.69, 0.71, 0.69, 0.66], rtol=0)
    np.testing.assert_array_equal(co.iso, [2, 1, 1, 1])

    assert ch4.wn0[0] == 3018.920000
    assert ch4.s296[0] == 1.123e-19
    assert ch4.elower[0] == 62.8768
    assert ch4.iso[0] == 1


def test_hitran_par_native_scanner_parity(tmp_path):
    """The C++ fast path decodes the same hand-authored bytes."""
    path = tmp_path / "fixture.par"
    path.write_text(PAR_FIXTURE)
    try:
        from bart_tpu.native import hitran_native

        out = hitran_native.read_par(str(path), None)
    except Exception:
        pytest.skip("native scanner unavailable")
    ref = parse_par_bytes(PAR_FIXTURE.encode())
    for name in ref:
        for f in ("wn0", "s296", "elower", "gamma_air", "gamma_self",
                  "n_air", "iso"):
            np.testing.assert_allclose(
                getattr(out[name], f), getattr(ref[name], f), rtol=0,
                err_msg=f"{name}.{f}")

    # D-exponent + CRLF + 59-char truncation parity (real-archive
    # quirks; strtod would silently keep only the mantissa of a
    # D-exponent field without the scanner's normalization)
    rec = _par_record(5, 1, " 2147.081134", " 2.706D-19", " 3.366E+01",
                      ".0601", ".0664", "    0.0000", "0.69", "-.000026")
    quirks = tmp_path / "quirks.par"
    quirks.write_bytes((rec[:59] + "\r\n").encode())
    got = hitran_native.read_par(str(quirks), None)["CO"]
    assert got.s296[0] == 2.706e-19
    assert got.wn0[0] == 2147.081134

    # corrupt numeric field: the native path must REFUSE (escalating
    # to the diagnostic parser), never ingest garbage
    bad = tmp_path / "bad.par"
    bad.write_text(rec[:3] + "  GARBAGE   " + rec[15:] + "\n")
    with pytest.raises(Exception):
        hitran_native.read_par(str(bad), None)

    # an all-BLANK required field (here wn0) must also refuse — it
    # previously parsed as 0.0, planting a wn=0 line in the list,
    # while the diagnostic parser reports it
    blank = tmp_path / "blank.par"
    blank.write_text(rec[:3] + " " * 12 + rec[15:] + "\n")
    with pytest.raises(Exception):
        hitran_native.read_par(str(blank), None)
    # blank OPTIONAL fields (air width, col 35:40) still default to 0
    opt = tmp_path / "opt.par"
    opt.write_text(rec[:35] + " " * 5 + rec[40:] + "\n")
    got_opt = hitran_native.read_par(str(opt), None)["CO"]
    assert got_opt.gamma_air[0] == 0.0


# ---------------------------------------------------------------------------
# CIA: transit/Borysow grid format and HITRAN block format

BORYSOW_CIA = """\
# Borysow-style H2-H2 collision-induced absorption excerpt
# (transit csfile format: cm-1 amagat-2)
i H2 H2
t  400.0  600.0  1000.0
   20.00  1.405e-07  2.361e-07  4.631e-07
  400.00  5.114e-06  6.334e-06  8.012e-06
  800.00  2.552e-06  3.802e-06  6.531e-06
"""


def test_borysow_cia_grid_table(tmp_path):
    from bart_tpu.opacity.cia import cia_extinction, read_cia

    path = tmp_path / "CIA_H2H2.dat"
    path.write_text(BORYSOW_CIA)
    tab = read_cia(str(path))
    assert tab.species == ("H2", "H2")
    np.testing.assert_allclose(tab.temps, [400.0, 600.0, 1000.0], rtol=0)
    np.testing.assert_allclose(tab.wn, [20.0, 400.0, 800.0], rtol=0)
    # absorption is [nT, nwn]: row 0 = the 400 K column of the file
    np.testing.assert_allclose(
        tab.absorption[0], [1.405e-07, 5.114e-06, 2.552e-06], rtol=0)
    np.testing.assert_allclose(
        tab.absorption[2], [4.631e-07, 8.012e-06, 6.531e-06], rtol=0)

    # bilinear interpolation at T=500 (midpoint), wn=400 (on-grid):
    # hand value = (5.114e-06 + 6.334e-06)/2, times n1*n2 amagat^2
    import jax.numpy as jnp

    ext = np.asarray(cia_extinction(
        jnp.asarray(tab.temps), jnp.asarray(tab.wn),
        jnp.asarray(tab.absorption),
        jnp.asarray([400.0]), jnp.asarray([500.0]),
        jnp.asarray([2.0]), jnp.asarray([3.0]),
    ))
    np.testing.assert_allclose(
        ext[0, 0], 6.0 * (5.114e-06 + 6.334e-06) / 2.0, rtol=1e-6)


HITRAN_CIA = """\
              H2-H2      20.000    400.000      4  300.0 2.210E-45   6.0 bart fixture 19
   20.000 1.120E-47
  120.000 7.810E-46
  355.000 2.210E-45
  400.000 2.060E-45
              H2-H2      20.000    400.000      4  200.0 2.900E-45   6.0 bart fixture 19
   20.000 1.400E-47
  120.000 9.600E-46
  355.000 2.900E-45
  400.000 2.700E-45
"""


def test_hitran_cia_blocks(tmp_path):
    """HITRAN CIA blocks (Richard et al. 2012 layout: per-T header +
    wn/alpha rows in cm^5 molecule-2), including the cm^5 -> cm-1
    amagat-2 conversion by Loschmidt^2 and T-sorting of blocks."""
    from bart_tpu.opacity.cia import LOSCHMIDT, read_cia_hitran

    path = tmp_path / "H2-H2_2011.cia"
    path.write_text(HITRAN_CIA)
    tab = read_cia_hitran(str(path))
    assert tab.species == ("H2", "H2")
    np.testing.assert_allclose(tab.temps, [200.0, 300.0], rtol=0)
    np.testing.assert_allclose(tab.wn, [20.0, 120.0, 355.0, 400.0], rtol=0)
    np.testing.assert_allclose(
        tab.absorption[0], np.array([1.4e-47, 9.6e-46, 2.9e-45, 2.7e-45])
        * LOSCHMIDT**2, rtol=1e-12)
    # physical magnitude: the rototranslational peak in Borysow units is
    # a few 1e-6 cm-1 amagat-2
    assert 1e-6 < tab.absorption[0, 2] < 3e-6


# ---------------------------------------------------------------------------
# Kurucz .pck stellar grid

_PCK_WAVE = ["   400.000   450.000   500.000   550.000",
             "   600.000   650.000   700.000   750.000"]
_PCK_FLUX = {
    (5750.0, 4.0): " 1.918E-05 2.130E-05 2.201E-05 2.195E-05"
                   " 2.135E-05 2.046E-05 1.943E-05 1.833E-05",
    (5750.0, 4.5): " 1.925E-05 2.141E-05 2.215E-05 2.210E-05"
                   " 2.149E-05 2.059E-05 1.955E-05 1.844E-05",
    (6000.0, 4.5): " 2.305E-05 2.486E-05 2.517E-05 2.462E-05"
                   " 2.367E-05 2.249E-05 2.122E-05 1.996E-05",
}
_PCK_CONT = " 2.000E-05 2.200E-05 2.300E-05 2.300E-05" \
            " 2.200E-05 2.100E-05 2.000E-05 1.900E-05"


def _pck_text():
    lines = ["VTURB 2.0E+05  L/H 1.25 NOVER NEW ODF END"]
    lines += _PCK_WAVE
    for (t, g), flux in _PCK_FLUX.items():
        lines.append(f"TEFF   {t:5.0f}.  GRAVITY {g:7.5f} LTE")
        lines.append(flux)
        lines.append(_PCK_CONT)
    return "\n".join(lines) + "\n"


def test_kurucz_pck_layout(tmp_path):
    """Hand-authored .pck excerpt in the Kurucz layout the reference
    reader decodes (code/kurucz_inten.py:160-317): header line ending
    'END', 10-char wavelength fields [nm], TEFF/GRAVITY model headers
    at fixed columns, 10-char flux records [erg cm-2 s-1 Hz-1 sr-1
    Eddington flux] followed by a continuum block."""
    from bart_tpu.io.kurucz import read_kurucz_pck, stellar_flux

    path = tmp_path / "fp00k2.pck"
    path.write_text(_pck_text())
    grid = read_kurucz_pck(str(path))

    np.testing.assert_allclose(grid.temp, [5750.0, 5750.0, 6000.0], rtol=0)
    np.testing.assert_allclose(grid.grav, [4.0, 4.5, 4.5], rtol=0)
    # wavelengths nm -> m
    np.testing.assert_allclose(
        grid.wave_m, np.array([400, 450, 500, 550, 600, 650, 700, 750])
        * 1e-9, rtol=1e-12)
    # intensity: raw x4 (Eddington flux -> flux) x1e-3 (cgs->MKS)
    np.testing.assert_allclose(
        grid.inten[0, 0], 1.918e-05 * 4.0e-3, rtol=1e-12)
    np.testing.assert_allclose(
        grid.inten[2, 7], 1.996e-05 * 4.0e-3, rtol=1e-12)

    # nearest-model selection (wine.readkurucz semantics): T=5800 ->
    # 5750; logg=4.4 -> 4.5; first model with temp==5750, grav>=4.5
    starfl, starwn, tmod, gmod = stellar_flux(grid, 5800.0, 4.4)
    assert (tmod, gmod) == (5750.0, 4.5)
    # ascending wavenumber = reversed wavelength order; units:
    # W m-2 Hz-1 -> erg s-1 cm-2 cm is x1e3 x pi x (100 c_SI)
    c_si = 2.99792458e8
    np.testing.assert_allclose(
        starwn[-1], 1.0 / (400e-9) * 1e-2, rtol=1e-12)   # 25000 cm-1
    np.testing.assert_allclose(
        starfl[-1], 1.925e-05 * 4e-3 * 1e3 * np.pi * 1e2 * c_si,
        rtol=1e-12)
    np.testing.assert_allclose(
        starfl[0], 1.844e-05 * 4e-3 * 1e3 * np.pi * 1e2 * c_si,
        rtol=1e-12)


# ---------------------------------------------------------------------------
# JANAF ASCII thermo table

JANAF_CO = """\
Carbon Monoxide (CO)\tC1O1(g)
T(K)\tCp\tS\t-[G-H(Tr)]/T\tH-H(Tr)\tdelta-f H\tdelta-f G\tlog Kf
0\t0.\t0.\tINFINITE\t-8.671\t-113.805\t-113.805\tINFINITE
100\t29.104\t165.850\t223.539\t-5.769\t-112.415\t-120.239\t62.807
298.15\t29.142\t197.653\t197.653\t0.\t-110.527\t-137.163\t24.030
500\t29.794\t212.831\t200.968\t5.931\t-110.003\t-155.414\t16.236
1000\t33.183\t234.538\t212.848\t21.690\t-111.983\t-200.275\t10.461
2000\t36.250\t258.714\t230.342\t56.744\t-118.896\t-286.034\t7.470
"""


def test_janaf_co_table(tmp_path):
    """NIST-JANAF ASCII excerpt for CO(g) (values from Chase 1998; the
    298.15 K anchors S=197.653 J/mol/K, dHf=-110.527 kJ/mol are the
    published table entries).  Checks the TEA formation-convention
    formula g/RT = -gef/R + dHf(298)/(RT), row filtering (the T=0
    INFINITE row and headers are skipped), and cross-validates against
    the independently-sourced GRI-Mech NASA-7 CO polynomial."""
    from bart_tpu.chem.thermo_tables import (
        builtin_tables, nasa7_gibbs_rt, read_janaf, read_nasa7,
        BUILTIN_NASA7,
    )

    path = tmp_path / "CO.janaf.txt"
    path.write_text(JANAF_CO)
    T, g_rt = read_janaf(str(path))
    np.testing.assert_allclose(T, [100, 298.15, 500, 1000, 2000], rtol=0)

    # hand-computed from the fixture numbers:
    g298 = -197.653 / R_GAS + (-110527.0) / (R_GAS * 298.15)
    assert g298 == pytest.approx(-68.3583, abs=2e-4)
    assert g_rt[1] == pytest.approx(g298, rel=1e-12)
    g1000 = -212.848 / R_GAS + (-110527.0) / (R_GAS * 1000.0)
    assert g_rt[3] == pytest.approx(g1000, rel=1e-12)

    # cross-validation: two independent published sources (JANAF table
    # vs GRI-Mech 3.0 NASA-7 fit) agree on CO's g/RT to <0.3%
    rec = read_nasa7(BUILTIN_NASA7)["CO"]
    for Tq, gq in [(298.15, g_rt[1]), (500.0, g_rt[2]),
                   (1000.0, g_rt[3]), (2000.0, g_rt[4])]:
        g_gri = float(nasa7_gibbs_rt(rec, np.array([Tq]))[0])
        assert gq == pytest.approx(g_gri, rel=3e-3), Tq


# ---------------------------------------------------------------------------
# NASA-9 (CEA thermo.inp) — the free-electron record from first principles

CEA_ELECTRON = """\
e-                Ref-Species. Chase,1998 3/82.
 3 g12/98 E   1.00    0.00    0.00    0.00    0.00 0   0.000548579903          0.000
    298.150   1000.0007 -2.0 -1.0  0.0  1.0  2.0  3.0  4.0  0.0         6197.428
 0.000000000D+00 0.000000000D+00 2.500000000D+00 0.000000000D+00 0.000000000D+00
 0.000000000D+00 0.000000000D+00                -7.453750000D+02-1.172081224D+01
   1000.000   6000.0007 -2.0 -1.0  0.0  1.0  2.0  3.0  4.0  0.0         6197.428
 0.000000000D+00 0.000000000D+00 2.500000000D+00 0.000000000D+00 0.000000000D+00
 0.000000000D+00 0.000000000D+00                -7.453750000D+02-1.172081224D+01
   6000.000  20000.0007 -2.0 -1.0  0.0  1.0  2.0  3.0  4.0  0.0         6197.428
 0.000000000D+00 0.000000000D+00 2.500000000D+00 0.000000000D+00 0.000000000D+00
 0.000000000D+00 0.000000000D+00                -7.453750000D+02-1.172081224D+01
"""


def test_nasa9_cea_electron_record(tmp_path):
    """CEA thermo.inp record for 'e-' (monatomic ideal gas: a3=2.5,
    b1=-745.375, b2=-11.7208) in the authentic 16-char D-exponent
    column layout, including the glued 'T_high + ncoeff' quirk of real
    CEA files ('1000.0007').  The coefficients reproduce two published
    anchors exactly: H(298.15)=0 (CEA assigns e- zero formation
    enthalpy) and S(298.15)=20.98 J/mol/K (Sackur-Tetrode)."""
    from bart_tpu.chem.thermo_tables import nasa9_gibbs_rt, read_nasa9

    path = tmp_path / "thermo.inp"
    path.write_text(CEA_ELECTRON)
    recs = read_nasa9(str(path))
    assert "E-" in recs
    ivs = recs["E-"]
    assert len(ivs) == 3
    t_lo, t_hi, a, b1, b2 = ivs[0]
    assert t_lo == 298.15 and abs(t_hi - 1000.0) < 1e-2
    np.testing.assert_allclose(a, [0, 0, 2.5, 0, 0, 0, 0], rtol=0)
    assert b1 == -745.375
    assert b2 == pytest.approx(-11.72081224, rel=1e-12)

    # published anchors:
    T0 = 298.15
    h_rt = 2.5 + b1 / T0                      # H(298.15)/RT
    assert h_rt == pytest.approx(0.0, abs=1e-6)
    s_r = 2.5 * np.log(T0) + b2               # S(298.15)/R
    assert s_r * R_GAS == pytest.approx(20.98, abs=0.01)

    # evaluator at 500 K, hand value
    g = float(nasa9_gibbs_rt(ivs, np.array([500.0]))[0])
    want = (2.5 + b1 / 500.0) - (2.5 * np.log(500.0) + b2)
    assert g == pytest.approx(want, rel=1e-12)


# ---------------------------------------------------------------------------
# ExoMol (.states/.trans/.pf/.broad) with real CO spectroscopy

EXOMOL_STATES = """\
           1     0.000000      1       0
           2     3.845058      3       1
           3    11.535150      5       2
           4  2143.271100      1       0
           5  2147.081134      3       1
"""
EXOMOL_TRANS = """\
           5           1 3.3660E+01
           4           2 1.1000E+01
"""
EXOMOL_PF = "  100.0   36.37\n  296.0  107.42\n 1000.0  362.17\n"
EXOMOL_BROAD_H2 = "a0 0.0860 0.500     0\na0 0.0820 0.480     1\n"
EXOMOL_BROAD_HE = "a1 0.0220 0.300\n"


def test_exomol_matches_hitran_convention(tmp_path):
    """ExoMol CO fragment built from the published CO constants (module
    docstring): R(0) at 2147.081134 and P(1) at 2139.426042 cm-1.  The
    assembled S296 must equal the HITRAN .par fixture's intensity
    (which was hand-computed from the same Einstein-A via the HITRAN
    definition) — a cross-format consistency check between two
    independent readers."""
    from bart_tpu.linelist.exomol import read_exomol

    (tmp_path / "CO.states").write_text(EXOMOL_STATES)
    (tmp_path / "CO.trans").write_text(EXOMOL_TRANS)
    (tmp_path / "CO.pf").write_text(EXOMOL_PF)
    ll = read_exomol(str(tmp_path / "CO.states"), str(tmp_path / "CO.trans"),
                     "CO", str(tmp_path / "CO.pf"))
    assert ll.nlines == 2
    np.testing.assert_allclose(ll.wn0, [2139.426042, 2147.081134],
                               rtol=1e-12)
    np.testing.assert_allclose(ll.elower, [3.845058, 0.0], rtol=1e-12)

    # HITRAN-convention intensity from the Einstein A:
    par = parse_par_bytes(PAR_FIXTURE.encode())["CO"]
    s_r0_par = par.s296[par.wn0 == 2147.081134][0]
    s_p1_par = par.s296[par.wn0 == 2139.426042][0]
    # the .par fields carry 4 significant digits
    assert ll.s296[1] == pytest.approx(s_r0_par, rel=5e-4)
    assert ll.s296[0] == pytest.approx(s_p1_par, rel=5e-4)

    # .broad bath mixing: gamma = (0.85 g_H2(J'') + 0.15 g_He) x
    # 1.01325 (per-bar -> per-atm); R(0) has J''=0
    ll_b = read_exomol(
        str(tmp_path / "CO.states"), str(tmp_path / "CO.trans"), "CO",
        str(tmp_path / "CO.pf"),
        broadeners=[(_write(tmp_path, "CO__H2.broad", EXOMOL_BROAD_H2), 0.85),
                    (_write(tmp_path, "CO__He.broad", EXOMOL_BROAD_HE), 0.15)],
    )
    want_r0 = (0.85 * 0.0860 + 0.15 * 0.0220) * 1.01325
    want_p1 = (0.85 * 0.0820 + 0.15 * 0.0220) * 1.01325  # J''=1
    assert ll_b.gamma_air[1] == pytest.approx(want_r0, rel=1e-12)
    assert ll_b.gamma_air[0] == pytest.approx(want_p1, rel=1e-12)


def _write(d, name, text):
    p = d / name
    p.write_text(text)
    return str(p)


# ---------------------------------------------------------------------------
# Plez VO ASCII list

PLEZ_VO = """\
'lambda(nm)'  'Elow(eV)'  'loggf'  ...
1050.0000   0.0000  -0.500   9 ...
1052.3000   0.1500  -1.200   7 ...
"""


def test_plez_vo_ascii(tmp_path):
    """Plez VO driver: 'lambda[nm]  E_low[eV]  log gf' columns
    (pylineread dbtype 'vo').  Hand-decoded: wn = 1e7/lambda_nm,
    E'' = E_eV x 8065.544 cm-1/eV, gf = 10^loggf, S296 via the
    pi e^2/(m_e c^2) oscillator-strength conversion."""
    from bart_tpu.linelist.kurucz_mol import gf_to_s296, read_plez_vo
    from bart_tpu.linelist.tips import partition_function

    path = tmp_path / "VO.asc"
    path.write_text(PLEZ_VO)
    ll = read_plez_vo(str(path))
    assert ll.nlines == 2
    # sorted ascending in wn: 1052.3 nm first
    np.testing.assert_allclose(
        ll.wn0, [1.0e7 / 1052.3, 1.0e7 / 1050.0], rtol=1e-12)
    np.testing.assert_allclose(
        ll.elower, [0.15 * 8065.54429, 0.0], rtol=1e-9)

    q296 = float(partition_function("VO")(TREF))
    want = gf_to_s296(np.array([10.0 ** -0.5]),
                      np.array([1.0e7 / 1050.0]), np.array([0.0]), q296)
    assert ll.s296[1] == pytest.approx(float(want[0]), rel=1e-12)
    # magnitude sanity: pi e^2/(m_e c^2) = 8.85282e-13 cm
    assert 1e-18 < ll.s296[1] < 1e-14


# ---------------------------------------------------------------------------
# Fault injection: tolerant parsing + --validate diagnostics (real
# archive files deviate from the published spec in exactly these ways)


def test_par_tolerates_crlf_dexp_truncation():
    """CR/LF endings, Fortran D-exponents, and records truncated after
    column 59 parse cleanly (each is a tolerated spec deviation, not an
    error), with the deviations counted in the report."""
    from bart_tpu.linelist.hitran import ParseReport

    rec = _par_record(5, 1, " 2147.081134", " 2.706D-19", " 3.366E+01",
                      ".0601", ".0664", "    0.0000", "0.69", "-.000026")
    data = (rec[:59] + "\r\n").encode()          # truncated + CRLF
    rep = ParseReport()
    out = parse_par_bytes(data, report=rep)
    co = out["CO"]
    assert co.nlines == 1
    assert co.s296[0] == 2.706e-19                # D-exponent normalized
    assert co.wn0[0] == 2147.081134
    assert rep.n_d_exponent == 1 and rep.n_parsed == 1


def test_par_blank_optional_field_reads_zero():
    from bart_tpu.linelist.hitran import ParseReport

    rec = _par_record(5, 1, " 2147.081134", " 2.706E-19", " 3.366E+01",
                      "     ", ".0664", "    0.0000", "0.69", "-.000026")
    rep = ParseReport()
    out = parse_par_bytes(rec.encode(), report=rep)
    assert out["CO"].gamma_air[0] == 0.0
    assert rep.n_blank_field >= 1


def test_par_corrupt_required_field_raises_with_location():
    import pytest

    good = _par_record(5, 1, " 2147.081134", " 2.706E-19", " 3.366E+01",
                       ".0601", ".0664", "    0.0000", "0.69", "-.000026")
    bad = good[:3] + "  GARBAGE   " + good[15:]   # corrupt the wn field
    data = (good + "\n" + bad + "\n").encode()
    with pytest.raises(ValueError) as ei:
        parse_par_bytes(data)
    msg = str(ei.value)
    assert "line 2" in msg and "wn0" in msg


def test_par_skip_mode_drops_and_reports():
    from bart_tpu.linelist.hitran import ParseReport

    good = _par_record(5, 1, " 2147.081134", " 2.706E-19", " 3.366E+01",
                       ".0601", ".0664", "    0.0000", "0.69", "-.000026")
    bad = good[:3] + "  GARBAGE   " + good[15:]
    short = good[:30]
    data = (good + "\n" + bad + "\n" + short + "\n").encode()
    rep = ParseReport()
    out = parse_par_bytes(data, on_error="skip", report=rep)
    assert out["CO"].nlines == 1                  # only the good record
    assert rep.n_short == 1
    assert rep.n_parsed == 1 and rep.n_records == 2
    assert any(f == "wn0" for _, f, _ in rep.bad_records)
    assert "line 2" in rep.summary()


def test_par_blank_isotope_reads_main():
    rec = _par_record(5, 1, " 2147.081134", " 2.706E-19", " 3.366E+01",
                      ".0601", ".0664", "    0.0000", "0.69", "-.000026")
    rec = rec[:2] + " " + rec[3:]                 # blank the iso column
    out = parse_par_bytes(rec.encode())
    assert out["CO"].iso[0] == 1
