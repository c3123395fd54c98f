"""Opacity-engine tests: Voigt parity, line strengths, tiling, table interp, CIA."""

import numpy as np
import pytest
import scipy.special as ssp

import jax
import jax.numpy as jnp

from bart_tpu import constants as const
from bart_tpu.linelist.hitran import TREF, LineList, parse_par_bytes
from bart_tpu.linelist.molecules import get_molecule
from bart_tpu.linelist.tips import partition_function
from bart_tpu.linelist.tli import TliData, load_tli, save_tli, synthetic_linelist
from bart_tpu.opacity import cia as cia_mod
from bart_tpu.opacity.extinction import (
    BroadeningSpec,
    cross_section_grid,
    tile_lines,
    wing_cutoff,
)
from bart_tpu.opacity.grid import build_opacity_grid, interp_opacity, load_grid, save_grid
from bart_tpu.physics.voigt import faddeeva_real, voigt_profile


def test_faddeeva_vs_scipy():
    rng = np.random.default_rng(1)
    x = rng.uniform(-300, 300, 4096)
    y = 10.0 ** rng.uniform(-6, 3, 4096)
    got = np.asarray(faddeeva_real(jnp.asarray(x), jnp.asarray(y)))
    want = ssp.wofz(x + 1j * y).real
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-300)


def test_voigt_profile_vs_scipy():
    rng = np.random.default_rng(2)
    dx = rng.uniform(-5, 5, 1000)
    got = np.asarray(voigt_profile(jnp.asarray(dx), 0.3, 0.12))
    want = ssp.voigt_profile(dx, 0.3, 0.12)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_voigt_normalization():
    # integral of the profile over a wide range ~ 1
    dx = np.linspace(-400, 400, 200001)
    v = np.asarray(voigt_profile(jnp.asarray(dx), 0.05, 0.3))
    integral = np.trapezoid(v, dx)
    assert integral == pytest.approx(1.0, rel=1e-3)


def brute_force_sigma(ll, wn_grid, T, p_barye, spec, q_fn):
    """Dense scipy reference for the tiled cross-section kernel."""
    mol = get_molecule(ll.species)
    mass = mol.mass * const.AMU
    c2 = const.C2
    qr = float(q_fn(TREF) / q_fn(T))
    s = (
        ll.s296
        * qr
        * np.exp(-c2 * ll.elower * (1.0 / T - 1.0 / TREF))
        * (1 - np.exp(-c2 * ll.wn0 / T))
        / (1 - np.exp(-c2 * ll.wn0 / TREF))
    )
    gd = ll.wn0 / const.C_LIGHT * np.sqrt(2 * np.log(2) * const.K_BOLTZ * T / mass)
    sig_g = gd / np.sqrt(2 * np.log(2))
    h2, he = get_molecule("H2"), get_molecule("He")
    d = mol.diameter * 1e-8
    coll = spec.q_h2 * ((d + h2.diameter * 1e-8) / 2) ** 2 * np.sqrt(
        1 / mass + 1 / (h2.mass * const.AMU)
    ) + spec.q_he * ((d + he.diameter * 1e-8) / 2) ** 2 * np.sqrt(
        1 / mass + 1 / (he.mass * const.AMU)
    )
    gl = (
        np.sqrt(2.0)
        / const.C_LIGHT
        / np.sqrt(T * np.pi * const.K_BOLTZ)
        * p_barye
        * coll
    )
    out = np.zeros(len(wn_grid))
    for i in range(len(ll.wn0)):
        out += s[i] * ssp.voigt_profile(wn_grid - ll.wn0[i], sig_g[i], gl)
    return out


def test_cross_section_matches_brute_force():
    ll = synthetic_linelist("CH4", 2500.0, 2600.0, 60, seed=3)
    wn = 2500.0 + np.arange(101)  # coarse grid
    spec = BroadeningSpec(q_h2=0.85, q_he=0.15)
    q_fn = partition_function("CH4")
    T, p = 1200.0, 0.5e6  # K, barye

    tiles = tile_lines(ll, wn, cutoff=200.0, tile_size=32, pad_lines_to=16)
    got = np.asarray(
        cross_section_grid(tiles, jnp.array([T]), jnp.array([p]), spec)
    )[0]
    want = brute_force_sigma(ll, wn, T, p, spec, q_fn)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_tile_cutoff_excludes_far_lines():
    # one line at 3000; grid far away gets zero with small cutoff
    ll = synthetic_linelist("CO", 2999.0, 3001.0, 1, seed=4)
    wn = np.arange(3100.0, 3200.0)
    tiles = tile_lines(ll, wn, cutoff=10.0, tile_size=32)
    sig = np.asarray(
        cross_section_grid(tiles, jnp.array([1000.0]), jnp.array([1e5]),
                           BroadeningSpec())
    )
    assert np.all(sig == 0.0)


def test_empty_linelist_gives_zero():
    # regression: padded slots with wn0=0 must not produce NaN
    empty = synthetic_linelist("CO", 1000.0, 1100.0, 0, seed=0)
    wn = np.arange(1000.0, 1100.0)
    tiles = tile_lines(empty, wn, cutoff=25.0, tile_size=32)
    sig = np.asarray(
        cross_section_grid(tiles, jnp.array([1000.0]), jnp.array([1e5]),
                           BroadeningSpec())
    )
    assert np.all(sig == 0.0)


def test_nwidth_truncation():
    ll = synthetic_linelist("CO", 2999.5, 3000.5, 1, seed=5)
    wn = np.arange(2990.0, 3010.0, 0.1)
    tiles = tile_lines(ll, wn, cutoff=25.0, tile_size=64)
    full = np.asarray(
        cross_section_grid(tiles, jnp.array([800.0]), jnp.array([1e4]),
                           BroadeningSpec())
    )[0]
    trunc = np.asarray(
        cross_section_grid(tiles, jnp.array([800.0]), jnp.array([1e4]),
                           BroadeningSpec(), nwidth=5.0)
    )[0]
    # truncated wings are zero away from center, equal near center
    far = np.abs(wn - float(ll.wn0[0])) > 2.0
    assert np.all(trunc[far] == 0.0)
    near = np.abs(wn - float(ll.wn0[0])) < 0.05
    np.testing.assert_allclose(trunc[near], full[near], rtol=1e-6)


def test_hitran_parser():
    # two synthetic HITRAN 2004 records (160 chars): CH4 (mol 6) and CO (mol 5)
    rec1 = (
        " 61" + " 3028.752190" + " 1.216E-19" + " 7.845E+00"
        + ".0633" + ".0791" + " 1293.1413" + "0.73" + "-.007280" + " " * 93
    )
    rec2 = (
        " 51" + " 2147.081130" + " 4.418E-19" + " 2.221E+01"
        + ".0605" + ".0640" + "   11.5349" + "0.69" + "-.002280" + " " * 93
    )
    out = parse_par_bytes((rec1 + "\n" + rec2 + "\n").encode())
    assert set(out) == {"CH4", "CO"}
    ch4 = out["CH4"]
    assert ch4.nlines == 1
    assert ch4.wn0[0] == pytest.approx(3028.75219)
    assert ch4.s296[0] == pytest.approx(1.216e-19)
    assert ch4.gamma_air[0] == pytest.approx(0.0633)
    assert ch4.gamma_self[0] == pytest.approx(0.0791)
    assert ch4.elower[0] == pytest.approx(1293.1413)
    assert ch4.n_air[0] == pytest.approx(0.73)
    assert ch4.iso[0] == 1
    assert out["CO"].wn0[0] == pytest.approx(2147.08113)


def test_linelist_ops():
    ll = synthetic_linelist("CH4", 2000.0, 3000.0, 500, seed=6)
    t = ll.trim(2200.0, 2400.0)
    assert np.all((t.wn0 >= 2200) & (t.wn0 <= 2400))
    s = ll.strongest(50)
    assert s.nlines == 50
    assert s.s296.min() >= np.partition(ll.s296, -50)[-50]
    c = ll.cull(1e-3)
    assert np.all(c.s296 >= 1e-3 * ll.s296.max())
    m = LineList.concatenate([ll.trim(2000, 2500), ll.trim(2500, 3000)])
    assert m.nlines == ll.trim(2000, 2500).nlines + ll.trim(2500, 3000).nlines
    assert np.all(np.diff(m.wn0) >= 0)


def test_tli_roundtrip(tmp_path):
    ll = synthetic_linelist("H2O", 1000.0, 2000.0, 100, seed=7)
    data = TliData(
        ["H2O"], {"H2O": ll}, 1000.0, 2000.0,
        partition={"H2O": (np.arange(100.0, 4000.0, 100.0),
                           np.arange(100.0, 4000.0, 100.0) ** 1.5)},
    )
    path = str(tmp_path / "test.tli.npz")
    save_tli(data, path)
    back = load_tli(path)
    assert back.species == ["H2O"]
    np.testing.assert_allclose(back.lines["H2O"].wn0, ll.wn0)
    np.testing.assert_allclose(back.lines["H2O"].s296, ll.s296)
    assert "H2O" in back.partition


def test_opacity_grid_build_and_interp(tmp_path):
    ll = synthetic_linelist("CH4", 2500.0, 2550.0, 40, seed=8)
    wn = 2500.0 + np.arange(0.0, 50.0, 0.5)
    t_grid = np.arange(400.0, 1601.0, 200.0)
    p = np.logspace(-5, 2, 10)
    grid = build_opacity_grid(
        {"CH4": ll}, wn, t_grid, p, tile_size=32, cond_batch=16, dtype=jnp.float64
    )
    assert grid.sigma.shape == (1, len(t_grid), len(p), len(wn))

    # interp at grid temperatures reproduces grid slices exactly:
    T_layers = jnp.full(len(p), t_grid[3])
    out = interp_opacity(grid.sigma, grid.t_min, grid.t_step, len(t_grid), T_layers)
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(grid.sigma[0, 3]), rtol=1e-12
    )

    # midpoint interp = average of neighbors:
    T_mid = jnp.full(len(p), (t_grid[2] + t_grid[3]) / 2)
    out2 = interp_opacity(grid.sigma, grid.t_min, grid.t_step, len(t_grid), T_mid)
    np.testing.assert_allclose(
        np.asarray(out2[0]),
        np.asarray((grid.sigma[0, 2] + grid.sigma[0, 3]) / 2),
        rtol=1e-12,
    )

    # interp physical accuracy: compare against direct computation at T
    T_direct = 1100.0
    spec = BroadeningSpec()
    mol = get_molecule("CH4")
    cutoff = wing_cutoff(
        20.0, float(wn[-1]), float(t_grid[0]), float(p[-1]) * 1e6,
        mol.mass * const.AMU, mol.diameter * 1e-8, spec,
    )
    tiles = tile_lines(ll, wn, cutoff, tile_size=32)
    direct = np.asarray(
        cross_section_grid(
            tiles, jnp.full(len(p), T_direct), jnp.asarray(p * 1e6), spec,
            nwidth=20.0,
        )
    )
    interp = np.asarray(
        interp_opacity(grid.sigma, grid.t_min, grid.t_step, len(t_grid),
                       jnp.full(len(p), T_direct))
    )[0]
    # T-interpolation on a 200-K grid: median error small; worst line
    # cores can reach tens of percent (inherent to the opacity-grid
    # approach, same as the reference's tabulated extinction)
    mask = direct > direct.max() * 1e-3
    rel = np.abs(interp[mask] - direct[mask]) / direct[mask]
    assert np.median(rel) < 0.05
    assert rel.max() < 0.6

    # save/load roundtrip
    path = str(tmp_path / "opacity.npz")
    save_grid(grid, path)
    back = load_grid(path)
    np.testing.assert_allclose(np.asarray(back.sigma), np.asarray(grid.sigma))


def test_cia_roundtrip_and_interp(tmp_path):
    temps = np.array([400.0, 1000.0, 2000.0])
    wn = np.linspace(2000.0, 5000.0, 31)
    absorption = np.outer(temps / 1000.0, (wn / 3000.0) ** 2)
    table = cia_mod.CiaTable(("H2", "H2"), temps, wn, absorption)
    path = str(tmp_path / "cia.dat")
    cia_mod.write_cia(table, path)
    back = cia_mod.read_cia(path)
    assert back.species == ("H2", "H2")
    np.testing.assert_allclose(back.absorption, absorption, rtol=1e-5)

    # bilinear interp: at a table temperature and wn point, exact
    ext = cia_mod.cia_extinction(
        jnp.asarray(temps), jnp.asarray(wn), jnp.asarray(absorption),
        jnp.asarray(wn[5:7]), jnp.asarray([1000.0]),
        jnp.asarray([2.0]), jnp.asarray([3.0]),
    )
    np.testing.assert_allclose(
        np.asarray(ext)[0], absorption[1, 5:7] * 6.0, rtol=1e-12
    )
    # T midpoint
    ext2 = cia_mod.cia_extinction(
        jnp.asarray(temps), jnp.asarray(wn), jnp.asarray(absorption),
        jnp.asarray(wn[5:6]), jnp.asarray([700.0]),
        jnp.asarray([1.0]), jnp.asarray([1.0]),
    )
    want = 0.5 * (absorption[0, 5] + absorption[1, 5])
    np.testing.assert_allclose(float(ext2[0, 0]), want, rtol=1e-12)


def test_partition_function_sanity():
    q = partition_function("CO")
    # CO TIPS Q(296) ~ 107.1; rigid-rotor approx within ~2%
    assert float(q(296.0)) == pytest.approx(107.1, rel=0.05)
    # ratio behavior: Q grows with T
    assert float(q(2000.0)) > float(q(296.0))
    # H2O nonlinear: Q(296) ~ 174 (per spin-isomer weighting conventions
    # constants cancel in ratios; approx gives the rot-vib part)
    qh2o = partition_function("H2O")
    assert 30 < float(qh2o(296.0)) < 300


def test_native_parser_parity(tmp_path):
    """Native C++ scanner produces identical arrays to the numpy parser."""
    import shutil

    if shutil.which("g++") is None:
        pytest.skip("no g++")
    rng = np.random.default_rng(7)
    recs = []
    for _ in range(500):
        wn = 2000 + 3000 * rng.random()
        s = 10 ** (-25 + 6 * rng.random())
        el = 3000 * rng.random()
        recs.append(
            " 61" + f"{wn:12.6f}" + f" {s:9.3E}" + " 7.845E+00"
            + f"{0.05:.4f}"[1:] + f"{0.08:.4f}"[1:] + f"{el:10.4f}"
            + "0.73" + "-.007280" + " " * 93
        )
    path = tmp_path / "t.par"
    path.write_text("\n".join(recs) + "\n")

    from bart_tpu.native import hitran_native

    a = hitran_native.read_par(str(path))["CH4"]
    b = parse_par_bytes(path.read_bytes())["CH4"]
    for f in ("wn0", "s296", "elower", "gamma_air", "gamma_self", "n_air"):
        np.testing.assert_allclose(getattr(a, f), getattr(b, f), rtol=1e-12)
    np.testing.assert_array_equal(a.iso, b.iso)


def test_bin_averaged_mode_conserves_line_mass():
    """osamp>1 bin-averages the cross-section over each output bin:
    summing sigma*wndelt over the grid must recover the full line
    strength S(T) even when the Doppler core (~1e-2 cm-1) is far
    narrower than the 1.0 cm-1 grid — the wnosamp question
    (docs/LINE_SAMPLING.md; reference examples/demo/BART_eclipse.cfg
    wnosamp 2160).  Point sampling (osamp=1) integrates to the wrong
    mass unless a gridpoint happens to hit the core."""
    from bart_tpu.opacity.extinction import _line_strength

    # one narrow line exactly mid-bin; low pressure -> Lorentz tiny
    ll = LineList(
        species="CH4",
        wn0=np.array([3000.0]), s296=np.array([1e-20]),
        elower=np.array([500.0]), gamma_air=np.array([0.05]),
        gamma_self=np.array([0.07]), n_air=np.array([0.5]),
        iso=np.array([1], np.int8),
    )
    wn = np.arange(2980.0, 3021.0, 1.0)
    spec = BroadeningSpec()
    T, p = jnp.array([1300.0]), jnp.array([1e3])  # K, barye (~1 mbar)
    tiles = tile_lines(ll, wn, cutoff=25.0, tile_size=8, pad_lines_to=4)

    q_fn = partition_function("CH4")
    # the line is duplicated into every tile whose wings it reaches
    # (wing bucketing); the physical S(T) is one slot's strength
    s_t = float(np.asarray(_line_strength(tiles, T, q_fn)).max())

    for osamp, rtol in ((16, 1e-3), (64, 1e-3)):
        sig_avg = np.asarray(cross_section_grid(
            tiles, T, p, spec, osamp=osamp, wndelt=1.0))[0]
        # bin-averaged: full strength recovered
        np.testing.assert_allclose(sig_avg.sum() * 1.0, s_t, rtol=rtol)
        # the center bin alone holds essentially the whole line
        np.testing.assert_allclose(sig_avg[20], s_t, rtol=5e-3)

    # point sampling at the line center overshoots the bin average by
    # ~ wndelt/(sqrt(pi)*gd) ~ 40x -- the aliasing bin-averaging fixes
    sig_point = np.asarray(cross_section_grid(tiles, T, p, spec))[0]
    assert sig_point.sum() > 10.0 * s_t


def test_bin_averaged_matches_point_for_broad_lines():
    """When lines are well resolved (Lorentz width >> bin), the bin
    average equals the point value up to the real second-order
    curvature term ~ (wndelt^2/24) V''/V ~ 1/(12 gl^2) — bin averaging
    only *matters* for unresolved cores."""
    ll = synthetic_linelist("CH4", 2500.0, 2600.0, 40, seed=5)
    wn = 2500.0 + np.arange(101)
    spec = BroadeningSpec()
    T, p = jnp.array([1200.0]), jnp.array([5e7])  # 50 bar: gl ~ several cm-1
    tiles = tile_lines(ll, wn, cutoff=200.0, tile_size=32, pad_lines_to=16)
    a = np.asarray(cross_section_grid(tiles, T, p, spec))[0]
    b = np.asarray(cross_section_grid(tiles, T, p, spec, osamp=16,
                                      wndelt=1.0))[0]
    np.testing.assert_allclose(a, b, rtol=2e-2)
    # and the quadrature itself is converged: 16 vs 64 points agree
    c = np.asarray(cross_section_grid(tiles, T, p, spec, osamp=64,
                                      wndelt=1.0))[0]
    np.testing.assert_allclose(b, c, rtol=1e-6)


def test_broadening_from_abundances():
    """Collision bath built from the baseline atmosphere's own H2/He
    columns (reference reads them from the atm file,
    code/BARTfunc.py:189-201), with defaults when colliders are absent."""
    sp = ["H2", "He", "CH4"]
    q = np.tile([0.80, 0.19, 0.01], (5, 1))
    b = BroadeningSpec.from_abundances(sp, q)
    assert b.q_h2 == pytest.approx(0.80) and b.q_he == pytest.approx(0.19)
    # no H2/He columns -> reference defaults
    b2 = BroadeningSpec.from_abundances(["H2O", "CO"], np.ones((3, 2)))
    assert b2.q_h2 == 0.85 and b2.q_he == 0.15
    # the bath ratio feeds through to the Lorentz width (more He ->
    # narrower, since He is a smaller/lighter collider)
    from bart_tpu.linelist.hitran import LineList

    ll = synthetic_linelist("CH4", 2500.0, 2510.0, 3, seed=7)
    wn = 2500.0 + np.arange(11)
    tiles = tile_lines(ll, wn, cutoff=50.0, tile_size=16, pad_lines_to=8)
    T, p = jnp.array([1000.0]), jnp.array([1e6])
    hi_h2 = BroadeningSpec(q_h2=1.0, q_he=0.0)
    hi_he = BroadeningSpec(q_h2=0.0, q_he=1.0)
    g1 = np.asarray(hi_h2.gamma_lorentz(tiles, 16 * 1.66e-24, 3.8e-8,
                                        T, p))
    g2 = np.asarray(hi_he.gamma_lorentz(tiles, 16 * 1.66e-24, 3.8e-8,
                                        T, p))
    assert np.all(g1 > g2)


def test_bucketed_tiling_matches_uniform():
    """Variable-depth tile buckets (geometric depth classes) produce
    bitwise the same cross-sections as the uniform max-depth tiling,
    while bounding padding at 2x under density skew."""
    from bart_tpu.opacity.extinction import (
        cross_section_tiles, tile_lines_bucketed,
    )

    # heavy skew: 500 lines clustered at one band head + 20 background
    rng = np.random.default_rng(11)
    nu = np.sort(np.concatenate([
        rng.normal(2550.0, 3.0, 500).clip(2500, 2700),
        rng.uniform(2500.0, 2700.0, 20),
    ]))
    m = len(nu)
    ll = LineList("CH4", nu, 1e-20 * 10 ** rng.uniform(-3, 0, m),
                  rng.uniform(0, 2000, m), rng.uniform(0.03, 0.08, m),
                  rng.uniform(0.05, 0.12, m), rng.uniform(0.4, 0.8, m),
                  np.ones(m, np.int8))
    wn = 2500.0 + np.arange(201)
    spec = BroadeningSpec()
    T = jnp.array([800.0, 1600.0])
    p = jnp.array([1e5, 1e6])

    uni = tile_lines(ll, wn, cutoff=25.0, tile_size=32, pad_lines_to=16)
    buckets = tile_lines_bucketed(ll, wn, cutoff=25.0, tile_size=32,
                                  pad_lines_to=16)
    assert len(buckets) > 1   # the skew actually produced depth classes
    padded_uni = uni.wn0.shape[0] * uni.wn0.shape[1]
    padded_b = sum(t.wn0.shape[0] * t.wn0.shape[1] for _, t in buckets)
    assert padded_b < 0.6 * padded_uni   # padding actually bounded

    want = np.asarray(cross_section_grid(uni, T, p, spec, nwidth=20.0))
    got = np.zeros((2, uni.wn0.shape[0], 32))
    for tile_idx, tiles in buckets:
        sig = np.asarray(cross_section_tiles(tiles, T, p, spec,
                                             nwidth=20.0))
        for j, ti in enumerate(tile_idx):
            got[:, ti] = sig[:, j]
    np.testing.assert_array_equal(got.reshape(2, -1)[:, :201], want)

    # all tiles covered exactly once
    all_idx = np.sort(np.concatenate([i for i, _ in buckets]))
    np.testing.assert_array_equal(all_idx, np.arange(len(uni.wn0)))


def test_tile_lines_ethresh_culls_at_tiling():
    """ethresh at tiling time drops weak lines from the buckets
    entirely (they cost neither memory nor Voigt evaluations)."""
    ll = synthetic_linelist("CH4", 2500.0, 2600.0, 200, seed=3)
    wn = 2500.0 + np.arange(101)
    t_all = tile_lines(ll, wn, cutoff=25.0, tile_size=32, pad_lines_to=8)
    t_cut = tile_lines(ll, wn, cutoff=25.0, tile_size=32, pad_lines_to=8,
                       ethresh=1e-2)
    kept = ll.cull(1e-2).nlines
    assert kept < ll.nlines
    assert float(np.asarray(t_cut.weight).sum()) <= float(
        np.asarray(t_all.weight).sum())
    # the culled tiling equals tiling the culled list
    t_ref = tile_lines(ll.cull(1e-2), wn, cutoff=25.0, tile_size=32,
                       pad_lines_to=8)
    np.testing.assert_array_equal(np.asarray(t_cut.wn0),
                                  np.asarray(t_ref.wn0))


def test_depth_chunked_build_matches_unchunked():
    """A dispatch budget so small that every bucket splits along the
    line-depth axis must reproduce the unchunked table exactly
    (cross-sections are additive over lines) — the 3M-line band-head
    buckets need this path: their depth makes even one condition's
    Voigt temporaries exceed HBM."""
    import numpy as np
    from bart_tpu.linelist.tli import synthetic_linelist
    from bart_tpu.opacity.grid import build_opacity_grid

    ll = synthetic_linelist("CH4", 2500.0, 2600.0, 600, seed=3,
                            band_centers=(2520.0, 2580.0))
    wn = np.linspace(2500.0, 2600.0, 128)
    t_grid = np.array([800.0, 1600.0])
    pressure = np.logspace(-3, 2, 6)
    ref = build_opacity_grid({"CH4": ll}, wn, t_grid, pressure,
                             tile_size=64, cond_batch=4)
    # ~tiny budget: forces L_cap down to a few slots per dispatch
    split = build_opacity_grid({"CH4": ll}, wn, t_grid, pressure,
                               tile_size=64, cond_batch=4,
                               dispatch_budget_bytes=64 * 6 * 64 * 4 * 50)
    np.testing.assert_allclose(np.asarray(split.sigma),
                               np.asarray(ref.sigma), rtol=2e-6,
                               atol=1e-38)
