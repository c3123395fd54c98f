"""Fused eclipse kernel (rt/fused.py) parity tests.

The Pallas kernel runs in interpreter mode here (CPU); on TPU the same
code path is exercised compiled.  Reference is the composable unfused
pipeline (opacity.grid.interp_opacity + opacity.cia/rayleigh/cloud +
rt.tau.tau_vertical + rt.eclipse.eclipse_flux) that golden-tests
elsewhere pin to the reference formulas (SURVEY.md 2.2/3.2).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import bart_tpu.rt.fused as fused
from bart_tpu.rt.eclipse import raygrid_weights


@pytest.fixture
def problem():
    """Random rows-contraction problem in the fused_eclipse contract."""
    rng = np.random.default_rng(7)
    M, nT, L, W, C = 2, 9, 23, 300, 6
    sigma = jnp.asarray(rng.lognormal(-46, 2, (M, nT, L, W)))
    wn = jnp.asarray(np.linspace(2500, 5000, W))
    mu, muw = raygrid_weights([0.0, 20.0, 40.0, 60.0, 80.0])
    T = jnp.asarray(rng.uniform(500, 2900, (C, L)))
    n_mol = jnp.asarray(rng.lognormal(38, 1, (C, M, L)))
    drp = jnp.asarray(
        np.concatenate(
            [np.zeros((C, 1)), rng.uniform(1e6, 5e6, (C, L - 1))], axis=1
        )
    )
    tab = sigma.reshape(M * nT, L, W)
    w_t = jax.vmap(lambda t: fused.interp_weights(nT, 400.0, 100.0, t))(T)
    nm = jnp.transpose(n_mol, (0, 2, 1))                     # [C, L, M]
    wrows = (nm[:, :, :, None] * w_t[:, :, None, :]).reshape(C, L, M * nT)
    return (tab, wn, jnp.asarray(mu), jnp.asarray(muw), wrows, T, drp,
            sigma, n_mol)


def _unfused_reference(tab, wn, mu, muw, wrows, T, drp, sigma, n_mol):
    from bart_tpu.opacity.grid import interp_opacity
    from bart_tpu.rt.eclipse import eclipse_flux
    from bart_tpu.rt.tau import tau_vertical

    n_t = sigma.shape[1]

    def one(T_c, nm_c, drp_c):
        sig = interp_opacity(sigma, 400.0, 100.0, n_t, T_c)
        ext = jnp.einsum("mlw,ml->lw", sig, nm_c,
                         precision=jax.lax.Precision.HIGHEST)
        # reconstruct a radius grid whose segments are drp
        rad = -jnp.cumsum(drp_c)
        tau = tau_vertical(ext, rad)
        return eclipse_flux(tau, T_c, wn, mu, muw)

    return jax.vmap(one)(T, n_mol, drp)


def test_single_sample_matches_unfused(problem):
    ref = _unfused_reference(*problem)
    one = fused.fused_eclipse(
        *problem[:4], problem[4][0], problem[5][0], problem[6][0]
    )
    np.testing.assert_allclose(np.asarray(one), np.asarray(ref[0]),
                               rtol=1e-10)


def test_vmap_jnp_path_matches_unfused(problem):
    old = fused.FORCE_PALLAS
    fused.FORCE_PALLAS = False
    try:
        got = jax.vmap(
            lambda w, t, d: fused.fused_eclipse(*problem[:4], w, t, d)
        )(*problem[4:7])
    finally:
        fused.FORCE_PALLAS = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(
        _unfused_reference(*problem)), rtol=1e-10)


def test_pallas_interpret_matches_unfused(problem):
    old_force, old_interp = fused.FORCE_PALLAS, fused.INTERPRET
    fused.FORCE_PALLAS, fused.INTERPRET = True, True
    try:
        got = jax.vmap(
            lambda w, t, d: fused.fused_eclipse(*problem[:4], w, t, d)
        )(*problem[4:7])
    finally:
        fused.FORCE_PALLAS, fused.INTERPRET = old_force, old_interp
    ref = _unfused_reference(*problem)
    # kernel computes in f32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5)


def test_forward_model_fused_flag_and_parity():
    """The demo-shaped ForwardModel takes the fused path and matches the
    unfused pipeline end-to-end (spectrum + vmapped batch)."""
    import __graft_entry__ as ge

    fm = ge._build_problem(nlayer=12, nwave=256, nlines=300)
    assert fm._fusable
    params = jnp.asarray([-2.0, 0.0, 1.0, 0.0, 0.98, -0.5], fm.dtype)
    band, spec, valid = fm(params)
    assert bool(valid)

    # unfused reference via the diagnostics path
    from bart_tpu.rt.eclipse import eclipse_flux
    from bart_tpu.rt.tau import tau_vertical

    T, q, rad_cm, ext, valid2 = fm.diagnostics(params)
    tau = tau_vertical(ext, rad_cm)
    spec_ref = eclipse_flux(tau, T, fm.wn, fm.mu, fm.mu_w)
    np.testing.assert_allclose(np.asarray(spec), np.asarray(spec_ref),
                               rtol=1e-10)

    # batched (vmapped) evaluation agrees with per-sample
    batch = jnp.stack([params, params * 1.01])
    band_b, spec_b, valid_b = fm.batched()(batch)
    np.testing.assert_allclose(np.asarray(spec_b[0]), np.asarray(spec),
                               rtol=1e-6)


def test_forward_model_fused_full_continuum():
    """CIA + fitted Rayleigh + cloud deck all fold into the fused rows
    contraction and match the unfused ops exactly (the WASP-12b-class
    configuration; reference csfile/scattering/cloudtop flags)."""
    import __graft_entry__ as ge
    from bart_tpu.opacity.cia import CiaTable
    from bart_tpu.rt.eclipse import eclipse_flux
    from bart_tpu.rt.forward import ForwardConfig, ForwardModel
    from bart_tpu.rt.tau import tau_vertical

    base = ge._build_problem(nlayer=12, nwave=256, nlines=300)
    wn = np.asarray(base.wn, np.float64)
    cia = CiaTable(
        ("H2", "H2"),
        temps=np.array([300.0, 900.0, 1700.0, 2600.0, 3500.0]),
        wn=np.linspace(wn[0] - 100, wn[-1] + 100, 40),
        absorption=np.abs(
            np.random.default_rng(3).normal(1e-7, 3e-8, (5, 40))
        ),
    )
    cfg = ForwardConfig(
        solution="eclipse", pt_type="line", molfit=("CH4",),
        cloudtop=True, scattering="ray",
    )
    fm = ForwardModel(
        cfg,
        wn_grid=wn,
        pressure=np.asarray(base.pressure, np.float64),
        species=base.species,
        base_abundances=np.asarray(base.tables["base_q"], np.float64),
        opacity=base.opacity,
        system=base.system,
        bands=base.bands,
        cia_tables=[cia],
        dtype=base.dtype,
    )
    assert fm._fusable and "frows" in fm.tables
    # params: 5 PT + cloudtop + rayleigh + CH4
    params = jnp.asarray(
        [-2.0, 0.0, 1.0, 0.0, 0.98, 0.05, 0.3, -0.5], fm.dtype
    )
    band, spec, valid = fm(params)
    assert bool(valid)

    T, q, rad_cm, ext, _ = fm.diagnostics(params)
    tau = tau_vertical(ext, rad_cm)
    spec_ref = eclipse_flux(tau, T, fm.wn, fm.mu, fm.mu_w)
    np.testing.assert_allclose(np.asarray(spec), np.asarray(spec_ref),
                               rtol=1e-8)


# ---------------------------------------------------------------------
# fused_transit (slant geometry)


@pytest.fixture
def tproblem(problem):
    """Transit-geometry problem reusing the eclipse fixture's extinction
    rows, plus descending radii per chain."""
    tab, wn, mu, muw, wrows, T, drp = problem[:7]
    C, L = T.shape
    rng = np.random.default_rng(11)
    # descending radii ~ 1 R_jup with 30-80 km layer spacings
    dr = rng.uniform(3e6, 8e6, (C, L))
    rad = 7.1e9 - np.cumsum(dr, axis=1)
    return tab, wrows, jnp.asarray(rad), wn


def _unfused_transit_reference(tab, wrows, rad, wn):
    from bart_tpu.rt.transit_geom import transit_depth

    def one(w_c, r_c):
        ext = jnp.einsum("lr,rlw->lw", w_c, tab,
                         precision=jax.lax.Precision.HIGHEST)
        return transit_depth(ext, r_c, 6.96e10)

    return jax.vmap(one)(wrows, rad)


def _fused_transit_batch(tab, wrows, rad, wn):
    from bart_tpu.rt.transit_geom import slant_geometry

    def one(w_c, r_c):
        G, wgt = slant_geometry(r_c)
        out = fused.fused_transit(tab, w_c, G, wgt)
        return (r_c[-1] ** 2 + out) / 6.96e10**2

    return jax.vmap(one)(wrows, rad)


def test_transit_single_sample_matches_unfused(tproblem):
    from bart_tpu.rt.transit_geom import slant_geometry

    tab, wrows, rad, wn = tproblem
    ref = _unfused_transit_reference(tab, wrows, rad, wn)
    G, wgt = slant_geometry(rad[0])
    out = fused.fused_transit(tab, wrows[0], G, wgt)
    one = (rad[0, -1] ** 2 + out) / 6.96e10**2
    np.testing.assert_allclose(np.asarray(one), np.asarray(ref[0]),
                               rtol=1e-9)


def test_transit_vmap_jnp_path_matches_unfused(tproblem):
    old = fused.FORCE_PALLAS
    fused.FORCE_PALLAS = False
    try:
        got = _fused_transit_batch(*tproblem)
    finally:
        fused.FORCE_PALLAS = old
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_unfused_transit_reference(*tproblem)),
        rtol=1e-9,
    )


def test_transit_pallas_interpret_matches_unfused(tproblem):
    old_force, old_interp = fused.FORCE_PALLAS, fused.INTERPRET
    fused.FORCE_PALLAS, fused.INTERPRET = True, True
    try:
        got = _fused_transit_batch(*tproblem)
    finally:
        fused.FORCE_PALLAS, fused.INTERPRET = old_force, old_interp
    ref = _unfused_transit_reference(*tproblem)
    # kernel computes in f32; depths are O(1e-2) absolute
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4)


def test_forward_model_fused_transit_parity():
    """A transit-geometry ForwardModel takes the fused path and matches
    the unfused slant pipeline end-to-end."""
    import __graft_entry__ as ge
    from bart_tpu.rt.forward import ForwardConfig, ForwardModel
    from bart_tpu.rt.transit_geom import transit_depth

    base = ge._build_problem(nlayer=12, nwave=256, nlines=300)
    cfg = ForwardConfig(solution="transit", pt_type="line",
                        molfit=("CH4",))
    fm = ForwardModel(
        cfg,
        wn_grid=np.asarray(base.wn, np.float64),
        pressure=np.asarray(base.pressure, np.float64),
        species=base.species,
        base_abundances=np.asarray(base.tables["base_q"], np.float64),
        opacity=base.opacity,
        system=base.system,
        bands=base.bands,
        dtype=base.dtype,
    )
    assert fm._fusable
    # params: 5 PT + radius + CH4
    r0 = fm.r0_km
    params = jnp.asarray([-2.0, 0.0, 1.0, 0.0, 0.98, r0, -0.5], fm.dtype)
    band, spec, valid = fm(params)
    assert bool(valid)

    T, q, rad_cm, ext, _ = fm.diagnostics(params)
    spec_ref = transit_depth(ext, rad_cm, fm.system.r_star * 100.0)
    # both paths are f32 with different (mathematically identical)
    # operation orders — rounding-level agreement, not bitwise
    np.testing.assert_allclose(np.asarray(spec), np.asarray(spec_ref),
                               rtol=1e-5)

    # batched (jitted + vmapped) evaluation agrees with per-sample —
    # this is the regression guard for the fma/cancellation bug in the
    # old r^2 - b^2 slant chords (jit vs eager diverged by 1.7e-2;
    # the anchored-delta form in rt.tau.slant_chords keeps it ~1e-7)
    batch = jnp.stack([params, params])
    band_b, spec_b, valid_b = fm.batched()(batch)
    np.testing.assert_allclose(np.asarray(spec_b[0]), np.asarray(spec),
                               rtol=1e-6)
