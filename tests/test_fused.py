"""Fused eclipse kernel (rt/fused.py) parity tests.

The Pallas kernel runs in interpreter mode here (CPU); on TPU the same
code path is exercised compiled.  Reference is the composable unfused
pipeline (opacity.grid.interp_opacity + rt.tau.tau_vertical +
rt.eclipse.eclipse_flux) that golden-tests elsewhere pin to the
reference formulas (SURVEY.md 2.2/3.2).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import bart_tpu.rt.fused as fused
from bart_tpu.rt.eclipse import raygrid_weights


@pytest.fixture
def problem():
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
    return (sigma, wn, jnp.asarray(mu), jnp.asarray(muw), 400.0, 100.0,
            T, n_mol, drp)


def _unfused_reference(sigma, wn, mu, muw, t_min, t_step, T, n_mol, drp):
    from bart_tpu.opacity.grid import interp_opacity
    from bart_tpu.rt.eclipse import eclipse_flux
    from bart_tpu.rt.tau import tau_vertical

    n_t = sigma.shape[1]

    def one(T_c, nm_c, drp_c):
        sig = interp_opacity(sigma, t_min, t_step, n_t, T_c)
        ext = jnp.einsum("mlw,ml->lw", sig, nm_c,
                         precision=jax.lax.Precision.HIGHEST)
        # reconstruct a radius grid whose segments are drp
        rad = -jnp.cumsum(drp_c)
        tau = tau_vertical(ext, rad)
        return eclipse_flux(tau, T_c, wn, mu, muw)

    return jax.vmap(one)(T, n_mol, drp)


def test_single_sample_matches_unfused(problem):
    ref = _unfused_reference(*problem)
    one = fused.eclipse_spectrum_gridded(
        *problem[:6], problem[6][0], problem[7][0], problem[8][0]
    )
    np.testing.assert_allclose(np.asarray(one), np.asarray(ref[0]),
                               rtol=1e-10)


def test_vmap_jnp_path_matches_unfused(problem):
    old = fused.FORCE_PALLAS
    fused.FORCE_PALLAS = False
    try:
        got = jax.vmap(
            lambda t, n, d: fused.eclipse_spectrum_gridded(
                *problem[:6], t, n, d)
        )(*problem[6:])
    finally:
        fused.FORCE_PALLAS = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(
        _unfused_reference(*problem)), rtol=1e-10)


def test_pallas_interpret_matches_unfused(problem):
    old_force, old_interp = fused.FORCE_PALLAS, fused.INTERPRET
    fused.FORCE_PALLAS, fused.INTERPRET = True, True
    try:
        got = jax.vmap(
            lambda t, n, d: fused.eclipse_spectrum_gridded(
                *problem[:6], t, n, d)
        )(*problem[6:])
    finally:
        fused.FORCE_PALLAS, fused.INTERPRET = old_force, old_interp
    ref = _unfused_reference(*problem)
    # kernel computes in f32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5)


def test_forward_model_fused_flag_and_parity():
    """The demo-shaped ForwardModel takes the fused path and matches the
    unfused pipeline end-to-end (band fluxes)."""
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
