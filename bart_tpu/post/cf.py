"""Contribution functions and transmittance.

Equivalent of the reference's cf.py (reference: code/cf.py:97-332):
Knutson et al. (2008) eq. 2 contribution functions for eclipse
geometry, band-averaged per filter, and band-averaged slant-path
transmittance exp(-tau) for transit geometry.  The reference re-runs
the transit binary with toomuch=1e100 to dump tau.dat; bart_tpu just
evaluates tau from the forward model's own extinction — no subprocess,
no file roundtrip.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from bart_tpu.rt.planck import planck_wn
from bart_tpu.rt.tau import tau_slant, tau_vertical

__all__ = ["contribution_functions", "transmittance", "band_average"]


def contribution_functions(
    extinction: np.ndarray,
    radius_cm: np.ndarray,
    temperature: np.ndarray,
    pressure_bar: np.ndarray,
    wn: np.ndarray,
) -> np.ndarray:
    """cf[layer, wn] = B(T, wn) * d(e^-tau)/d(ln p)
    (Knutson et al. 2008 eq. 2; reference code/cf.py:114-134).
    Layer convention: top-first; returned on layer midpoints padded to
    nlayer (last row zero)."""
    tau = np.asarray(tau_vertical(jnp.asarray(extinction), jnp.asarray(radius_cm)))
    B = np.asarray(planck_wn(jnp.asarray(wn)[None, :], jnp.asarray(temperature)[:, None]))
    expt = np.exp(-tau)
    lnp = np.log(pressure_bar)
    dexp = expt[:-1] - expt[1:]                    # e^-tau decreasing down
    dlnp = (lnp[:-1] - lnp[1:])[:, None]           # negative
    cf = np.zeros_like(B)
    cf[:-1] = 0.5 * (B[:-1] + B[1:]) * dexp / dlnp
    return np.abs(cf)


def transmittance(
    extinction: np.ndarray, radius_cm: np.ndarray
) -> np.ndarray:
    """Slant-path transmittance exp(-tau)[impact layer, wn] for transit
    geometry (reference code/cf.py:187-237)."""
    tau = np.asarray(tau_slant(jnp.asarray(extinction), jnp.asarray(radius_cm)))
    return np.exp(-np.minimum(tau, 700.0))


def band_average(
    quantity_lw: np.ndarray,
    spec_wn: np.ndarray,
    filters: list[tuple[np.ndarray, np.ndarray]],
) -> np.ndarray:
    """Band-averaged per-layer quantity
    (reference filter_cf, code/cf.py:137-184); out[nlayer, nfilt]."""
    from bart_tpu.obs.bands import build_band_matrix

    bm = build_band_matrix(spec_wn, filters)
    W = np.asarray(bm.weights)
    return quantity_lw @ W.T  # [nlayer, nfilt]
