"""Wavelet-based (red-noise) likelihood — Carter & Winn (2009).

Equivalent of MC3's ``dwt.c`` C extension and ``wlike`` option
(reference: SURVEY.md section 2.3 — "chisq.c/dwt.c C extensions (chi^2
and wavelet-based likelihood)").  The residual vector is transformed
with an orthonormal Daubechies-4 discrete wavelet transform and modeled
as 1/f^gamma red noise (amplitude sigma_r) plus white noise (sigma_w):

    sigma^2_W(m) = sigma_r^2 2^{-gamma m} + sigma_w^2       (octave m)
    sigma^2_S    = sigma_r^2 2^{-gamma} g(gamma) + sigma_w^2 (scaling)

with octaves m = 1 (coarsest, 1 coefficient) .. M (finest, 2^{M-1}
coefficients) for 2^M samples, and g(1) = 1/(2 ln 2) (CW09 eq. 34).
With sigma_r = 0 the DWT orthonormality makes this exactly the white
Gaussian log-likelihood — the identity the unit tests pin.

All static shapes: the pyramid depth is fixed by the (padded) length,
so the whole likelihood jits and vmaps over chains.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["dwt_db4", "wavelet_loglike"]

_SQ3 = np.sqrt(3.0)
# Daubechies-4 analysis filters (orthonormal)
_H = np.array([1.0 + _SQ3, 3.0 + _SQ3, 3.0 - _SQ3, 1.0 - _SQ3]) / (
    4.0 * np.sqrt(2.0)
)
_G = np.array([_H[3], -_H[2], _H[1], -_H[0]])  # g[k] = (-1)^k h[3-k]


def _level(a: jax.Array) -> tuple[jax.Array, jax.Array]:
    """One DB4 pyramid step with periodic boundary:
    a[N] -> (approx[N/2], detail[N/2])."""
    n = a.shape[0]
    idx = (2 * jnp.arange(n // 2)[:, None] + jnp.arange(4)[None, :]) % n
    blocks = a[idx]                                   # [N/2, 4]
    h = jnp.asarray(_H, a.dtype)
    g = jnp.asarray(_G, a.dtype)
    return blocks @ h, blocks @ g


def dwt_db4(x: jax.Array) -> list[jax.Array]:
    """Full DB4 pyramid of a length-2^M vector (M >= 1).

    Returns ``[detail_M (finest, N/2), ..., detail_1 (coarsest, 1),
    scaling (1)]`` — orthonormal, so sum of squares is preserved.
    """
    n = x.shape[0]
    if n & (n - 1):
        raise ValueError(f"dwt_db4 needs a power-of-two length, got {n}")
    out = []
    a = x
    while a.shape[0] > 1:
        a, d = _level(a)
        out.append(d)
    out.append(a)
    return out


def wavelet_loglike(
    resid: jax.Array, gamma, sigma_r, sigma_w, min_sigma: float = 1e-30
) -> jax.Array:
    """Carter & Winn (2009) log-likelihood of a residual vector.

    ``resid`` is zero-padded to the next power of two (as the reference
    dwt.c does).  ``gamma`` is the red-noise spectral index (CW09 derive
    g(gamma) analytically only at gamma = 1; the 2^{-gamma m} octave
    scaling is exact for any gamma and g(1) is used for the scaling
    coefficient, matching the reference's gamma = 1 restriction).
    Traceable in (gamma, sigma_r, sigma_w) — the three trailing MCMC
    parameters of the ``wlike`` mode.
    """
    n = resid.shape[0]
    n2 = 1 << max(int(np.ceil(np.log2(max(n, 2)))), 1)
    if n2 != n:
        resid = jnp.concatenate([resid, jnp.zeros(n2 - n, resid.dtype)])

    coeffs = dwt_db4(resid)
    nlev = len(coeffs) - 1                     # = M
    var_w = sigma_w * sigma_w
    var_r = sigma_r * sigma_r

    logl = jnp.asarray(0.0, resid.dtype)
    # details: coeffs[0] is finest (octave m = M) ... coeffs[nlev-1]
    # coarsest (m = 1)
    for i, d in enumerate(coeffs[:-1]):
        m = nlev - i
        var = var_r * 2.0 ** (-gamma * m) + var_w
        var = jnp.maximum(var, min_sigma)
        logl = logl - 0.5 * jnp.sum(d * d) / var \
                    - 0.5 * d.shape[0] * jnp.log(2.0 * jnp.pi * var)
    # scaling coefficient: g(1) = 1 / (2 ln 2)
    g1 = 1.0 / (2.0 * np.log(2.0))
    var_s = var_r * 2.0 ** (-gamma) * g1 + var_w
    var_s = jnp.maximum(var_s, min_sigma)
    s = coeffs[-1]
    logl = logl - 0.5 * jnp.sum(s * s) / var_s \
                - 0.5 * jnp.log(2.0 * jnp.pi * var_s)
    return logl
