"""Hydrostatic-equilibrium radius integration (jit/vmap-safe).

Computes per-layer radii anchored at R(p0)=R0 with layer-varying
gravity g(r) = g0 R0^2/r^2, matching the reference's sequential
integration (reference: code/makeatm.py:183-263 radpress).

The anchor layer index is static (the pressure grid and reference
pressure are fixed per retrieval), so the two directional scans have
static lengths and the function jits/vmaps cleanly over (T, mu) batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["radius_profile", "anchor_index"]

# Gas constant N_A * k_B [J mol-1 K-1]; the 0.5*(T/mu) * R / g terms then
# come out directly in km (reference uses sc.Avogadro*sc.k the same way,
# code/makeatm.py:236-256).
_R_GAS = 6.02214076e23 * 1.380649e-23


def anchor_index(pressure: np.ndarray, p0: float) -> int:
    """Static index of the layer nearest the reference pressure."""
    return int(np.argmin(np.abs(np.asarray(pressure) - p0)))


def radius_profile(
    pressure: jax.Array,
    temperature: jax.Array,
    mu: jax.Array,
    p0: float,
    R0,
    g0,
    i0: int | None = None,
) -> jax.Array:
    """Per-layer radius [km], top-first arrays (ascending pressure).

    Parameters: pressure [bar] (static values, traced ok), temperature
    [K], mu mean molar mass [g/mol], p0 reference pressure [bar]
    (static float), R0 radius at p0 [km], g0 gravity at p0 [m s-2],
    i0 static anchor layer index (computed from pressure/p0 if None —
    requires pressure to be a concrete array).
    """
    if i0 is None:
        i0 = anchor_index(np.asarray(pressure), p0)
    n = pressure.shape[0]
    logp = jnp.log10(pressure)
    t_over_mu = temperature / mu

    # Interpolated T/mu at p0 in log-pressure space
    # (reference code/makeatm.py:212-218)
    tm0 = jnp.interp(jnp.log10(jnp.asarray(p0, pressure.dtype)), logp, t_over_mu)

    # Anchor layer (reference code/makeatm.py:229-246): identical formula
    # for both off-grid cases.
    rad_i0 = R0 + 0.5 * (t_over_mu[i0] + tm0) * _R_GAS * jnp.log(p0 / pressure[i0]) / g0
    g_i0 = g0 * R0**2 / rad_i0**2

    lnp = jnp.log(pressure)

    def down_step(carry, j):
        rad_prev, g_prev = carry
        a = 0.5 * (t_over_mu[j] + t_over_mu[j - 1]) * _R_GAS
        rad = rad_prev - a * (lnp[j] - lnp[j - 1]) / g_prev
        g = g_prev * rad_prev**2 / rad**2
        return (rad, g), rad

    def up_step(carry, j):
        rad_prev, g_prev = carry
        a = 0.5 * (t_over_mu[j] + t_over_mu[j + 1]) * _R_GAS
        rad = rad_prev + a * (lnp[j + 1] - lnp[j]) / g_prev
        g = g_prev * rad_prev**2 / rad**2
        return (rad, g), rad

    rad = jnp.zeros(n, dtype=temperature.dtype).at[i0].set(rad_i0)
    if i0 + 1 < n:
        _, down = jax.lax.scan(
            down_step, (rad_i0, g_i0), jnp.arange(i0 + 1, n)
        )
        rad = rad.at[i0 + 1 :].set(down)
    if i0 > 0:
        _, up = jax.lax.scan(up_step, (rad_i0, g_i0), jnp.arange(i0 - 1, -1, -1))
        rad = rad.at[:i0].set(up[::-1])
    return rad
