"""Transit (transmission) spectrum synthesis.

Equivalent of the reference's slantpath.c modulation calculation
(reference: SURVEY.md section 2.2, solution 'transit'): the in-transit
flux deficit

    depth(wn) = [ pi R_deep^2 + 2 pi int_{R_deep}^{R_top}
                  (1 - e^{-tau(b,wn)}) b db ] / (pi R_star^2)

with the planet interior below the deepest modeled layer fully opaque.
The band-integrated depth is what BARTfunc compares to the data for
solution='transit' (reference code/BARTfunc.py:391-393).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bart_tpu.rt.tau import TAU_CLAMP, slant_chords, tau_slant

__all__ = ["transit_depth", "slant_geometry"]


def slant_geometry(radius_cm: jax.Array):
    """Factor the slant-path + annulus integration into two static-shape
    operators of the (descending) layer radii alone:

        tau[b, wn]   = G @ ext            (== rt.tau.tau_slant)
        depth[wn]    = (r_deep^2 + wgt @ (1 - exp(-min(tau, CLAMP))))
                       / r_star^2         (== transit_depth)

    G[i, j] redistributes tau_slant's midpoint-trapezoid over segment
    lengths dx onto per-layer extinction weights (dx[i,j] + dx[i,j-1]);
    wgt[i] = 2 b_i c_i folds the impact-parameter trapezoid weights c_i
    into one row vector.  This is what lets the whole transit geometry
    run inside the fused Pallas kernel (rt.fused.fused_transit) as two
    MXU contractions per chain."""
    x = slant_chords(radius_cm)
    dx = x[:, :-1] - x[:, 1:]                                  # [L, L-1]
    zc = jnp.zeros_like(dx[:, :1])
    G = jnp.concatenate([dx, zc], 1) + jnp.concatenate([zc, dx], 1)
    b = radius_cm
    delta = radius_cm - radius_cm[-1]
    db = delta[:-1] - delta[1:]                                # [L-1] > 0
    z1 = jnp.zeros_like(db[:1])
    c = 0.5 * (jnp.concatenate([db, z1]) + jnp.concatenate([z1, db]))
    return G, 2.0 * c * b


def transit_depth(
    extinction: jax.Array, radius_cm: jax.Array, r_star_cm
) -> jax.Array:
    """Transit depth spectrum depth[wn] from extinction[layer, wn] and
    descending layer radii [cm]."""
    tau = jnp.minimum(tau_slant(extinction, radius_cm), TAU_CLAMP)  # [b, wn]
    absorb = 1.0 - jnp.exp(-tau)
    b = radius_cm                                                   # [L]
    # 2 int (1 - e^-tau) b db, trapezoid over impact parameters
    # (anchored-delta differences: exactly rounded in f32)
    delta = radius_cm - radius_cm[-1]
    db = delta[:-1] - delta[1:]                                     # [L-1] > 0
    integrand = absorb * b[:, None]
    ann = jnp.sum(0.5 * (integrand[:-1] + integrand[1:]) * db[:, None], axis=0)
    area = radius_cm[-1] ** 2 + 2.0 * ann                           # /pi
    return area / r_star_cm**2
