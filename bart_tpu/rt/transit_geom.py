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

from bart_tpu.rt.tau import TAU_CLAMP, tau_slant

__all__ = ["transit_depth"]


def transit_depth(
    extinction: jax.Array, radius_cm: jax.Array, r_star_cm
) -> jax.Array:
    """Transit depth spectrum depth[wn] from extinction[layer, wn] and
    descending layer radii [cm]."""
    tau = jnp.minimum(tau_slant(extinction, radius_cm), TAU_CLAMP)  # [b, wn]
    absorb = 1.0 - jnp.exp(-tau)
    b = radius_cm                                                   # [L]
    # 2 int (1 - e^-tau) b db, trapezoid over impact parameters
    db = b[:-1] - b[1:]                                             # [L-1] > 0
    integrand = absorb * b[:, None]
    ann = jnp.sum(0.5 * (integrand[:-1] + integrand[1:]) * db[:, None], axis=0)
    area = radius_cm[-1] ** 2 + 2.0 * ann                           # /pi
    return area / r_star_cm**2
