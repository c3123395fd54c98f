"""Planck function in wavenumber units (cgs).

B_wn(T) = 2 h c^2 wn^3 / (exp(h c wn / k T) - 1)
[erg s-1 cm-2 sr-1 / cm-1]  (reference: code/cf.py:97-111).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bart_tpu import constants as const

__all__ = ["planck_wn"]


def planck_wn(wn: jax.Array, T: jax.Array) -> jax.Array:
    """Planck spectral radiance; broadcasts wn against T."""
    x = const.C2 * wn / T
    return 2.0 * const.H_PLANCK * const.C_LIGHT**2 * wn**3 / jnp.expm1(x)
