"""Rayleigh scattering extinction.

Equivalent of the reference's ``scattering`` flag/parameter
(reference: code/BARTfunc.py:356-360 set_scattering(mode, param);
code/BART.py:158-163): mode 1 scales an H2 Rayleigh cross-section by
10^param (the fitted retrieval parameter); mode 2 ('polar') applies
the unscaled polarizability cross-section.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["h2_rayleigh_cross_section", "rayleigh_extinction"]


def h2_rayleigh_cross_section(wn_grid: jax.Array) -> jax.Array:
    """H2 Rayleigh cross-section [cm^2/molecule] vs wavenumber [cm-1].

    Dalgarno & Williams (1962): sigma = 8.14e-13/lam^4 + 1.28e-6/lam^6
    + 1.61/lam^8 with lam in Angstrom.
    """
    lam_ang = 1e8 / wn_grid  # cm-1 -> Angstrom
    il2 = 1.0 / (lam_ang * lam_ang)
    il4 = il2 * il2
    return 8.14e-13 * il4 + 1.28e-6 * il4 * il2 + 1.61 * il4 * il4


def rayleigh_extinction(
    wn_grid: jax.Array,
    n_h2: jax.Array,
    log_factor,
    mode: int = 1,
) -> jax.Array:
    """Extinction [cm-1] per (layer, wn).

    mode 1: 10^log_factor x sigma_H2(wn) x n_H2 (fitted enhancement,
    reference set_scattering(1, param)); mode 2: unscaled
    (reference 'polar' set_scattering(2, 0)).
    """
    sig = h2_rayleigh_cross_section(wn_grid)
    factor = jnp.where(mode == 1, 10.0 ** jnp.asarray(log_factor), 1.0)
    return factor * n_h2[:, None] * sig[None, :]
