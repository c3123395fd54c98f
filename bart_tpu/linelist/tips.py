"""Total internal partition sums Q(T).

The reference ships TIPS-derived partition-function tables with its
pylineread drivers (reference: SURVEY.md section 2.2, pylineread
``part_list``).  bart_tpu provides two paths:

1. ``tabulated``: user-supplied (T, Q) tables (same capability as the
   reference's explicit part_list files), interpolated linearly.
2. ``approximate``: rigid-rotor x harmonic-oscillator analytic Q(T)
   from the built-in molecular constants (linelist/molecules.py).
   Because line-strength scaling only uses the *ratio* Q(Tref)/Q(T),
   constant factors (nuclear-spin degeneracy, electronic) cancel and
   the approximation is accurate to a few percent over 100-4000 K for
   the closed-shell molecules in the registry.

Both return callables usable inside jit (pure jnp).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax.numpy as jnp

from bart_tpu import constants as const
from bart_tpu.linelist.molecules import Molecule, get_molecule

__all__ = ["partition_function", "q_approx", "q_tabulated"]

# hc/k in cm K
_C2 = const.C2


def q_approx(mol: Molecule) -> Callable:
    """Analytic rigid-rotor x harmonic-oscillator partition function.

    Linear:    Q_rot = kT/(hc B sigma) * (1 + hcB/3kT + ...)
    Nonlinear: Q_rot = sqrt(pi)/sigma * sqrt((kT/hc)^3/(A B C))
    Q_vib = prod_i (1 - exp(-hc w_i/kT))^(-g_i)
    Atoms: Q = 1 (constant; cancels in ratios).
    """
    if mol.linear is None:
        return lambda T: jnp.ones_like(jnp.asarray(T, jnp.float32) * 1.0)

    vib = tuple(mol.vib)
    if mol.linear:
        B = mol.rot_const[0]
        sig = mol.sigma_rot

        def q(T):
            t = jnp.asarray(T)
            x = t / (_C2 * B)
            qrot = (x + 1.0 / 3.0 + _C2 * B / (15.0 * t)) / sig
            qvib = jnp.ones_like(t)
            for wn_i, g_i in vib:
                qvib = qvib * (1.0 - jnp.exp(-_C2 * wn_i / t)) ** (-g_i)
            return qrot * qvib

        return q
    else:
        A, B, C = mol.rot_const
        sig = mol.sigma_rot

        def q(T):
            t = jnp.asarray(T)
            qrot = (
                np.sqrt(np.pi) / sig * jnp.sqrt((t / _C2) ** 3 / (A * B * C))
            )
            qvib = jnp.ones_like(t)
            for wn_i, g_i in vib:
                qvib = qvib * (1.0 - jnp.exp(-_C2 * wn_i / t)) ** (-g_i)
            return qrot * qvib

        return q


def q_tabulated(temps: np.ndarray, values: np.ndarray) -> Callable:
    """Linear interpolation of a tabulated partition function
    (the reference's part-list capability)."""
    t_tab = jnp.asarray(np.asarray(temps, np.float64))
    q_tab = jnp.asarray(np.asarray(values, np.float64))

    def q(T):
        return jnp.interp(jnp.asarray(T), t_tab, q_tab)

    return q


def partition_function(
    species: str, table: tuple[np.ndarray, np.ndarray] | None = None
) -> Callable:
    """Q(T) callable for a species: tabulated if a table is given,
    else the built-in analytic approximation."""
    if table is not None:
        return q_tabulated(*table)
    return q_approx(get_molecule(species))
