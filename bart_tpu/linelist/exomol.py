"""ExoMol line-list driver (.states / .trans / .pf).

Modern successor to the reference's pylineread database drivers
(reference: SURVEY.md sections 2.2/3.5).  ExoMol is today's standard
source for hot-exoplanet line lists; the reference predates it.

Formats (exomol.com definitions):
  .states : id  E[cm-1]  g_tot  J  [...]
  .trans  : id_upper  id_lower  A[s-1]  [wavenumber]
  .pf     : T[K]  Q(T)

Intensities are converted to the HITRAN S(296 K) convention used by
the opacity engine:

  S296 = g' A / (8 pi c nu^2) * exp(-c2 E''/296) *
         (1 - exp(-c2 nu/296)) / Q(296)
"""

from __future__ import annotations

import gzip

import numpy as np

from bart_tpu import constants as const
from bart_tpu.linelist.hitran import TREF, LineList
from bart_tpu.linelist.tips import partition_function

__all__ = ["read_states", "read_trans", "read_pf", "read_exomol"]


def _open(path: str):
    if path.endswith(".gz") or path.endswith(".bz2"):
        if path.endswith(".bz2"):
            import bz2

            return bz2.open(path, "rt")
        return gzip.open(path, "rt")
    return open(path)


def read_states(path: str):
    """-> (energy[cm-1], g_total) indexed by state id (1-based ids map
    to row id-1)."""
    energies, gs = [], []
    with _open(path) as f:
        for line in f:
            s = line.split()
            if len(s) < 3 or s[0].startswith("#"):
                continue
            energies.append(float(s[1]))
            gs.append(float(s[2]))
    return np.asarray(energies), np.asarray(gs)


def read_trans(path: str):
    """-> (id_upper, id_lower, A) int/float arrays."""
    up, lo, A = [], [], []
    with _open(path) as f:
        for line in f:
            s = line.split()
            if len(s) < 3 or s[0].startswith("#"):
                continue
            up.append(int(s[0]))
            lo.append(int(s[1]))
            A.append(float(s[2]))
    return np.asarray(up, np.int64), np.asarray(lo, np.int64), np.asarray(A)


def read_pf(path: str):
    """-> (T, Q) arrays from a .pf file."""
    t, q = [], []
    with _open(path) as f:
        for line in f:
            s = line.split()
            if len(s) < 2 or s[0].startswith("#"):
                continue
            t.append(float(s[0]))
            q.append(float(s[1]))
    return np.asarray(t), np.asarray(q)


def read_exomol(
    states_path: str,
    trans_paths: list[str] | str,
    species: str,
    pf_path: str | None = None,
    wn_min: float = 0.0,
    wn_max: float = np.inf,
) -> LineList:
    """Assemble a LineList from ExoMol files, trimmed to [wn_min, wn_max]."""
    if isinstance(trans_paths, str):
        trans_paths = [trans_paths]
    energy, g = read_states(states_path)

    if pf_path:
        t_tab, q_tab = read_pf(pf_path)
        q296 = float(np.interp(TREF, t_tab, q_tab))
    else:
        q296 = float(partition_function(species)(TREF))

    wn_all, s_all, el_all = [], [], []
    for tp in trans_paths:
        up, lo, A = read_trans(tp)
        e_up = energy[up - 1]
        e_lo = energy[lo - 1]
        g_up = g[up - 1]
        nu = e_up - e_lo
        keep = (nu > max(wn_min, 1e-6)) & (nu < wn_max)
        nu, e_lo, g_up, A = nu[keep], e_lo[keep], g_up[keep], A[keep]
        c2 = const.C2
        s296 = (
            g_up * A / (8.0 * np.pi * const.C_LIGHT * nu**2)
            * np.exp(-c2 * e_lo / TREF)
            * (1.0 - np.exp(-c2 * nu / TREF))
            / q296
        )
        wn_all.append(nu)
        s_all.append(s296)
        el_all.append(e_lo)

    wn = np.concatenate(wn_all)
    order = np.argsort(wn, kind="stable")
    n = len(wn)
    return LineList(
        species=species,
        wn0=wn[order],
        s296=np.concatenate(s_all)[order],
        elower=np.concatenate(el_all)[order],
        gamma_air=np.full(n, 0.05),
        gamma_self=np.full(n, 0.07),
        n_air=np.full(n, 0.5),
        iso=np.ones(n, np.int8),
    )
