"""Collision-induced absorption (CIA).

Equivalent of the reference's cia.c: bilinear interpolation of
tabulated CIA opacity in (T, wavenumber), scaled by the number
densities of the two colliding species (reference: SURVEY.md section
2.2; csfile flag in code/makecfg.py:44).

File format: the Borysow/transit-style grid table

    # comment lines
    i <species1> <species2>
    t   T1 T2 ... Tn
    wn1 a11 a12 ... a1n
    wn2 a21 a22 ... a2n
    ...

with absorption in cm-1 amagat-2.  A reader for HITRAN-format CIA
blocks is also provided.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["CiaTable", "read_cia", "read_cia_hitran", "cia_extinction", "write_cia"]

# Loschmidt number: molecules cm-3 at 1 amagat
LOSCHMIDT = 2.6867811e19


@dataclasses.dataclass
class CiaTable:
    species: tuple[str, str]
    temps: np.ndarray      # [nT], ascending
    wn: np.ndarray         # [nwn], ascending
    absorption: np.ndarray # [nT, nwn] in cm-1 amagat-2


def read_cia(path: str) -> CiaTable:
    """Read a transit/Borysow-style CIA grid table."""
    species = ("H2", "H2")
    temps = None
    rows = []
    with open(path) as f:
        for line in f:
            s = line.strip()
            if not s or s.startswith("#"):
                continue
            if s.startswith("i "):
                parts = s.split()
                species = (parts[1], parts[2])
            elif s.startswith("t "):
                temps = np.asarray([float(x) for x in s.split()[1:]])
            else:
                rows.append([float(x) for x in s.split()])
    if temps is None or not rows:
        raise ValueError(f"{path}: not a CIA grid table")
    data = np.asarray(rows)
    return CiaTable(species, temps, data[:, 0], data[:, 1:].T.copy())


def write_cia(table: CiaTable, path: str) -> None:
    with open(path, "w") as f:
        f.write("# CIA table written by bart_tpu (cm-1 amagat-2)\n")
        f.write(f"i {table.species[0]} {table.species[1]}\n")
        f.write("t " + " ".join(f"{t:.1f}" for t in table.temps) + "\n")
        for i, wn in enumerate(table.wn):
            f.write(
                f"{wn:.2f} "
                + " ".join(f"{a:.6e}" for a in table.absorption[:, i])
                + "\n"
            )


def read_cia_hitran(path: str) -> CiaTable:
    """Read a HITRAN-format CIA file (repeated per-temperature blocks:
    header line with species pair, range, npts, T; then wn/alpha rows in
    cm^5 molecule-2 — converted to cm-1 amagat-2)."""
    blocks = []
    with open(path) as f:
        lines = f.readlines()
    i = 0
    species = ("H2", "H2")
    while i < len(lines):
        s = lines[i].strip()
        if not s:
            i += 1
            continue
        head = s.split()
        pair = head[0]
        if "-" in pair:
            species = tuple(pair.split("-")[:2])
        npts = int(head[3])
        temp = float(head[4])
        rows = np.array(
            [[float(x) for x in lines[i + 1 + k].split()[:2]] for k in range(npts)]
        )
        blocks.append((temp, rows[:, 0], rows[:, 1]))
        i += 1 + npts
    temps = np.array([b[0] for b in blocks])
    order = np.argsort(temps)
    wn = blocks[0][1]
    absorption = np.stack([blocks[k][2] for k in order]) * LOSCHMIDT**2
    return CiaTable(species, temps[order], wn, absorption)


def cia_extinction(
    table_temps: jax.Array,
    table_wn: jax.Array,
    table_abs: jax.Array,
    wn_grid: jax.Array,
    T_layers: jax.Array,
    n1_amagat: jax.Array,
    n2_amagat: jax.Array,
) -> jax.Array:
    """Extinction [cm-1] per (layer, wn): bilinear interp of the table
    at (T_layer, wn_grid), times n1*n2 in amagat^2 (cia.c equivalent).

    Out-of-range T clamps to the table edge; out-of-range wn
    contributes zero.
    """
    # Interp along wn for every table temperature (once per call):
    def interp_wn(row):
        return jnp.interp(wn_grid, table_wn, row, left=0.0, right=0.0)

    tab = jax.vmap(interp_wn)(table_abs)  # [nT, nwn_grid]

    nT = table_temps.shape[0]
    it = jnp.clip(jnp.searchsorted(table_temps, T_layers) - 1, 0, nT - 2)
    t0 = table_temps[it]
    t1 = table_temps[it + 1]
    f = jnp.clip((T_layers - t0) / (t1 - t0), 0.0, 1.0)
    alpha = tab[it] * (1.0 - f)[:, None] + tab[it + 1] * f[:, None]
    return alpha * (n1_amagat * n2_amagat)[:, None]
