"""ctypes bindings for the native HITRAN scanner.

Builds libhitran_scan.so on first use (g++; falls back to the numpy
parser in linelist/hitran.py when no compiler is available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "hitran_scan.cpp")
_SO = os.path.join(_DIR, "libhitran_scan.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_SO) or (
        os.path.getmtime(_SO) < os.path.getmtime(_SRC)
    ):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True,
        )
    lib = ctypes.CDLL(_SO)
    lib.hitran_count.argtypes = [ctypes.c_char_p]
    lib.hitran_count.restype = ctypes.c_long
    lib.hitran_parse.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.int8),
    ] + [np.ctypeslib.ndpointer(np.float64)] * 6
    lib.hitran_parse.restype = ctypes.c_long
    _lib = lib
    return lib


def read_par(path: str, species: str | None = None):
    """Native-parse a .par file -> {species: LineList} (same contract
    as linelist.hitran.read_par)."""
    from bart_tpu.linelist.hitran import LineList
    from bart_tpu.linelist.molecules import HITRAN_IDS

    lib = _load()
    n = lib.hitran_count(path.encode())
    if n < 0:
        raise FileNotFoundError(path)
    mol_id = np.empty(n, np.int32)
    iso = np.empty(n, np.int8)
    wn = np.empty(n, np.float64)
    s296 = np.empty(n, np.float64)
    gair = np.empty(n, np.float64)
    gself = np.empty(n, np.float64)
    elow = np.empty(n, np.float64)
    nair = np.empty(n, np.float64)
    got = lib.hitran_parse(path.encode(), mol_id, iso, wn, s296, gair,
                           gself, elow, nair)
    if got != n:
        raise IOError(f"{path}: parsed {got} of {n} records")
    # the scanner marks unparseable fields NaN: escalate to the
    # tolerant numpy parser (linelist.hitran), which produces
    # per-record diagnostics instead of ingesting garbage
    bad = (~np.isfinite(wn) | ~np.isfinite(s296) | ~np.isfinite(elow)
           | ~np.isfinite(gair) | ~np.isfinite(gself)
           | ~np.isfinite(nair))
    if bad.any():
        raise ValueError(
            f"{path}: {int(bad.sum())} records with unparseable numeric "
            f"fields (first at record {int(np.where(bad)[0][0]) + 1})")

    out = {}
    for mid in np.unique(mol_id):
        name = HITRAN_IDS.get(int(mid), f"M{int(mid)}")
        if species is not None and name != species:
            continue
        m = mol_id == mid
        order = np.argsort(wn[m], kind="stable")
        out[name] = LineList(
            name, wn[m][order], s296[m][order], elow[m][order],
            gair[m][order], gself[m][order], nair[m][order], iso[m][order],
        )
    return out
