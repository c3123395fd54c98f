"""HITRAN/HITEMP ``.par`` line-list parser.

TPU-era replacement for the reference's pylineread HITRAN driver
(reference: SURVEY.md section 2.2, pylineread dbtype ``hit``; manual
tex:446-503).  Parses the fixed-width 160-character HITRAN 2004+
record format into packed numpy arrays.

Unlike the reference (which converts intensities to gf and stores a
binary TLI), bart_tpu keeps the native HITRAN S(296 K) convention and
scales with partition functions at runtime — fewer conversions, and
direct testability against published HITRAN values.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from bart_tpu.linelist.molecules import HITRAN_IDS

__all__ = ["LineList", "read_par", "parse_par_bytes"]

TREF = 296.0  # HITRAN reference temperature [K]


@dataclasses.dataclass
class LineList:
    """Packed line data for one species, sorted by line center."""

    species: str
    wn0: np.ndarray        # line centers [cm-1]
    s296: np.ndarray       # intensity at 296K [cm-1/(molec cm-2)]
    elower: np.ndarray     # lower-state energy [cm-1]
    gamma_air: np.ndarray  # air-broadened HWHM at 296K, 1 atm [cm-1/atm]
    gamma_self: np.ndarray # self-broadened HWHM [cm-1/atm]
    n_air: np.ndarray      # T exponent of gamma_air
    iso: np.ndarray        # isotopologue index (int8)

    @property
    def nlines(self) -> int:
        return len(self.wn0)

    def trim(self, wn_min: float, wn_max: float) -> "LineList":
        """Keep lines with centers inside [wn_min, wn_max] (pylineread
        iwav/fwav semantics)."""
        lo, hi = np.searchsorted(self.wn0, [wn_min, wn_max])
        return LineList(
            self.species,
            self.wn0[lo:hi], self.s296[lo:hi], self.elower[lo:hi],
            self.gamma_air[lo:hi], self.gamma_self[lo:hi],
            self.n_air[lo:hi], self.iso[lo:hi],
        )

    def strongest(self, n: int) -> "LineList":
        """Keep the n strongest lines (by S296), re-sorted by wn."""
        if n >= self.nlines:
            return self
        idx = np.sort(np.argpartition(self.s296, -n)[-n:])
        return LineList(
            self.species,
            self.wn0[idx], self.s296[idx], self.elower[idx],
            self.gamma_air[idx], self.gamma_self[idx],
            self.n_air[idx], self.iso[idx],
        )

    def cull(self, ethresh: float) -> "LineList":
        """Drop lines with S296 < ethresh * max(S296) (the reference's
        line-strength cutoff ``ethresh``, demo cfg ethresh 1e-6)."""
        keep = self.s296 >= ethresh * self.s296.max()
        return LineList(
            self.species,
            self.wn0[keep], self.s296[keep], self.elower[keep],
            self.gamma_air[keep], self.gamma_self[keep],
            self.n_air[keep], self.iso[keep],
        )

    @staticmethod
    def concatenate(lists: list["LineList"]) -> "LineList":
        """Merge line lists of the same species, re-sorted by wn
        (pylineread multi-database merge)."""
        sp = lists[0].species
        wn0 = np.concatenate([l.wn0 for l in lists])
        order = np.argsort(wn0, kind="stable")
        cat = lambda f: np.concatenate([getattr(l, f) for l in lists])[order]
        return LineList(
            sp, wn0[order], cat("s296"), cat("elower"),
            cat("gamma_air"), cat("gamma_self"), cat("n_air"), cat("iso"),
        )


def parse_par_bytes(data: bytes, species: str | None = None) -> dict[str, LineList]:
    """Parse HITRAN 2004+ fixed-width records from a bytes buffer.

    Returns {species_name: LineList}.  Records of molecules absent from
    the bart_tpu registry are grouped under 'M<id>'.
    """
    # Normalize to fixed-width row matrix:
    lines = data.splitlines()
    rows = [ln for ln in lines if len(ln) >= 68 and not ln.startswith(b"#")]
    if not rows:
        raise ValueError("no HITRAN records found")
    width = max(len(r) for r in rows)
    buf = np.zeros((len(rows), width), dtype=np.uint8)
    buf[:] = ord(" ")
    for i, r in enumerate(rows):
        buf[i, : len(r)] = np.frombuffer(r, np.uint8)

    def field(a, b):
        return buf[:, a:b].tobytes().decode("ascii", "replace")

    def floats(a, b):
        w = b - a
        s = field(a, b)
        return np.array(
            [s[i * w : (i + 1) * w] for i in range(len(rows))], dtype="U%d" % w
        ).astype(np.float64)

    mol_id = floats(0, 2).astype(np.int32)
    iso_ch = buf[:, 2]  # single char: '1'-'9','0','A'..
    iso = np.where(
        (iso_ch >= ord("1")) & (iso_ch <= ord("9")), iso_ch - ord("0"),
        np.where(iso_ch == ord("0"), 10, iso_ch - ord("A") + 11),
    ).astype(np.int8)
    wn0 = floats(3, 15)
    s296 = floats(15, 25)
    gamma_air = floats(35, 40)
    gamma_self = floats(40, 45)
    elower = floats(45, 55)
    n_air = floats(55, 59)

    out: dict[str, LineList] = {}
    for mid in np.unique(mol_id):
        name = HITRAN_IDS.get(int(mid), f"M{int(mid)}")
        if species is not None and name != species:
            continue
        m = mol_id == mid
        order = np.argsort(wn0[m], kind="stable")
        out[name] = LineList(
            name,
            wn0[m][order], s296[m][order], elower[m][order],
            gamma_air[m][order], gamma_self[m][order],
            n_air[m][order], iso[m][order],
        )
    return out


def read_par(path: str, species: str | None = None) -> dict[str, LineList]:
    """Read a HITRAN .par file (native C++ fast path when built,
    numpy fallback otherwise)."""
    try:
        from bart_tpu.native import hitran_native

        return hitran_native.read_par(path, species)
    except Exception:
        with open(path, "rb") as f:
            return parse_par_bytes(f.read(), species)
