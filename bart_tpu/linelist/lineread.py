"""TLI builder CLI — the pylineread equivalent.

Reads the reference's pylineread config format unchanged (reference:
examples/demo/pyline_demo.cfg — [Parameters] section with db_list /
part_list / dbtype / output / iwav / fwav) plus the modern 'exomol'
dbtype, and writes a bart_tpu TLI artifact:

    python -m bart_tpu.linelist.lineread -c pyline_demo.cfg

dbtypes: hit (HITRAN/HITEMP .par), ps (Partridge-Schwenke H2O binary),
ts (Schwenke TiO binary), vo (Plez VO ASCII), exomol
(states_file:trans_file[:pf_file] triplet in db_list).
"""

from __future__ import annotations

import argparse
import configparser
import sys

import numpy as np

from bart_tpu.linelist.hitran import LineList, read_par
from bart_tpu.linelist.tli import TliData, save_tli

__all__ = ["build_tli", "main"]


def _read_part(path: str | None):
    if path in (None, "implicit"):
        return None
    from bart_tpu.linelist.kurucz_mol import read_kurucz_partition

    # handles plain 2-column (T, Q) tables and the Kurucz multi-isotope
    # ASCII tables (h2opartfn.dat / tiopart.dat) with text headers
    return read_kurucz_partition(path)


def build_tli(
    db_list: list[str],
    dbtypes: list[str],
    part_list: list[str] | None,
    output: str,
    iwav_um: float,
    fwav_um: float,
    species_hint: list[str] | None = None,
) -> TliData:
    """Parse every database, merge per species, sort by wavenumber,
    trim to [iwav, fwav] microns, and save (pylineread semantics,
    SURVEY.md 3.5)."""
    wn_min = 1e4 / fwav_um
    wn_max = 1e4 / iwav_um
    if part_list is None:
        part_list = ["implicit"] * len(db_list)
    if len(dbtypes) == 1 and len(db_list) > 1:
        dbtypes = dbtypes * len(db_list)

    per_species: dict[str, list[LineList]] = {}
    partition: dict[str, tuple] = {}
    for k, (db, typ) in enumerate(zip(db_list, dbtypes)):
        pf = _read_part(part_list[k] if k < len(part_list) else None)
        hint = (species_hint or [None] * len(db_list))[k]
        if typ == "hit":
            lists = read_par(db)
            for name, ll in lists.items():
                per_species.setdefault(name, []).append(
                    ll.trim(wn_min, wn_max)
                )
                if pf is not None:
                    partition[name] = pf
        elif typ in ("ps", "ts"):
            from bart_tpu.linelist.kurucz_mol import (
                read_ps_binary, read_tio_binary,
            )

            if typ == "ps":
                name = hint or "H2O"
                ll = read_ps_binary(db, name, wn_min, wn_max, pf)
            else:
                name = hint or "TiO"
                ll = read_tio_binary(db, name, wn_min, wn_max, pf)
            per_species.setdefault(name, []).append(ll)
            if pf is not None:
                partition[name] = pf
        elif typ == "vo":
            from bart_tpu.linelist.kurucz_mol import read_plez_vo

            name = hint or "VO"
            ll = read_plez_vo(db, name, wn_min, wn_max, pf)
            per_species.setdefault(name, []).append(ll)
            if pf is not None:
                partition[name] = pf
        elif typ == "exomol":
            from bart_tpu.linelist.exomol import read_exomol

            parts = db.split(":")
            states, trans = parts[0], parts[1]
            pfp = parts[2] if len(parts) > 2 else None
            name = hint or "H2O"
            ll = read_exomol(states, trans, name, pfp, wn_min, wn_max)
            per_species.setdefault(name, []).append(ll)
        else:
            raise ValueError(f"unknown dbtype {typ!r}")

    lines = {
        name: LineList.concatenate(parts) for name, parts in per_species.items()
    }
    data = TliData(list(lines), lines, wn_min, wn_max, partition)
    if output:
        save_tli(data, output)
    return data


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="bart_tpu.lineread",
        description="Build a TLI line database (pylineread equivalent)",
    )
    ap.add_argument("-c", "--config_file", required=True)
    args = ap.parse_args(argv)

    cp = configparser.ConfigParser()
    cp.optionxform = str
    cp.read([args.config_file])
    P = dict(cp.items("Parameters"))

    db_list = P["db_list"].split()
    dbtypes = P["dbtype"].split()
    part = P.get("part_list", "implicit").split()
    part = [None if p == "implicit" else p for p in part]
    out = P["output"]
    if not out.endswith(".npz"):
        out = out + ".npz"
    data = build_tli(
        db_list, dbtypes, part, out,
        float(P["iwav"]), float(P["fwav"]),
        species_hint=P.get("species", "").split() or None,
    )
    print(f"TLI written: {out} — {data.total_lines()} lines, "
          f"species {data.species}, {data.wn_min:.1f}-{data.wn_max:.1f} cm-1")
    return 0


if __name__ == "__main__":
    sys.exit(main())
