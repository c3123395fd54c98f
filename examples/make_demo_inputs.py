#!/usr/bin/env python
"""Generate the self-contained demo inputs.

The reference demo requires downloading HITRAN CH4 data and building a
TLI with pylineread (reference README Quick Example).  Since line data
cannot ship with either repo, this script synthesizes a statistically
CH4-like line list, saves it as a bart_tpu TLI artifact, and generates
synthetic eclipse-depth "observations" from a known truth so the demo
retrieval has a verifiable answer.

Usage:  python examples/make_demo_inputs.py [outdir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(outdir="examples/demo_inputs"):
    os.makedirs(outdir, exist_ok=True)
    from bart_tpu.linelist.tli import TliData, save_tli, synthetic_linelist

    ll = synthetic_linelist(
        "CH4", 2450.0, 5050.0, 30000, seed=20,
        band_centers=(2700.0, 3020.0, 3450.0, 4300.0),
    )
    tli = TliData(["CH4"], {"CH4": ll}, 2450.0, 5050.0)
    tli_path = os.path.join(outdir, "CH4_demo.tli.npz")
    save_tli(tli, tli_path)
    print(f"wrote {tli_path} ({ll.nlines} lines)")

    # synthetic CIA table (H2-H2), smooth in (T, wn):
    from bart_tpu.opacity.cia import CiaTable, write_cia

    temps = np.arange(400.0, 3001.0, 200.0)
    wn = np.linspace(2000.0, 6000.0, 200)
    # Borysow-like magnitude ~1e-7..1e-6 cm-1 amagat-2 with broad bumps
    absorption = (
        1e-7
        * (temps[:, None] / 1000.0) ** 1.5
        * (1.0 + 0.5 * np.exp(-((wn[None, :] - 2400.0) / 500.0) ** 2)
           + 0.3 * np.exp(-((wn[None, :] - 4500.0) / 600.0) ** 2))
    )
    cia_path = os.path.join(outdir, "CIA_H2H2_demo.dat")
    write_cia(CiaTable(("H2", "H2"), temps, wn, absorption), cia_path)
    print(f"wrote {cia_path}")

    # WASP-12b-class 4-molecule line database (910-3400 cm-1, the
    # reference's WASP-12b example range):
    species_bands = {
        "H2O": (1300.0, 1600.0, 1900.0, 3150.0),
        "CO2": (950.0, 1350.0, 2350.0),
        "CO":  (2143.0,),
        "CH4": (1300.0, 3020.0),
    }
    lines = {}
    for k, (name, centers) in enumerate(species_bands.items()):
        lines[name] = synthetic_linelist(
            name, 900.0, 3400.0, 20000, seed=30 + k, band_centers=centers,
        )
    tli4 = TliData(list(lines), lines, 900.0, 3400.0)
    p4 = os.path.join(outdir, "wasp12b_4mol.tli.npz")
    save_tli(tli4, p4)
    print(f"wrote {p4} ({tli4.total_lines()} lines)")


if __name__ == "__main__":
    main(*(sys.argv[1:] or []))
