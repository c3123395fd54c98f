"""Broadening-width estimator tool.

Equivalent of the reference's scripts/broadening.py get_widths
(reference: scripts/broadening.py:10-88): print the min/max Doppler and
Lorentz HWHM implied by a retrieval config — used to choose nwidth and
shard/tile sizes.

    python -m bart_tpu.tools.widths -c <config>
"""

from __future__ import annotations

import argparse

import numpy as np

from bart_tpu import constants as const
from bart_tpu.driver.config import load_config
from bart_tpu.linelist.molecules import get_molecule
from bart_tpu.physics.voigt import doppler_hwhm, lorentz_hwhm_collision


def get_widths(cfg) -> dict:
    wn = cfg.wavenumber_grid()
    wn_min, wn_max = float(wn[0]), float(wn[-1])
    t_min, t_max = cfg.tlow, cfg.thigh
    p_min = cfg.p_top * const.BAR_TO_BARYE
    p_max = cfg.p_bottom * const.BAR_TO_BARYE

    species = [s.partition("_")[0] for s in cfg.out_spec.split()]
    mols = [get_molecule(s) for s in species if s not in ("H", "C", "N", "O", "e-")]
    masses = np.array([m.mass for m in mols]) * const.AMU
    diams = np.array([m.diameter for m in mols]) * 1e-8

    h2 = get_molecule("H2")
    he = get_molecule("He")
    qp = np.array([0.85, 0.15])
    mp = np.array([h2.mass, he.mass]) * const.AMU
    dp = np.array([h2.diameter, he.diameter]) * 1e-8

    d_min = float(doppler_hwhm(wn_min, t_min, masses.max()))
    d_max = float(doppler_hwhm(wn_max, t_max, masses.min()))
    l_min = min(
        float(lorentz_hwhm_collision(p_min, t_max, m, d, qp, mp, dp))
        for m, d in zip(masses, diams)
    )
    l_max = max(
        float(lorentz_hwhm_collision(p_max, t_min, m, d, qp, mp, dp))
        for m, d in zip(masses, diams)
    )
    return {"doppler_min": d_min, "doppler_max": d_max,
            "lorentz_min": l_min, "lorentz_max": l_max}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="bart_tpu.tools.widths")
    ap.add_argument("-c", "--config_file", required=True)
    args = ap.parse_args(argv)
    w = get_widths(load_config(args.config_file))
    print("Doppler minimum and maximum HWHM (cm-1): "
          f"{w['doppler_min']:.3e}, {w['doppler_max']:.3e}")
    print("Lorentz minimum and maximum HWHM (cm-1): "
          f"{w['lorentz_min']:.3e}, {w['lorentz_max']:.3e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
