#!/usr/bin/env python
"""Stage the accuracy-mode (rtosamp=32) WASP-12b problem and print the
model-at-truth band depths, for pinning into wasp12b_eclipse_fold.cfg
(same staging path as run_wasp12b.py --fold; the K=32 fine opacity
table is built once here and cached in the output directory for the
regression run)."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

from bart_tpu.driver.config import load_config
from bart_tpu.driver.pipeline import Pipeline

CFG = os.path.join(REPO, "examples", "wasp12b_eclipse_fold.cfg")


def main():
    outdir = os.path.join(REPO, "examples", "wasp12b_out_fold")
    cfg = load_config(CFG, {"loc_dir": outdir})
    p = Pipeline(cfg)
    pressure = p.stage_pressure()
    elems = p.stage_abundances()
    atm = p.stage_atmosphere(pressure, elems)
    wn = cfg.wavenumber_grid()
    from bart_tpu.utils.grids import folded_fine_grid

    wn_rt = folded_fine_grid(wn, cfg.fold_K) if cfg.fold_K > 1 else wn
    print(f"# fold_K={cfg.fold_K} output W={len(wn)} fine={len(wn_rt)}")
    tli = p.stage_linelist(wn_rt)
    import time

    t0 = time.time()
    grid = p.stage_opacity(tli, wn_rt, pressure, atm)
    print(f"# opacity stage: {time.time()-t0:.1f}s")
    fm, like, space = p.stage_forward(atm, wn, grid)

    import jax.numpy as jnp

    truth = np.asarray(cfg.params, np.float64)
    t0 = time.time()
    bf, _, ok = fm.jitted()(jnp.asarray(truth, fm.dtype))
    bf = np.asarray(bf)
    print(f"# forward(truth): {time.time()-t0:.1f}s  valid={bool(ok)}")
    assert bool(ok)
    print("data   = " + " ".join(f"{v:.6e}" for v in bf))
    print("uncert = " + " ".join(f"{0.025*v:.6e}" for v in bf))
    # delta vs the committed (currently K=1) depths
    from bart_tpu.driver.config import load_data_array

    old = load_data_array(cfg.data)
    unc = load_data_array(cfg.uncert)
    print("# delta vs committed pin: "
          + " ".join(f"{(b-o)/u:+.3f}sig" for b, o, u in zip(bf, old, unc)))


if __name__ == "__main__":
    main()
