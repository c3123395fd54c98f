#!/usr/bin/env python
"""Measure the nquad=6/4 band-flux impact vs nquad=8 on the REAL
accuracy-mode WASP-12b problem (4 molecules, cached K=32 fold table).

The expsum quadrature's fit error is known analytically (worst-case
angular error 9.3e-5 at M=8, 1.7e-4 at M=6 on E3) and its band-flux
impact was measured at 2.3e-6 on the DEMO problem; this script
measures it at WASP conditions — the quadrature weights live in the
ForwardModel's tables pytree (t['mu'], t['mu_w']), so all variants
share ONE table upload.

Also measures throughput per variant at the regression's 10-chain
batch (the production setting).  Writes nquad_wasp_accuracy.json.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

from bart_tpu.driver.config import load_config
from bart_tpu.driver.pipeline import Pipeline

CFG = os.path.join(REPO, "examples", "wasp12b_eclipse_fold.cfg")


def main():
    import jax
    import jax.numpy as jnp

    from bart_tpu.rt.eclipse import expsum_weights

    outdir = os.path.join(REPO, "examples", "wasp12b_out_fold")
    cfg = load_config(CFG, {"loc_dir": outdir, "plots": "False"})
    p = Pipeline(cfg)
    pressure = p.stage_pressure()
    elems = p.stage_abundances()
    atm = p.stage_atmosphere(pressure, elems)
    wn = cfg.wavenumber_grid()
    from bart_tpu.utils.grids import folded_fine_grid

    wn_rt = folded_fine_grid(wn, cfg.fold_K)
    tli = p.stage_linelist(wn_rt)
    grid = p.stage_opacity(tli, wn_rt, pressure, atm)
    fm, like, space = p.stage_forward(atm, wn, grid)

    truth = np.asarray(cfg.params, np.float64)
    rng = np.random.default_rng(0)
    # 10 posterior-typical parameter vectors (truth + jitter within
    # the constrained directions' scale)
    batch = np.tile(truth, (10, 1)) + rng.normal(0, 0.02, (10, len(truth)))
    pb = jnp.asarray(batch, fm.dtype)

    results = {}
    bf_ref = None
    for nq in (8, 6, 4):
        mu, w = expsum_weights(nq)
        t = dict(fm.tables)
        t["mu"] = jnp.asarray(mu, fm.dtype)
        t["mu_w"] = jnp.asarray(w, fm.dtype)
        f = jax.jit(jax.vmap(lambda q, tt: fm(q, tt)[0], in_axes=(0, None)))
        bf = np.asarray(f(pb, t))
        assert np.all(np.isfinite(bf))
        # serialized 10-chain timing (the regression's batch size)
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            for _ in range(10):
                bf_j = f(pb, t)
            float(jnp.sum(bf_j[0]))
            best = min(best, (time.time() - t0) / 10)
        row = {"ms_per_10chain_batch": round(best * 1e3, 2),
               "evals_per_s": round(10 / best)}
        if nq == 8:
            bf_ref = bf
        else:
            rel = np.abs(bf - bf_ref) / np.abs(bf_ref)
            row["band_flux_rel_vs_nq8"] = {
                "max": float(rel.max()), "mean": float(rel.mean())}
        results[f"nq{nq}"] = row
        print(json.dumps({f"nq{nq}": row}), flush=True)

    path = os.path.join(REPO, "examples", "nquad_wasp_accuracy.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"written": path}))


if __name__ == "__main__":
    main()
