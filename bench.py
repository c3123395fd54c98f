#!/usr/bin/env python
"""bart_tpu benchmark: likelihood evaluations per second per chip.

Runs the demo-CH4-class eclipse forward model (100 layers, 2501
output wavenumbers, 30k lines, opacity-grid hot path) batched over a
chain ensemble — the workload of the reference's MCMC hot loop
(SURVEY.md section 3.2).

Baseline: the reference achieves O(3-10) likelihood evals/s/core on
CPU (BASELINE.md, "Implied likelihood throughput"); vs_baseline is
measured against the optimistic end (10 evals/s).

Prints ONE JSON line:
  {"metric": "likelihood_evals_per_s", "value": N, "unit": "evals/s/chip",
   "vs_baseline": N/10}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    dev = jax.devices()[0]
    on_tpu = "cpu" not in dev.platform.lower()
    nlines = 30000 if on_tpu else 3000
    nchain = 512 if on_tpu else 32   # realistic ensemble size; amortizes
                                     # dispatch (256 -> 512: +15% evals/s)

    t0 = time.time()
    fm = ge._build_problem(nlayer=100, nwave=2501, nlines=nlines,
                           cache=True)
    build_s = time.time() - t0
    print(f"# opacity grid {tuple(fm.sigma.shape)} built in {build_s:.1f}s "
          f"on {dev.device_kind}", file=sys.stderr)

    params = jnp.asarray(
        np.tile([-2.0, 0.0, 1.0, 0.0, 0.98, -0.5], (nchain, 1))
        + np.random.default_rng(0).normal(0, 0.005, (nchain, 6)),
        fm.dtype,
    )
    fb = fm.batched()

    t0 = time.time()
    out = fb(params)
    jax.block_until_ready(out)
    print(f"# compile+first batch: {time.time()-t0:.1f}s", file=sys.stderr)
    assert bool(jnp.all(jnp.isfinite(out[0]))), "non-finite band fluxes"
    assert bool(jnp.all(out[2])), "invalid forward evals in benchmark batch"

    # timed region
    nrep = 20 if on_tpu else 3
    t0 = time.time()
    for _ in range(nrep):
        out = fb(params)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / nrep
    evals_per_s = nchain / dt

    gridpoints_per_s = evals_per_s * 2501 * 100  # wn x layers per eval
    print(f"# batch {nchain} in {dt*1e3:.1f} ms; "
          f"{gridpoints_per_s:.3e} wn-gridpoints/s", file=sys.stderr)

    print(json.dumps({
        "metric": "likelihood_evals_per_s",
        "value": round(evals_per_s, 1),
        "unit": "evals/s/chip",
        "vs_baseline": round(evals_per_s / 10.0, 1),
    }))


if __name__ == "__main__":
    main()
