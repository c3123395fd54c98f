#!/usr/bin/env python
"""Roofline + knob study: folded K=32 kernels at WASP conditions.

Round-4 measured the all-fine folded floor (fine-bin fraction 1.0 at
nwidth=60 WASP conditions): ~15.3k eclipse / ~17.2k transit evals/s,
with no accounting of WHERE the time goes.  This script measures, in
ONE process (tunnel-comparable):

* folded eclipse throughput at nquad in {8, 6, 4} — the linear fit
  t(nquad) = t_fix + nquad * t_term empirically separates the Horner
  attenuation polynomial (the nquad-proportional VPU work) from the
  fixed part (exp evaluations, tau recurrence, MXU fills, streams);
* folded transit throughput (no nquad dependence; MXU slant-bound);
* an analytic FLOP/byte model per component, printed as utilization
  against the measured ceilings (VPU ~5 Tflop/s elementwise, ~700
  Gexp/s transcendental, 197 Tflop/s bf16 MXU, 819 GB/s HBM).

Shapes mirror examples/fold_density_study.py (WASP wn range
910-3400 @ 1 cm^-1, 100 layers, 27 rows, K=32, 512 chains), where the
round-4 floor numbers were measured.

Usage: python examples/fold_wasp_roofline.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bart_tpu.rt.eclipse import expsum_weights
from bart_tpu.rt.fused import fused_eclipse_folded, fused_transit_folded

K = 32
WN_LO, WN_HI = 910.0, 3400.0
L, R = 100, 27

# measured single-chip ceilings (docs/PERFORMANCE.md)
VPU_EFF = 5.0e12          # f32 elementwise flop/s
EXP_RATE = 700e9          # exp/s (measured dependent-chain microbench)
MXU_BF16 = 197e12
HBM = 819e9


def build_problem(nchain):
    rng = np.random.default_rng(0)
    f32 = jnp.float32
    wn_out = WN_LO + 1.0 * np.arange(int(WN_HI - WN_LO) + 1)
    W = len(wn_out)
    tabk = jnp.asarray(rng.random((K, R, L, W)) * 1e-22, f32)
    wn_f = jnp.asarray(wn_out, f32)
    wrows = jnp.asarray(1e-3 + rng.random((nchain, L, R)) * 1e4, f32)
    T = jnp.asarray(rng.uniform(900, 2500, (nchain, L)), f32)
    rad = np.sort(rng.uniform(9.0e9, 9.7e9, (nchain, L)), axis=1)[:, ::-1]
    drp = jnp.asarray(
        np.concatenate([np.zeros((nchain, 1)),
                        rad[:, :-1] - rad[:, 1:]], axis=1), f32)
    from bart_tpu.rt.transit_geom import slant_geometry

    G, wgt = jax.vmap(slant_geometry)(jnp.asarray(rad.copy(), f32))
    return wn_f, tabk, wrows, T, drp, G, wgt, W


def timeit(fn, args, nrep):
    r = fn(*args)
    assert bool(np.all(np.isfinite(np.asarray(r))))
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        for _ in range(nrep):
            r = fn(*args)
        float(jnp.sum(r))
        best = min(best, (time.time() - t0) / nrep)
    return best


def main():
    on_tpu = jax.default_backend() == "tpu"
    nchain, nrep = (512, 10) if on_tpu else (4, 1)
    wn_f, tabk, wrows, T, drp, G, wgt, W = build_problem(nchain)
    print(f"# backend={jax.default_backend()} K={K} W={W} L={L} R={R} "
          f"chains={nchain}", flush=True)

    rows = []
    times = {}
    for nq in (8, 6, 4):
        mu, muw = expsum_weights(nq)
        mu = jnp.asarray(mu, jnp.float32)
        muw = jnp.asarray(muw, jnp.float32)

        def ecl(tk, wr, t, d, mu=mu, muw=muw):
            return fused_eclipse_folded(tk, wn_f, mu, muw, wr, t, d,
                                        powers=True)

        fe = jax.jit(jax.vmap(ecl, in_axes=(None, 0, 0, 0)))
        dt = timeit(fe, (tabk, wrows, T, drp), nrep)
        times[nq] = dt
        rows.append({"kernel": "eclipse", "nquad": nq,
                     "ms_per_batch": round(dt * 1e3, 2),
                     "evals_per_s": round(nchain / dt)})
        print("# " + json.dumps(rows[-1]), flush=True)

    ft = jax.jit(jax.vmap(fused_transit_folded,
                          in_axes=(None, 0, 0, 0)))
    dt_t = timeit(ft, (tabk, wrows, G, wgt), nrep)
    rows.append({"kernel": "transit", "ms_per_batch": round(dt_t * 1e3, 2),
                 "evals_per_s": round(nchain / dt_t)})
    print("# " + json.dumps(rows[-1]), flush=True)

    # ---- empirical decomposition from the nquad slope ----------------
    nqs = np.array([8, 6, 4], np.float64)
    ts = np.array([times[int(q)] for q in nqs])
    slope, t_fix = np.polyfit(nqs, ts, 1)      # s per nquad term, fixed
    pts = nchain * L * W * K                   # fine gridpoints per batch
    # analytic per-component model (eclipse):
    t_exp = pts / EXP_RATE                     # one exp per point (powers)
    horner_flops = 2.0 * pts                   # 1 FMA per term per point
    t_horner_pred = horner_flops / VPU_EFF     # per nquad term
    mxu_flops = 2.0 * pts * R                  # fills rows-contraction
    t_mxu = mxu_flops / MXU_BF16
    # HBM: table streamed once per chain block (cb=128 at these shapes)
    cb = 128
    tbl_bytes = float(np.prod(tabk.shape)) * 4
    t_hbm = tbl_bytes * (nchain / cb) / HBM
    recurrence_flops = 6.0 * pts               # tau update + accumulate
    t_rec = recurrence_flops / VPU_EFF

    decomp = {
        "t_fix_ms": round(t_fix * 1e3, 2),
        "t_per_nquad_term_ms": round(slope * 1e3, 3),
        "pred_horner_term_ms": round(t_horner_pred * 1e3, 3),
        "pred_exp_ms": round(t_exp * 1e3, 2),
        "pred_recurrence_ms": round(t_rec * 1e3, 2),
        "pred_mxu_fill_ms_at_peak": round(t_mxu * 1e3, 2),
        "pred_hbm_stream_ms": round(t_hbm * 1e3, 2),
        "vpu_serial_model_ms_nq8": round(
            (t_exp + 8 * t_horner_pred + t_rec) * 1e3, 2),
        "measured_nq8_ms": round(times[8] * 1e3, 2),
        "vpu_utilization_nq8": round(
            (t_exp + 8 * t_horner_pred + t_rec) / times[8], 3),
    }
    print("# decomposition: " + json.dumps(decomp), flush=True)
    out = {"metric": "fold_wasp_roofline", "rows": rows,
           "decomposition": decomp}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fold_wasp_roofline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": path}))


if __name__ == "__main__":
    main()
