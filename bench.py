#!/usr/bin/env python
"""bart_tpu benchmark: likelihood evaluations per second per chip.

Runs the demo-CH4-class forward model (100 layers, 2501 output
wavenumbers, 30k lines, opacity-grid hot path) batched over a chain
ensemble — the workload of the reference's MCMC hot loop (SURVEY.md
section 3.2).  The primary metric (eclipse geometry) is measured and
its JSON line printed FIRST; everything else (transit geometry,
roofline accounting, folded-rtosamp modes) is a deadline-guarded
extra on stderr, so a slow remote-tunnel day degrades the extras,
never the scoreboard (BENCH_r03 lesson: rc=124, parsed=null).

Baseline: the reference achieves O(3-10) likelihood evals/s/core on
CPU (BASELINE.md, "Implied likelihood throughput"); vs_baseline is
measured against the optimistic end (10 evals/s).

Prints ONE JSON line (primary metric; extra measurements on stderr):
  {"metric": "likelihood_evals_per_s", "value": N, "unit": "evals/s/chip",
   "vs_baseline": N/10}

Budget: BENCH_BUDGET_S (default 420 s).  The primary measurement is
never skipped; timing rounds shrink 3 -> 1 when the cold path (table
build + compile + tunnel warmup) has eaten the budget.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

NLAYER, NWAVE = 100, 2501
# v5e single-chip peaks (public spec): 197 Tflop/s bf16 MXU,
# 819 GB/s HBM.  VPU f32 transcendental-path effective ceiling is
# ~5e12 flop/s (measured on the pure-Voigt opacity build, which is
# VPU-bound by construction).
HBM_PEAK_GBS = 819.0
VPU_EFF_FLOPS = 5.0e12

T_START = time.time()
DEADLINE = T_START + float(os.environ.get("BENCH_BUDGET_S", "420"))


def _left():
    return DEADLINE - time.time()


def _time_batched(fb, params, nrep, jax, rounds=3):
    """Serialized (chained-dependency) batch timing.

    Each iteration's input depends on the previous iteration's output
    and the loop ends with a HOST read of the result — this measures
    what an MCMC step actually costs (step t+1 depends on step t).
    Timing N independent dispatches and blocking once at the end
    measures pipelined throughput instead, and through the remote-TPU
    tunnel `block_until_ready` was observed to intermittently not wait
    at all (0.04 ms/batch readings): rounds 1-2 reported such numbers.
    """
    import jax.numpy as jnp

    out = fb(params)
    assert bool(np.all(np.isfinite(np.asarray(out[0])))), "non-finite flux"
    assert bool(np.all(np.asarray(out[2]))), "invalid forward evals"
    times = []
    for _round in range(rounds):  # round 1 absorbs remote warmup transients
        p = params
        t0 = time.time()
        for _ in range(nrep):
            out = fb(p)
            p = params + 0.0 * jnp.sum(out[0])   # serialize the chain
        assert np.isfinite(float(jnp.sum(out[0])))  # host read = barrier
        times.append((time.time() - t0) / nrep)
    best = min(times)
    # Median-vs-best spread as % of best: quantifies the tunnel's
    # run-to-run variance on the reported (best) value so +-15-25%
    # noise (docs/PERFORMANCE.md) can't masquerade as a regression or
    # a win.  Median, not max: the tunnel occasionally stalls one
    # round 10-20x (a transport artifact, not program variance), and
    # a max-based spread would be dominated by that one outlier.  The
    # raw per-round times go to stderr for transparency.
    spread_pct = (
        100.0 * (float(np.median(times)) - best) / best
        if len(times) > 1 else 0.0
    )
    print("# rounds [ms]: " + ", ".join(f"{t*1e3:.2f}" for t in times),
          file=sys.stderr)
    return best, spread_pct


def _extras(ge, jax, fm, params, nchain, nlines, nrep, dt, on_tpu):
    """Secondary measurements: transit geometry, roofline, folded
    modes.  Runs after the primary JSON is already out; every stage is
    deadline-guarded and all output goes to stderr."""
    import jax.numpy as jnp

    evals_per_s = nchain / dt

    if _left() < 45:
        print(f"# extras skipped: {_left():.0f}s left in budget",
              file=sys.stderr)
        return
    # --- transit geometry on the same (cached) opacity grid ---
    fmt = ge._build_problem(nlayer=NLAYER, nwave=NWAVE, nlines=nlines,
                            cache=True, solution="transit")
    tparams = jnp.asarray(
        np.concatenate(
            [np.asarray(params)[:, :5],
             np.full((nchain, 1), fmt.r0_km),
             np.asarray(params)[:, 5:]], axis=1),
        fmt.dtype,
    )
    dt_t, sp_t = _time_batched(fmt.batched(), tparams, nrep, jax,
                               rounds=3 if _left() > 90 else 1)
    print(f"# transit: batch {nchain} in {dt_t*1e3:.2f} ms; "
          f"{nchain/dt_t:.0f} evals/s (spread {sp_t:.0f}%)",
          file=sys.stderr)

    # --- roofline accounting (eclipse primary) ---
    gridpoints = nchain * NWAVE * NLAYER
    nrows = int(fm.sigma.shape[0] * fm.sigma.shape[1]) + 4  # mol*nT + aux
    mxu_flops = 2.0 * gridpoints * nrows          # rows-contraction
    # per (chain, layer, wn): Planck exp + K=5 mu-attenuation exps +
    # trapezoid/accumulate arithmetic ~ 6 exp x ~24 flop + ~30 flop
    vpu_flops = gridpoints * (6 * 24 + 30)
    # HBM lower bound: table re-streamed per chain block (cb=128) +
    # weight rows + band output
    cb = 128
    table_bytes = float(np.prod(fm.sigma.shape)) * 4 * (nchain / cb)
    io_bytes = table_bytes + nchain * NLAYER * nrows * 4 + nchain * NWAVE * 4
    print(f"# roofline (eclipse, per {nchain}-chain batch): "
          f"MXU {mxu_flops/dt/1e12:.2f} Tflop/s "
          f"({100*mxu_flops/dt/1.97e14:.1f}% of bf16 peak), "
          f"VPU ~{vpu_flops/dt/1e12:.2f} Tflop/s "
          f"({100*vpu_flops/dt/VPU_EFF_FLOPS:.0f}% of measured "
          f"transcendental ceiling), "
          f"HBM >= {io_bytes/dt/1e9:.0f} GB/s "
          f"({100*io_bytes/dt/1e9/HBM_PEAK_GBS:.0f}% of peak)",
          file=sys.stderr)
    print(f"# {evals_per_s*NWAVE*NLAYER:.3e} wn-gridpoints/s (eclipse); "
          f"{nchain/dt_t*NWAVE*NLAYER:.3e} (transit)", file=sys.stderr)

    # --- folded rtosamp=32 (publication accuracy, <1e-4 band flux) ---
    # Runs by DEFAULT (round-5): the K=32 fine table is a one-time
    # ~5-min cold build behind the input-keyed cache, and each stage
    # is deadline-guarded, so a cold-cache day degrades these extras
    # rather than the scoreboard.  BENCH_FOLD=0 opts out.
    if on_tpu and os.environ.get("BENCH_FOLD", "1") != "0":
        for geom, quad, adapt in (("eclipse", "expsum", 0.02),
                                  ("transit", "raygrid", 0.02)):
            if _left() < 100:
                print(f"# folded {geom} skipped: {_left():.0f}s left "
                      f"in budget", file=sys.stderr)
                break
            # fold_bf16: the production storage knob — BITWISE-equal
            # kernel outputs on TPU (the folded fills' DEFAULT
            # precision rounds f32 operands to the same bf16 values)
            # with half the table stream (docs/PERFORMANCE.md)
            fmf = ge._build_problem(
                nlayer=NLAYER, nwave=NWAVE, nlines=nlines, cache=True,
                fold=32, fold_adapt=adapt, quadrature=quad, solution=geom,
                fold_bf16=True)
            frac = (len(fmf._idx_fine) / NWAVE
                    if getattr(fmf, "_idx_fine", None) is not None else 1.0)
            pf = params if geom == "eclipse" else jnp.asarray(
                np.concatenate([np.asarray(params)[:, :5],
                                np.full((nchain, 1), fmf.r0_km),
                                np.asarray(params)[:, 5:]], axis=1),
                fmf.dtype)
            dt_f, sp_f = _time_batched(fmf.batched(), pf, nrep, jax,
                                       rounds=3 if _left() > 120 else 1)
            print(f"# folded rtosamp=32 {geom} adapt={adapt} {quad} "
                  f"(fine frac {frac:.2f}): batch {nchain} in "
                  f"{dt_f*1e3:.2f} ms; {nchain/dt_f:.0f} evals/s "
                  f"(spread {sp_f:.0f}%)", file=sys.stderr)


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    dev = jax.devices()[0]
    on_tpu = "cpu" not in dev.platform.lower()
    nlines = 30000 if on_tpu else 3000
    nchain = 512 if on_tpu else 32   # realistic ensemble size; amortizes
                                     # dispatch (256 -> 512: +15% evals/s)
    nrep = 20 if on_tpu else 3

    t0 = time.time()
    fm = ge._build_problem(nlayer=NLAYER, nwave=NWAVE, nlines=nlines,
                           cache=True)
    build_s = time.time() - t0
    print(f"# opacity grid {tuple(fm.sigma.shape)} ready in {build_s:.1f}s "
          f"on {dev.device_kind} (cached after first run; steady-state "
          f"device build time is ~3.6s at this scale, see "
          f"docs/PERFORMANCE.md)", file=sys.stderr)

    rng = np.random.default_rng(0)
    base = np.array([-2.0, 0.0, 1.0, 0.0, 0.98, -0.5])
    params = jnp.asarray(
        np.tile(base, (nchain, 1)) + rng.normal(0, 0.005, (nchain, 6)),
        fm.dtype,
    )

    t0 = time.time()
    rounds = 3 if _left() > 60 else 1
    dt, spread = _time_batched(fm.batched(), params, nrep, jax,
                               rounds=rounds)
    print(f"# eclipse: compile+first {time.time()-t0-rounds*nrep*dt:.1f}s; "
          f"batch {nchain} in {dt*1e3:.2f} ms ({rounds} timing rounds)",
          file=sys.stderr)
    evals_per_s = nchain / dt

    # PRIMARY METRIC — printed before any secondary measurement so a
    # budget overrun in the extras can never blank the scoreboard.
    # spread_pct: best-vs-worst timing round within this process, so
    # the +-15-25% remote-tunnel variance cannot masquerade as a
    # round-over-round regression or win.
    print(json.dumps({
        "metric": "likelihood_evals_per_s",
        "value": round(evals_per_s, 1),
        "unit": "evals/s/chip",
        "vs_baseline": round(evals_per_s / 10.0, 1),
        "spread_pct": round(spread, 1),
    }), flush=True)

    try:
        _extras(ge, jax, fm, params, nchain, nlines, nrep, dt, on_tpu)
    except Exception as e:  # extras must never fail the bench
        print(f"# extras failed (primary already reported): {e!r}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
