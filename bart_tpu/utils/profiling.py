"""Tracing and stage timing.

The reference has no structural tracing (SURVEY.md section 5: verbosity
prints only).  bart_tpu provides:

* ``stage_timer``: lightweight wall/device timing per pipeline stage,
  appended to a JSON-lines file for observability;
* ``device_trace``: a context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace of the device execution (XLA ops, fusion,
  HBM traffic) — enable with ``--profile <dir>`` on the CLI.
"""

from __future__ import annotations

import contextlib
import json
import time

__all__ = ["stage_timer", "device_trace"]


@contextlib.contextmanager
def stage_timer(name: str, logfile: str | None = None, verbose: bool = True):
    t0 = time.time()
    try:
        yield
    finally:
        dt = time.time() - t0
        rec = {"stage": name, "wall_s": round(dt, 3), "ts": time.time()}
        if verbose:
            print(f"[bart_tpu] stage {name}: {dt:.2f}s")
        if logfile:
            with open(logfile, "a") as f:
                f.write(json.dumps(rec) + "\n")


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """jax.profiler trace (no-op when trace_dir is None)."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
