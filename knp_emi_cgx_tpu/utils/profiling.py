"""Timers and profiler integration.

The reference instruments with manual perf_counter timers reduced over MPI
(KNPEMIx_solver.py:349-446) and has no profiler hook (SURVEY §5.1).  Here:

  * `Timers` — the same wall-clock discipline (setup/assembly/solve series,
    npy-exportable), plus a summary printer;
  * `trace(logdir)` — context manager around `jax.profiler` producing a
    TensorBoard-compatible device trace of the jitted step (works on TPU);
  * annotations via `jax.profiler.TraceAnnotation` for host-side phases.

Caveat for this runtime: reading timers per step forces host sync; Timers
therefore only records host-visible wall clock around dispatches.  For true
device timings use `trace` and inspect the profile.
"""
from __future__ import annotations

import contextlib
import time

import numpy as np


class Timers:
    def __init__(self):
        self.series: dict[str, list[float]] = {}

    @contextlib.contextmanager
    def measure(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.series.setdefault(name, []).append(time.perf_counter() - t0)

    def total(self, name: str) -> float:
        return sum(self.series.get(name, []))

    def export(self, out_dir: str):
        import os

        for name, vals in self.series.items():
            np.save(os.path.join(out_dir, f"{name}_time.npy"),
                    np.asarray(vals))

    def summary(self) -> str:
        lines = []
        for name, vals in self.series.items():
            v = np.asarray(vals)
            lines.append(f"{name}: total {v.sum():.4f}s over {len(v)} "
                         f"(mean {v.mean()*1e3:.2f} ms)")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace around a code region."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
