"""Profiling / timing utilities.

Replaces the reference's ad-hoc ``time.time()`` deltas and rolling deques
(``radarscenes_complete_analysis.py:145,215-219``,
``real_time_processor.py:204-205,353-375``) with:

- :class:`StageTimer` -- named wall-clock sections with rolling statistics
  (device-synchronizing so jitted sections measure real work);
- :func:`trace` -- context manager around ``jax.profiler`` for XLA-level
  traces viewable in TensorBoard/Perfetto;
- :func:`benchmark` -- compile-then-measure helper used by bench.py-style
  scripts.
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


class StageTimer:
    def __init__(self, window: int = 200):
        self.window = window
        self._times: Dict[str, collections.deque] = {}

    @contextlib.contextmanager
    def section(self, name: str, sync: bool = False):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                # Ensure pending device work attributed to this section.
                jax.effects_barrier()
            self._times.setdefault(
                name, collections.deque(maxlen=self.window)).append(
                    time.perf_counter() - t0)

    def record(self, name: str, seconds: float) -> None:
        self._times.setdefault(
            name, collections.deque(maxlen=self.window)).append(seconds)

    def stats(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, dq in self._times.items():
            a = np.asarray(dq)
            out[name] = {
                "count": int(len(a)),
                "mean_s": float(a.mean()),
                "p50_s": float(np.percentile(a, 50)),
                "p95_s": float(np.percentile(a, 95)),
                "max_s": float(a.max()),
            }
        return out


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard / Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark(fn: Callable, *args, warmup: int = 1, reps: int = 5,
              name: Optional[str] = None) -> Dict[str, float]:
    """Compile (warmup) then measure steady-state wall time of ``fn``."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    return {"name": name or getattr(fn, "__name__", "fn"),
            "mean_s": dt, "reps": reps}
