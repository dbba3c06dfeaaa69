"""Profiling, tracing, and numeric-safety harnesses (SURVEY.md §5).

The reference had nothing beyond stdout step timing; here:

  - `StepTimer` — wall-time/throughput stats with block_until_ready
    fencing (median/p10/p90), the measurement discipline behind
    bench.py and BENCH_r*.json;
  - `trace` — context manager around jax.profiler for Perfetto traces
    (`tensorboard --logdir` or ui.perfetto.dev);
  - `checked` — wraps a function with jax.experimental.checkify NaN/inf
    guards for debugging diverging runs (the reference's equivalent was
    "watch the loss"); zero cost when unused.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


class StepTimer:
    """Collects fenced per-step wall times; reports robust stats."""

    def __init__(self):
        self.times: list[float] = []
        self._t0: float | None = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, *fence):
        for x in fence:
            jax.block_until_ready(x)
        self.times.append(time.perf_counter() - self._t0)

    @contextlib.contextmanager
    def step(self, fence_fn=None):
        self.start()
        out = {}
        yield out
        self.stop(*(out.values() if out else ()))

    def stats(self, payload_per_step: float = 1.0) -> dict:
        t = np.asarray(self.times)
        if len(t) == 0:
            return {}
        return {
            "steps": len(t),
            "median_s": float(np.median(t)),
            "p10_s": float(np.percentile(t, 10)),
            "p90_s": float(np.percentile(t, 90)),
            "throughput": float(payload_per_step / np.median(t)),
        }


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (XLA + host) for Perfetto/TB."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def checked(fn: Callable) -> Callable:
    """Return a wrapped fn that raises on NaN/inf/OOB inside jit
    (jax.experimental.checkify float + index checks)."""
    from jax.experimental import checkify

    cfn = checkify.checkify(
        fn, errors=checkify.float_checks | checkify.index_checks
    )

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper
