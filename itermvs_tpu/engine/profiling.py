"""Tracing / profiling hooks (SURVEY §5: the reference has none beyond
wall-clock prints; we add first-class jax.profiler integration).

Usage:
    with trace("/tmp/tb"):          # XLA trace viewable in TensorBoard
        step(...)

    timer = StepTimer()
    with timer.measure():
        step(...)
    print(timer.summary())

Set ITERMVS_DEBUG_NANS=1 to enable jax_debug_nans (the TPU analogue of
the reference's inline NaN asserts, module.py:83,87).
"""
from __future__ import annotations

import contextlib
import os
import time

import numpy as np


def maybe_enable_nan_debugging():
    if os.environ.get("ITERMVS_DEBUG_NANS") == "1":
        import jax

        jax.config.update("jax_debug_nans", True)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context; view with TensorBoard's profile plugin."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step-time meter with percentile summary."""

    def __init__(self):
        self.times: list[float] = []

    @contextlib.contextmanager
    def measure(self):
        start = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - start)

    def summary(self, skip_warmup: int = 1) -> dict:
        t = np.asarray(self.times[skip_warmup:] or self.times)
        return {
            "steps": len(t),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p90_s": float(np.percentile(t, 90)),
            "steps_per_sec": float(1.0 / t.mean()) if t.mean() > 0 else 0.0,
        }
