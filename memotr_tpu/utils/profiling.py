"""Tracing / profiling hooks.

The reference's observability is wall-clock per-iter timing + max CUDA memory
(train_engine.py:191,251-263).  TPU-native equivalents:

- ``trace(logdir)``: jax.profiler trace context (viewable in TensorBoard /
  Perfetto) around any region,
- ``annotate(name)``: TraceAnnotation for named sub-regions,
- ``device_memory_stats()``: live/peak HBM bytes from the device allocator —
  the max-memory counter of the reference's loop,
- ``StepTimer``: wall-clock EMA of step time with compile-step exclusion.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats(device=None) -> Dict[str, int]:
    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }


class StepTimer:
    """Wall-clock step timing that ignores the first (compile) step."""

    def __init__(self, skip_first: int = 1):
        self.skip = skip_first
        self.count = 0
        self.total = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        if self.skip > 0:
            self.skip -= 1
        else:
            self.total += dt
            self.count += 1

    @property
    def mean(self) -> float:
        return self.total / max(1, self.count)
