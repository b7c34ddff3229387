"""Profiling / tracing helpers.

The reference has an unused wall-clock Timer (cuda_src/utils.h:395-426) and
tracks sec/video in the eval loop. TPU-native equivalents: a Timer context
manager, a ThroughputMeter, and jax.profiler trace capture for xprof.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class Timer:
    """Wall-clock timer usable as a context manager."""

    def __init__(self):
        self.elapsed = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def stop(self):
        self.elapsed += time.perf_counter() - self._t0
        return self.elapsed

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()


class ThroughputMeter:
    """Tracks items/sec with warmup exclusion."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._batches = 0
        self._items = 0
        self._t0 = None

    def update(self, n: int):
        self._batches += 1
        if self._batches == self.warmup:
            self._t0 = time.perf_counter()
            self._items = 0
        elif self._batches > self.warmup:
            self._items += n

    @property
    def items_per_sec(self) -> float:
        if self._t0 is None or self._items == 0:
            return 0.0
        return self._items / (time.perf_counter() - self._t0)


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Capture a jax.profiler trace viewable in XProf/TensorBoard."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
