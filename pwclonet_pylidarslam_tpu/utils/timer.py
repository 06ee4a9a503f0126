"""Timers + profiling helpers (ref ``slam/common/timer.py``).

The reference wraps everything in cuda-synchronized wall timers; here the
equivalent is a ``block_until_ready`` timer plus first-class hooks into
``jax.profiler`` traces (SURVEY §5 "Tracing / profiling").
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


class Duration:
    """Accumulating named timer (ref ``Duration``)."""

    def __init__(self):
        self.total = 0.0
        self.count = 0

    @property
    def average(self) -> float:
        return self.total / max(self.count, 1)


class Timers:
    """Named section timers with device synchronization."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.durations: Dict[str, Duration] = defaultdict(Duration)

    @contextlib.contextmanager
    def time(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if self.sync and result is not None:
            jax.block_until_ready(result)
        d = self.durations[name]
        d.total += time.perf_counter() - t0
        d.count += 1

    def summary(self) -> Dict[str, float]:
        return {k: v.average for k, v in self.durations.items()}


@contextlib.contextmanager
def profiler_trace(log_dir: str):
    """Capture a ``jax.profiler`` trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_call(fn, *args, n: int = 5, warmup: int = 1):
    """Steady-state latency of a jitted call (blocks on the result)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n, out
