"""Profiling hooks: jax.profiler traces + step timing.

The reference has no profiling subsystem (SURVEY.md §5 "tracing: ABSENT");
this is the TPU-native equivalent: XLA/TPU trace capture viewable in
TensorBoard/Perfetto, plus a lightweight wall-clock step timer for
throughput telemetry.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str = "./profile_traces", enabled: bool = True):
    """Capture a jax.profiler trace around a code region."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock step timing -> steps/sec + images/sec telemetry."""

    def __init__(self, window: int = 50):
        self.times: deque = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self.times.append(dt)
        self._last = now
        return dt

    @property
    def steps_per_sec(self) -> Optional[float]:
        if not self.times:
            return None
        return len(self.times) / sum(self.times)

    def images_per_sec(self, batch_size: int) -> Optional[float]:
        sps = self.steps_per_sec
        return None if sps is None else sps * batch_size
