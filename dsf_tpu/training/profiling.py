"""Profiling hooks (SURVEY §5: the reference has none; we provide
jax.profiler traces + simple step timers)."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-time statistics (host wall clock around the jitted
    step; call .tick() after block_until_ready)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: list = []
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now

    @property
    def mean_ms(self):
        return 1e3 * sum(self.times) / max(len(self.times), 1)

    def fps(self, batch_size):
        m = self.mean_ms
        return batch_size / (m / 1e3) if m else 0.0
