"""Profiling helpers: jax.profiler traces + a wall-clock step timer.

The reference's only instrumentation is wall-clock AverageMeters
(/root/reference/train_realesrnet.py:240-241); here those remain (utils/
meters.py) and this module adds the TPU-native tracing the reference lacks:
``trace()`` captures a TensorBoard-viewable device trace, ``StepTimer``
summarizes steady-state step time excluding compilation.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, List, Optional


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace") -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard's profile plugin)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Steady-state step timing that discards warmup/compile steps."""

    def __init__(self, skip_first: int = 2):
        self.skip_first = skip_first
        self._times: List[float] = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
        self._last = now

    @property
    def steady_mean(self) -> float:
        samples = self._times[self.skip_first:]
        return sum(samples) / len(samples) if samples else float("nan")

    def summary(self, items_per_step: float = 1.0) -> str:
        m = self.steady_mean
        return (f"{m * 1000:.1f} ms/step, {items_per_step / m:.2f} items/s"
                if m == m else "no steady-state samples")
