"""Tracing / profiling hooks (SURVEY.md §5: absent in the reference; the
TPU-idiomatic observability layer is jax.profiler + a step timer)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a TensorBoard-viewable XLA profile for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer with device synchronisation.

    >>> timer = StepTimer()
    >>> for batch in data:
    ...     with timer:
    ...         out = step(batch)  # timer blocks on `out` at exit
    >>> timer.summary()
    """

    def __init__(self) -> None:
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._result = None

    def __enter__(self) -> "StepTimer":
        self._t0 = time.perf_counter()
        return self

    def observe(self, result) -> None:
        """Register the step's output so exit can block on completion."""
        self._result = result

    def __exit__(self, *exc) -> bool:
        if self._result is not None:
            jax.block_until_ready(self._result)
            self._result = None
        self.times.append(time.perf_counter() - self._t0)
        return False

    def summary(self, skip_first: int = 1) -> Dict[str, float]:
        ts = self.times[skip_first:] or self.times
        ts = sorted(ts)
        n = len(ts)
        return {
            "steps": n,
            "mean_ms": sum(ts) / n * 1e3,
            "p50_ms": ts[n // 2] * 1e3,
            "min_ms": ts[0] * 1e3,
            "max_ms": ts[-1] * 1e3,
        }
