"""Profiling / timing utilities.

The reference's only observability is wall-clock prints (SURVEY.md §5); the
rebuild adds structured per-step timing and `jax.profiler` trace capture.
"""
from __future__ import annotations

import contextlib
import time

__all__ = ["StepTimer", "trace"]


class StepTimer:
    """Wall-clock step timer with an exponential moving average.

    Note: under async dispatch a step() interval measures host-side issue
    time unless the caller blocks; pair with ``block=True`` metrics reads or
    use :func:`trace` for device-side truth.
    """

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg = None
        self.last = None
        self._t0 = time.perf_counter()

    def step(self) -> float:
        now = time.perf_counter()
        self.last = now - self._t0
        self._t0 = now
        self.avg = (
            self.last if self.avg is None
            else self.ema * self.avg + (1 - self.ema) * self.last
        )
        return self.last

    @property
    def steps_per_sec(self) -> float:
        return 1.0 / self.avg if self.avg else float("nan")


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace(dir):`` — capture a jax.profiler trace of the block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
