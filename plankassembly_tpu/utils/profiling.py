"""Tracing / profiling hooks.

The reference has none (SURVEY.md §5.1 — only cudnn `benchmark: True`).
TPU-native observability:

- `trace_context(log_dir)`: jax.profiler trace (open in TensorBoard's or
  Perfetto's trace viewer) around any code region;
- `StepTimer`: wall-clock step timing with `block_until_ready` fencing and
  an EMA, for steps/sec + programs/sec reporting;
- `annotate`: named regions inside traced code (shows up on the timeline).
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace_context(log_dir: str, enabled: bool = True):
    """Capture a jax.profiler trace of the enclosed region."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region for the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """EMA step timer. Call `tick(result)` once per step; it fences on the
    result the first few steps to exclude compile time from the average."""

    def __init__(self, warmup: int = 2, ema: float = 0.9):
        self.warmup = warmup
        self.ema = ema
        self.count = 0
        self.avg_s: float | None = None
        self._last = None

    def tick(self, result=None) -> float | None:
        now = time.perf_counter()
        if self.count < self.warmup and result is not None:
            jax.block_until_ready(result)
            now = time.perf_counter()
        if self._last is not None and self.count >= self.warmup:
            dt = now - self._last
            self.avg_s = dt if self.avg_s is None else (
                self.ema * self.avg_s + (1 - self.ema) * dt)
        self._last = now
        self.count += 1
        return self.avg_s

    @property
    def steps_per_sec(self) -> float | None:
        return 1.0 / self.avg_s if self.avg_s else None
