"""Profiling & step-time observability.

The reference has no profiling in the AuM path (SURVEY.md §5; the vendored
generation utils time decode with CUDA events, generation.py:199-226). The
TPU-native equivalents:

- `trace(logdir)`: context manager around `jax.profiler.trace` — produces a
  TensorBoard-loadable XLA trace of everything run inside;
- `annotate(name)`: `jax.profiler.TraceAnnotation` wrapper for labeling host
  regions inside a trace;
- `StepTimer`: host-side step-time / clips-per-sec meter with warmup skip,
  the number `bench.py` reports.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

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


class StepTimer:
    """Step-time and throughput meter (skips warmup/compile steps)."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup_steps = warmup_steps
        self.reset()

    def reset(self):
        self._seen = 0
        self._items = 0
        self._elapsed = 0.0
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, n_items: int = 1):
        assert self._t0 is not None, "call start() first"
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self._seen += 1
        if self._seen > self.warmup_steps:
            self._elapsed += dt
            self._items += n_items

    @property
    def steps_timed(self) -> int:
        return max(0, self._seen - self.warmup_steps)

    @property
    def mean_step_time(self) -> float:
        return self._elapsed / self.steps_timed if self.steps_timed else 0.0

    @property
    def items_per_sec(self) -> float:
        return self._items / self._elapsed if self._elapsed > 0 else 0.0
