"""Profiling (SURVEY §5.1: the reference has only broken wall-clock meters).

- `trace(logdir)`: context manager around jax.profiler.trace — produces a
  TensorBoard-compatible device trace (op-level timing on TPU).
- `StepTimer`: device-time step measurement via a dependency-chained fetch
  (wall-clock between host fetches; robust against async dispatch and
  remote-execution caching, which fake naive timers — the reference's
  throughput meter divides by ~0, model_utils.py:196-198).
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


class StepTimer:
    """Measure steady-state step time: call tick(result) each step; the
    timer fetches (blocks on) every k-th result so the device pipeline
    stays busy between sync points."""

    def __init__(self, sync_every: int = 10):
        self.sync_every = sync_every
        self._count = 0
        self._t0: Optional[float] = None
        self._steps = 0
        self.seconds_per_step = float("nan")

    def tick(self, result):
        self._count += 1
        if self._count % self.sync_every:
            return
        jax.block_until_ready(result)
        now = time.perf_counter()
        if self._t0 is not None:
            self.seconds_per_step = (now - self._t0) / self.sync_every
        self._t0 = now
        self._steps += self.sync_every
