"""Profiling / tracing utilities.

The reference has no profiling support beyond a commented-out line_profiler hook
(`dataset/chalearn_dataset.py:16-19`). Here:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
    TensorBoard-loadable device trace (XLA op timeline, HBM usage);
  * ``StepTimer`` — cheap wall-clock step statistics with warmup exclusion, used
    by bench and available to the trainer.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import List, Optional


@contextlib.contextmanager
def trace(logdir: Path):
    """Capture a device profile: ``with trace('logs/profile'): run_steps()``."""
    import jax

    logdir = Path(logdir)
    logdir.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(logdir))
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._all: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._all.append(time.perf_counter() - self._t0)
        return False

    @property
    def times(self) -> List[float]:
        return self._all[self.warmup :]

    @property
    def mean(self) -> float:
        ts = self.times
        return sum(ts) / len(ts) if ts else float("nan")

    def throughput(self, items_per_step: int) -> float:
        return items_per_step / self.mean if self.times else float("nan")
