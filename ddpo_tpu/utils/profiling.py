"""Profiling hooks: jax.profiler traces + named step timers.

The reference imports jax.profiler but never invokes it (SURVEY.md 5.1);
here traces are first-class: wrap any phase in ``trace(dir)`` or use
``StepTimer`` for lightweight wall-clock phase accounting that lands in the
train_info artifacts.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace context; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Accumulate wall-clock per named phase; report means."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - start
            self.counts[name] += 1

    def means(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(1, self.counts[k]) for k in self.totals}

    def report(self) -> str:
        return " | ".join(f"{k}: {v:.3f}s" for k, v in self.means().items())
