"""Tracing / profiling utilities.

The reference's only observability is printed wall-clock deltas
(src/recommender/Evaluator.py:171,195-200).  Here:

- `trace(logdir)` context: captures a jax.profiler trace viewable in
  TensorBoard/Perfetto (device timelines, HLO ops, memory);
- `annotate(name)`: a jax.profiler.TraceAnnotation + jax.named_scope so
  framework phases (sample/lookup/score/update/eval) are labelled in traces;
- `StepTimer`: lightweight rolling wall-clock stats for step/epoch loops,
  with JSONL emission via utils.io.JsonlLogger.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Label the enclosed dispatches in profiler traces and HLO names."""
    with jax.profiler.TraceAnnotation(name):
        with jax.named_scope(name):
            yield


def start_server(port: int = 9999):
    """Start the on-demand profiling server (connect with TensorBoard)."""
    return jax.profiler.start_server(port)


class StepTimer:
    """Rolling wall-clock stats; `lap(name)` accumulates named phases."""

    def __init__(self):
        self._t0 = time.time()
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    def lap(self, name: str) -> float:
        now = time.time()
        dt = now - self._t0
        self._t0 = now
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        return dt

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": self.totals[k],
                "count": self.counts[k],
                "mean_s": self.totals[k] / self.counts[k],
            }
            for k in self.totals
        }
