"""Tracing / profiling utilities (auxiliary subsystem, SURVEY.md §5.1).

The reference's only perf surface is wall-clock epoch timing
(`n_best_asr_bert.py:403-424`).  TPU equivalents provided here:

- ``trace(logdir)``: context manager around `jax.profiler` — produces a
  TensorBoard/XProf trace of the jitted steps.
- ``StepTimer``: lightweight per-step wall-time stats with
  ``block_until_ready`` fencing, for quick interactive measurements
  without a full trace.
- ``annotate(name)``: TraceAnnotation wrapper so host-side phases (pack,
  decode, dumps) show up in the same timeline.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    import jax

    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


@dataclass
class StepTimer:
    """Collects fenced per-step wall times.

    >>> timer = StepTimer()
    >>> with timer.step():
    ...     state, stats = train_step(...)
    ...     jax.block_until_ready(stats)
    >>> timer.summary()
    """

    times: List[float] = field(default_factory=list)
    warmup: int = 2

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    def summary(self) -> dict:
        import numpy as np

        t = np.asarray(self.times[self.warmup:] or self.times)
        return {
            "steps": len(t),
            "mean_s": float(t.mean()) if t.size else 0.0,
            "p50_s": float(np.percentile(t, 50)) if t.size else 0.0,
            "p95_s": float(np.percentile(t, 95)) if t.size else 0.0,
            "total_s": float(t.sum()),
        }
