"""Profiling hooks: per-stage wall timing + jax.profiler traces.

Replaces the reference's commented-out chrono prints (Time.h:11-38,
spline_update_step.cpp:126-240) with a real instrument: block_until_ready
harnesses and XLA profiler traces (SURVEY.md §5 tracing row).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List

import jax


class StageTimer:
    """Accumulates wall time per named stage with device synchronization."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(
                f"{name:32s} total {tot * 1e3:9.2f} ms  "
                f"calls {n:5d}  mean {tot / n * 1e3:8.3f} ms"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """XLA profiler trace context; view with tensorboard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
