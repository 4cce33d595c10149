"""Per-pass timing + frame statistics.

The reference ships zero instrumentation (no timers, no FPS counter — SURVEY.md §5);
the only pacing is vsync.  Here: wall-clock pass timing via block_until_ready deltas
and an optional jax.profiler trace hook for XLA-level analysis.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


class PassProfiler:
    """Accumulates wall-time per named pass; `summary()` gives ms averages."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time_pass(self, name: str, *sync_arrays, inputs=()):
        """Times the enclosed block; pass device arrays to synchronize on exit so
        async dispatch doesn't hide the cost.

        Pass the block's device INPUTS via ``inputs=`` to drain previously
        dispatched async work before the timer starts — otherwise an earlier
        pass's device tail is billed to this one (CLAUDE.md's timing-validity
        rule)."""
        for a in inputs:
            jax.block_until_ready(a)
        t0 = time.perf_counter()
        yield
        for a in sync_arrays:
            jax.block_until_ready(a)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {
            name: 1e3 * self.totals[name] / max(1, self.counts[name])
            for name in self.totals
        }

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
