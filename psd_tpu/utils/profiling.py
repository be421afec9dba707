"""Profiling/tracing utilities (SURVEY.md §5 "tracing: none in-repo" —
the TPU build adds first-class jax.profiler traces + phase timers).

Usage:
    with trace_if("/tmp/tb", enabled=args.profile):
        run_epoch(...)

    timer = PhaseTimer()
    with timer.phase("unet"):
        ...
    print(timer.report())
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


@contextlib.contextmanager
def trace_if(log_dir: str, enabled: bool = True) -> Iterator[None]:
    """jax.profiler trace scope (TensorBoard-compatible)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for device timelines."""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Wall-clock phase accumulator with host sync at phase end."""

    def __init__(self, sync: bool = True):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.sync = sync

    @contextlib.contextmanager
    def phase(self, name: str, sync_value=None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if self.sync and sync_value is not None:
            # forcing a tiny host readback is the only reliable sync through
            # the axon relay (block_until_ready returns early there)
            import numpy as np

            np.asarray(jax.tree_util.tree_leaves(sync_value)[0])[...]
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            n, tot = self.counts[name], self.totals[name]
            lines.append(f"{name}: {tot:.3f}s total, {tot / n * 1e3:.1f}ms avg ×{n}")
        return "\n".join(lines)
