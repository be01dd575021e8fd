"""Phase timers and profiler trace helpers."""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

import jax

__all__ = ["PhaseTimer", "trace_to"]


class PhaseTimer:
    """Accumulates wall-clock per named phase (setup / assemble / solve /
    output ...); the structured replacement for the reference's external
    ``date +%s.%N`` timing (run_sim_steady.sh:20-27)."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {"seconds": self.totals[name], "calls": self.counts[name]}
            for name in sorted(self.totals)
        }

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


@contextlib.contextmanager
def trace_to(logdir: str):
    """Capture a ``jax.profiler`` trace (viewable in TensorBoard/Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
