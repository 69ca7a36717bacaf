"""Per-stage timing + JAX profiler glue.

Replaces the reference's homemade Timer (src/tracker/tracking_utils.py:5-46,
tick/tock/stash/report) and adds first-class jax.profiler trace capture —
the reference has no device tracing at all (SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """tick/tock accumulator with per-stage means, device-sync aware."""

    def __init__(self, sync: bool = False):
        self.sync = sync
        self._start: dict[str, float] = {}
        self._acc: dict[str, list] = defaultdict(list)

    def tick(self, name: str) -> None:
        if self.sync:
            # Drain pending device work so the stage boundary is real.
            jax.effects_barrier()
        self._start[name] = time.perf_counter()

    def tock(self, name: str) -> None:
        if self.sync:
            jax.effects_barrier()
        self._acc[name].append(time.perf_counter() - self._start[name])

    @contextlib.contextmanager
    def stage(self, name: str):
        self.tick(name)
        try:
            yield
        finally:
            self.tock(name)

    def report(self, reset: bool = False) -> dict:
        out = {}
        for name, v in self._acc.items():
            s = sorted(v)
            out[name] = {
                "mean_ms": 1000 * sum(v) / len(v),
                # Steady state: the mean is polluted by first-call jit
                # compiles (tens of seconds on a remote backend).
                "p50_ms": 1000 * s[len(s) // 2],
                "total_ms": 1000 * sum(v),
                "count": len(v),
            }
        if reset:
            self._acc.clear()
        return out

    def pretty(self) -> str:
        return " | ".join(
            f"{k}: {v['mean_ms']:.2f}ms x{v['count']}"
            for k, v in self.report().items()
        )


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
