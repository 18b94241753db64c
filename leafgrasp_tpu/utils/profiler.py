"""Per-stage timing + JAX profiler hooks.

The reference's only telemetry is GPU-memory log lines
(gpu_manager.py:14,32-34); here every pipeline stage gets wall-clock
stats and an optional on-demand XLA trace (SURVEY.md 5.1).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

__all__ = ["StageTimer", "trace_to"]


class StageTimer:
    """Accumulates per-stage wall-clock stats."""

    def __init__(self):
        self._sums: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)
        self._maxes: Dict[str, float] = defaultdict(float)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._sums[name] += dt
            self._counts[name] += 1
            self._maxes[name] = max(self._maxes[name], dt)

    def record(self, name: str, seconds: float):
        self._sums[name] += seconds
        self._counts[name] += 1
        self._maxes[name] = max(self._maxes[name], seconds)

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "mean_ms": 1e3 * self._sums[name] / max(self._counts[name],
                                                        1),
                "max_ms": 1e3 * self._maxes[name],
                "count": self._counts[name],
                "total_s": self._sums[name],
            }
            for name in self._sums
        }

    def report(self) -> str:
        lines = [f"{'stage':24s} {'mean ms':>9s} {'max ms':>9s} {'n':>6s}"]
        for name, s in sorted(self.summary().items()):
            lines.append(f"{name:24s} {s['mean_ms']:9.2f} "
                         f"{s['max_ms']:9.2f} {s['count']:6d}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace_to(log_dir: Optional[str]):
    """Wrap a block in a jax profiler trace when log_dir is given."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
