"""Per-stage timing and profiling.

The reference ships a ``TicToc`` wall-clock timer whose call sites are almost
all commented out (``include/tictoc.h:12-47``, SURVEY §5). Here timing is a
first-class, always-on facility: named accumulating timers with streaming
stats, a context manager/decorator API, and optional ``jax.profiler`` trace
capture for device-level analysis.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class StageStats:
    count: int = 0
    total_s: float = 0.0
    min_s: float = float("inf")
    max_s: float = 0.0

    def add(self, dt: float):
        self.count += 1
        self.total_s += dt
        self.min_s = min(self.min_s, dt)
        self.max_s = max(self.max_s, dt)

    @property
    def mean_s(self) -> float:
        return self.total_s / max(self.count, 1)


class Timers:
    """Named accumulating wall-clock timers (thread-compatible usage:

    one Timers per pipeline/thread)."""

    def __init__(self):
        self.stages: dict[str, StageStats] = defaultdict(StageStats)

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name].add(time.perf_counter() - t0)

    def record(self, name: str, dt: float):
        self.stages[name].add(dt)

    def report(self) -> dict[str, dict]:
        return {
            k: {
                "count": v.count,
                "total_s": round(v.total_s, 4),
                "mean_ms": round(v.mean_s * 1e3, 3),
                "min_ms": round(v.min_s * 1e3, 3),
                "max_ms": round(v.max_s * 1e3, 3),
            }
            for k, v in sorted(self.stages.items())
        }

    def pretty(self) -> str:
        lines = [f"{'stage':<28}{'count':>7}{'mean ms':>10}{'total s':>10}"]
        for k, v in sorted(self.stages.items()):
            lines.append(
                f"{k:<28}{v.count:>7}{v.mean_s * 1e3:>10.2f}{v.total_s:>10.2f}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
