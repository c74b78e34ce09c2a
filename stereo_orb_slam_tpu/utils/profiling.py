"""Per-stage wall-clock timers + optional jax.profiler traces.

The reference's only instrumentation is a per-frame elapsed-ms print
(ref src/slam.cpp:136-138); here every pipeline stage accumulates into a
registry that apps dump at exit, and `trace()` wraps a region in a
jax.profiler trace for XProf/Perfetto inspection on TPU.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimers:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def reset(self):
        """Zero all accumulators (bench harnesses call this at the warm-up /
        timed boundary so compile time never pollutes the per-frame split)."""
        self.totals.clear()
        self.counts.clear()

    def summary(self) -> dict:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1e3 * self.totals[name] / max(self.counts[name], 1),
            }
            for name in sorted(self.totals)
        }

    def report(self) -> str:
        lines = []
        for name, s in self.summary().items():
            lines.append(
                f"{name:<24s} {s['count']:>6d} calls  "
                f"{s['mean_ms']:>9.2f} ms/call  {s['total_s']:>8.2f} s total"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(name: str, enabled: bool = False):
    """jax.profiler region annotation (no-op unless enabled)."""
    if not enabled:
        yield
        return
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield
