"""Profiling and throughput metering.

The reference has no instrumentation at all (SURVEY.md section 5): its only
progress output is an MSA progress bar (msa/msa.c:134-138).  Here:

* ``Phase`` -- wall-clock phase timers with a structured report;
* ``gcups`` -- the north-star metric (billions of DP cells per second);
* ``trace`` -- context manager around ``jax.profiler`` for device traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


class Phase:
    """Accumulating named wall-clock timers."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> List[dict]:
        return [{"phase": k, "total_s": round(v, 4),
                 "calls": self.counts[k]}
                for k, v in sorted(self.totals.items(),
                                   key=lambda kv: -kv[1])]


def gcups(cells: int, seconds: float) -> float:
    """Billions of DP cell updates per second."""
    return cells / seconds / 1e9 if seconds > 0 else float("inf")


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto)."""
    import jax

    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
