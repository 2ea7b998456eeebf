"""Per-stage timing + device profiling.

The reference had no tracing at all (SURVEY.md §5.1 — pacing sleeps and
print statements).  Here: a lightweight accumulating stage timer for the
host loops, and a ``jax.profiler`` trace context for device timelines.

Timing gotcha this module encodes: on remote/tunneled backends,
``block_until_ready`` can return before true completion — ``StageTimer``
optionally forces a tiny host fetch of a representative output to get
honest wall times.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any

import numpy as np


def force_completion(x: Any) -> None:
    """Fetch one scalar from (the first leaf of) a pytree, forcing the whole
    dependency chain to really finish."""
    import jax

    leaves = jax.tree.leaves(x)
    if leaves:
        np.asarray(leaves[0]).ravel()[:1]


class StageTimer:
    """Accumulates wall time per named stage across loop iterations.

    >>> timer = StageTimer()
    >>> with timer("forward", result=out):  # fetches to force completion
    ...     out = model(x)
    >>> print(timer.report())
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        # first call per stage — on jitted stages this is dominated by XLA
        # compilation, so the report separates it from the steady state
        # (a 4-call loop otherwise reports compile time as "ms/call")
        self.firsts: dict[str, float] = {}

    @contextlib.contextmanager
    def __call__(self, stage: str, result: Any = None):
        t0 = time.perf_counter()
        box = {}
        try:
            yield box
        finally:
            target = box.get("result", result)
            if self.sync and target is not None:
                force_completion(target)
            dt = time.perf_counter() - t0
            if stage not in self.firsts:
                self.firsts[stage] = dt
            self.totals[stage] += dt
            self.counts[stage] += 1

    def steady_ms(self, stage: str) -> float:
        """Mean ms/call excluding the first (compile-bearing) call; falls
        back to the first call when the stage only ran once."""
        n = self.counts[stage]
        t = self.totals[stage]
        if n <= 1:
            return t * 1e3
        return (t - self.firsts[stage]) / (n - 1) * 1e3

    def report(self) -> str:
        if not self.totals:
            return "(no stages timed)"
        width = max(len(s) for s in self.totals)
        lines = []
        total = sum(self.totals.values())
        for stage, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[stage]
            lines.append(
                f"{stage:<{width}}  {t:8.3f}s total  {self.steady_ms(stage):8.1f} ms/call"
                f"  x{n:<5d} first {self.firsts[stage] * 1e3:8.1f} ms"
                f"  {100 * t / total:5.1f}%"
            )
        return "\n".join(lines)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()
        self.firsts.clear()


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/da3slam_trace"):
    """Capture a ``jax.profiler`` device trace (view with TensorBoard or
    Perfetto).  No-op fallback if the backend doesn't support profiling."""
    import jax

    try:
        with jax.profiler.trace(log_dir):
            yield log_dir
    except Exception as e:
        print(f"profiler unavailable ({e}); running without trace")
        yield None
