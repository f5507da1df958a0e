"""Profiling hooks: per-phase wall timers and optional jax.profiler traces.

The reference has no profiling at all (SURVEY.md §5); these are first-class
here. `PhaseTimer` forces materialization before reading the clock — on some
PJRT backends `block_until_ready` returns before the computation drains, so
timing must anchor on a host transfer.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax
import numpy as np


def materialize(tree):
    """Force device->host transfer of every leaf (true synchronization)."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class PhaseTimer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, result_ref: list | None = None):
        t0 = time.perf_counter()
        yield
        if result_ref:
            materialize(result_ref[0])
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(
                f"{name:<28s} total {tot:8.3f}s  calls {n:5d}  "
                f"avg {tot / n * 1000:8.2f}ms"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def maybe_profile(profile_dir: str | None):
    """jax.profiler trace context when `profile_dir` is set; no-op otherwise."""
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            yield
    else:
        yield
