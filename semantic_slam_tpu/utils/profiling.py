"""Observability: timers, counters, and JAX profiler integration.

The reference's only tracing is a wall-clock + chi2 print per optimize pass
when verbose (``graph_slam.cpp:202-216``). Those counters are first-class
here (``SlamEngine.stats_history`` keeps chi2 before/after, iterations, and
solve seconds per tick); this module adds structured timing scopes and an
easy XLA trace capture for kernel-level profiling on TPU.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict


class Metrics:
    """Lightweight accumulating timers/counters (host-side)."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def scope(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def count(self, name: str, n: int = 1) -> None:
        self.counts[name] += n

    def summary(self) -> dict:
        return {
            k: {
                "total_s": self.totals[k],
                "count": self.counts[k],
                "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1),
            }
            for k in sorted(set(self.totals) | set(self.counts))
        }

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=1)


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture a JAX/XLA profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def log_optimize(verbose: bool, stats, solve_seconds: float, num_nodes: int, num_edges: int) -> None:
    """The reference's verbose optimize print (graph_slam.cpp:188-216)."""
    if not verbose or int(stats.iterations) == 0:
        return
    print(
        "--- pose graph optimization ---\n"
        f"nodes: {num_nodes}   edges: {num_edges}\n"
        f"iterations: {int(stats.iterations)}\n"
        f"chi2: (before){float(stats.chi2_initial):.6g} -> "
        f"(after){float(stats.chi2_final):.6g}\n"
        f"time: {solve_seconds:.3f}[sec]"
    )
