"""Large-graph single-chip solver point: K=4096 keyframes, ~16k edges.

The headline bench (bench.py) runs at K=512 where 2.9 ms/iter is
latency-bound (small matmuls, low MXU utilization). This measures the same
solver at KITTI-scale graph sizes to put the MXU headroom on record
(VERDICT r1 task 4): ms/iter should grow far slower than the 8x problem
size. PCG path only — the dense Schur path's reduced camera system at
K=4096 is a 24576^2 f32 Cholesky (2.4 GB), which is exactly what the
matrix-free path exists to avoid.

Protocol follows bench.py (CLAUDE.md): the TPU tunnel memoizes identical
(program, args) executions, so every timed call uses a DISTINCT graph
(fresh seed), and the result is the min over repeats.

Usage: python benchmarks/large_graph_bench.py [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    # (K, L, E2, cg_iters, lm_iters, repeats)
    (512, 128, 2048, 32, 8, 3),
    (2048, 512, 8192, 32, 8, 3),
    (4096, 1024, 16384, 32, 8, 3),
]

# The tunnel memo persists ACROSS PROCESSES (CLAUDE.md): graphs built from
# seeds any earlier bench already executed return instantly and fake the
# timing. Derive seeds from the wall clock so every run is fresh.
SEED_BASE = int(time.time()) % 1_000_000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from semantic_slam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from __graft_entry__ import _build_graph
    from semantic_slam_tpu.solver import pcg as pcg_mod

    dev = jax.devices()[0].device_kind
    results = {}
    for K, L, E2, cg, iters, repeats in CONFIGS:
        graphs = [
            _build_graph(
                K=K, L=L, E2=E2, dtype=jnp.float32, noise=0.05,
                seed=SEED_BASE + 7 * K + s,
            )
            for s in range(repeats + 1)
        ]

        def solve(g):
            return pcg_mod.lm_optimize_pcg(
                g, max_iterations=iters, rel_tol=0.0, max_cg_iters=cg
            )

        out, stats = solve(graphs[0])  # compile + warmup
        jax.block_until_ready(out.poses)
        times = []
        for g in graphs[1:]:
            t0 = time.perf_counter()
            out, stats = solve(g)
            jax.block_until_ready(out.poses)
            times.append(time.perf_counter() - t0)
        ms = min(times) * 1e3 / iters
        results[f"K{K}"] = {
            "K": K, "L": L, "edges": K - 1 + E2, "cg_iters": cg,
            "ms_per_iter": round(ms, 3),
            "chi2_initial": float(stats.chi2_initial),
            "chi2_final": float(stats.chi2_final),
        }
        print(
            f"[large] K={K} L={L} E~{K-1+E2}: {ms:.2f} ms/iter "
            f"(chi2 {float(stats.chi2_initial):.3g} -> "
            f"{float(stats.chi2_final):.3g}) on {dev}",
            file=sys.stderr, flush=True,
        )

    if args.json:
        print(json.dumps(results, indent=1))
    k512 = results["K512"]["ms_per_iter"]
    k4096 = results["K4096"]["ms_per_iter"]
    print(
        f"[large] 8x problem size costs {k4096 / k512:.2f}x time "
        f"(latency-bound at K=512 -> MXU headroom)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
