#!/usr/bin/env python
"""Multi-device scaling of the distributed Schur-complement BA.

Measures solve wall time of ``sharded_lm_optimize`` at mesh sizes 1/2/4/8.
On this rig only one physical TPU chip is reachable, so the scaling curve is
taken on the virtual host-CPU mesh (the same code path that runs over ICI on
a real slice — shard_map + one psum per iteration); the absolute single-chip
TPU number comes from ../bench.py.

Usage: python benchmarks/scaling_bench.py [--k 512] [--e2 2048] [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--l", type=int, default=128)
    ap.add_argument("--e2", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--solver", choices=["dense", "pcg"], default="pcg")
    ap.add_argument("--cg-iters", type=int, default=64)
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    n_max = max(args.devices)
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_max}"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from __graft_entry__ import _build_graph
    from semantic_slam_tpu.parallel import sharded as sh
    from semantic_slam_tpu.solver import pcg as pcg_mod

    g = _build_graph(K=args.k, L=args.l, E2=args.e2, dtype=jnp.float32, noise=0.05)

    def run_solver(gshard, mesh):
        if args.solver == "pcg":
            return pcg_mod.sharded_lm_optimize_pcg(
                gshard, mesh, max_iterations=args.iters, rel_tol=0.0,
                max_cg_iters=args.cg_iters,
            )
        return sh.sharded_lm_optimize(gshard, mesh, max_iterations=args.iters, rel_tol=0.0)

    results = {}
    base = None
    for n in args.devices:
        mesh = sh.make_mesh(n)
        gshard = sh.shard_graph_edges(g, mesh)
        out, stats = run_solver(gshard, mesh)
        jax.block_until_ready(out.poses)  # compile+warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out, stats = run_solver(gshard, mesh)
            jax.block_until_ready(out.poses)
            times.append(time.perf_counter() - t0)
        ms = min(times) * 1e3 / args.iters
        if base is None:
            base = ms
        results[n] = {
            "ms_per_iter": round(ms, 3),
            "speedup": round(base / ms, 3),
            "efficiency": round(base / ms / n, 3),
        }
        print(f"devices={n}: {ms:.2f} ms/iter  speedup {base/ms:.2f}x "
              f"efficiency {base/ms/n:.2f}", file=sys.stderr)
    print(json.dumps({"mesh_scaling": results, "solver": args.solver, "k": args.k, "e2": args.e2}))


if __name__ == "__main__":
    main()
