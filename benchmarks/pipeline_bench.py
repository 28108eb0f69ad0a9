#!/usr/bin/env python
"""End-to-end pipeline throughput: keyframes/s per chip (BASELINE.md).

Replays a synthetic session at full 640x480 resolution through the complete
engine (frontend + association + graph + solver) and reports keyframes/s
plus a per-stage time breakdown. Not the driver bench (that's ../bench.py);
this is the engineering view for finding bottlenecks.

Usage: python benchmarks/pipeline_bench.py [--steps N] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--profile", default="bucket_detector_workspace")
    ap.add_argument("--optimize-every", type=int, default=1)
    ap.add_argument("--warm-start", action="store_true")
    ap.add_argument("--solver", choices=["", "dense", "pcg"], default="")
    ap.add_argument(
        "--fixed-lag", type=int, default=0,
        help="fixed-lag window (0 = reference full-history); bounds per-tick "
        "solve cost on long sessions",
    )
    ap.add_argument(
        "--plane-landmarks", action="store_true",
        help="planar-patch landmark mode (joint pose+point+plane BA)",
    )
    ap.add_argument(
        "--ingest-window", type=int, default=1,
        help="pool W keyframes per scan-ingest device program (offline "
        "throughput mode; one solve per window)",
    )
    ap.add_argument(
        "--depth", action="store_true",
        help="u16 depth frames + on-device backprojection instead of XYZ "
        "clouds (6x smaller host->device transfers — the binding constraint "
        "through the remote tunnel)",
    )
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from semantic_slam_tpu.config import PROFILES
    from semantic_slam_tpu.io import replay as replay_mod
    from semantic_slam_tpu.io import synthetic as synth_mod
    from semantic_slam_tpu.runtime.engine import SlamEngine
    from semantic_slam_tpu.utils.profiling import Metrics

    cfg = PROFILES[args.profile].replace(camera_angle_deg=0.0)
    import dataclasses

    solver_kw = {}
    if args.optimize_every > 1:
        solver_kw["optimize_every_n_ticks"] = args.optimize_every
    if args.warm_start:
        solver_kw["warm_start_lambda"] = True
    if args.solver:
        solver_kw["linear_solver"] = args.solver
    if args.fixed_lag > 0:
        solver_kw["fixed_lag_window"] = args.fixed_lag
    if args.ingest_window > 1:
        solver_kw["ingest_window"] = args.ingest_window
    if solver_kw:
        cfg = cfg.replace(solver=dataclasses.replace(cfg.solver, **solver_kw))
    if args.plane_landmarks:
        cfg = cfg.replace(use_plane_landmarks=True)

    print(f"generating {args.steps}-step session at {args.width}x{args.height}...")
    log = synth_mod.make_synthetic_log(
        seed=1, n_steps=args.steps, sensor_every=3, drift_noise=0.006,
        loops=max(args.steps / 240, 1.0), H=args.height, W=args.width,
    )
    if args.depth:
        log = synth_mod.clouds_to_depth(log)

    engine = SlamEngine(cfg)
    m = Metrics()
    # NOTE: with the fused single-keyframe tick, frontend+assoc+solve all run
    # in one device program; "solve_seconds" in stats_history is the whole
    # tick. The split instrumentation only fires on multi-keyframe batches.
    orig_proc = engine._process_keyframe_with_detections

    def proc(kf, prev_odom, has_prev):
        with m.scope("frontend+assoc(batch path)"):
            orig_proc(kf, prev_odom, has_prev)

    engine._process_keyframe_with_detections = proc

    # warmup compile: feed a few events first
    t0 = time.perf_counter()
    replay_mod.replay(log, engine)
    if args.optimize_every > 1 or args.ingest_window > 1:
        engine.finalize()
    wall = time.perf_counter() - t0

    n_kf = len(engine.keyframes)
    solve_s = sum(s["solve_seconds"] for s in engine.stats_history)
    opt_calls = len(engine.stats_history)
    iters = sum(s["iterations"] for s in engine.stats_history)
    summary = {
        "device": str(jax.devices()[0]),
        "keyframes": n_kf,
        "landmarks": int(engine.table.count),
        "edges": int(engine.graph.num_edges()),
        "wall_s": round(wall, 3),
        "keyframes_per_s": round(n_kf / wall, 3),
        "solve_total_s": round(solve_s, 3),
        "solve_calls": opt_calls,
        "lm_iters_total": iters,
        "frontend_assoc_batch_path": m.summary().get("frontend+assoc(batch path)"),
        "tick_total_s_includes_frontend": True,
        "other_s": round(
            wall - solve_s - m.totals.get("frontend+assoc(batch path)", 0.0), 3
        ),
        # per-tick solve time at session start vs end: full-history grows,
        # fixed-lag stays flat
        "solve_ms_first10": round(
            1e3 * float(np.mean([s["solve_seconds"] for s in engine.stats_history[1:11]])), 2
        ) if len(engine.stats_history) > 11 else None,
        "solve_ms_last10": round(
            1e3 * float(np.mean([s["solve_seconds"] for s in engine.stats_history[-10:]])), 2
        ) if len(engine.stats_history) > 11 else None,
        "active_poses": int(engine.graph.num_poses),
        "marginalized": engine._kf_base,
    }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
