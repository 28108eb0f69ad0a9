"""Command-line entry — the process-level equivalent of
``semantic_graph_SLAM_node.cpp`` + the launch profiles.

  python -m semantic_slam_tpu.cli synth --out lab.npz --steps 720
  python -m semantic_slam_tpu.cli run --log lab.npz --profile bucket_detector_workspace --out results/

``run`` replays the log through the engine on a simulated 30 Hz tick grid,
then performs the shutdown work the reference does (computeATE TUM dumps,
saveGraph) plus the in-process evaluation and viz exports the reference
lacks.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def cmd_synth(args) -> None:
    from semantic_slam_tpu.io import replay as replay_mod
    from semantic_slam_tpu.io import synthetic as synth_mod

    import math

    log = synth_mod.make_synthetic_log(
        seed=args.seed,
        n_steps=args.steps,
        sensor_every=args.sensor_every,
        drift_noise=args.drift,
        loops=args.loops,
        H=args.height,
        W=args.width,
        cam_pitch=math.radians(args.cam_pitch_deg),
        scene=args.scene,
    )
    if args.depth:
        from semantic_slam_tpu.io.synthetic import clouds_to_depth

        log = clouds_to_depth(log)
        if args.out.endswith(".slog"):
            sys.exit(
                "--depth with a .slog output is not supported: the SLOG "
                "binary schema carries XYZ clouds only (native/slamlog.cpp); "
                "use an .npz log for depth sessions"
            )
    if args.out.endswith(".slog"):
        from semantic_slam_tpu import native

        native.write_slog(args.out, log, height=args.height, width=args.width)
    elif args.out.endswith(".bag"):
        # reference-ready rosbag: play the synthetic scene into the ACTUAL
        # reference node (rosbag play) for A/B comparison
        from semantic_slam_tpu.io.rosbag_write import write_bag

        write_bag(args.out, log)
    else:
        replay_mod.save_log(args.out, log)
    print(
        f"wrote {args.out}: {len(log.odom)} odom / {len(log.clouds)} clouds / "
        f"{len(log.depths)} depths / {len(log.detections)} detections / "
        f"{len(log.gt)} gt"
    )


def cmd_run(args) -> None:
    from semantic_slam_tpu.config import PROFILES
    from semantic_slam_tpu.eval import ate as ate_mod
    from semantic_slam_tpu.io import replay as replay_mod
    from semantic_slam_tpu.io import tum as tum_mod
    from semantic_slam_tpu.runtime.engine import SlamEngine

    if args.profile not in PROFILES:
        sys.exit(f"unknown profile {args.profile!r}; have {sorted(PROFILES)}")
    cfg = PROFILES[args.profile]
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.devices > 1:
        # multi-chip session: every optimize tick's solve runs sharded over
        # an N-device mesh (runtime/engine.py). On a CPU host, pair with
        # --cpu and XLA_FLAGS=--xla_force_host_platform_device_count=N.
        from semantic_slam_tpu.config import MeshConfig

        cfg = cfg.replace(mesh=MeshConfig(num_devices=args.devices))
    if args.compute_ate:
        cfg = cfg.replace(compute_txt_for_ate=True)
    if args.max_keyframes:
        from semantic_slam_tpu.config import CapacityConfig

        cfg = cfg.replace(
            capacity=CapacityConfig(
                max_keyframes=args.max_keyframes,
                max_landmarks=max(args.max_keyframes // 4, 16),
                max_odom_edges=args.max_keyframes,
                max_landmark_edges=args.max_keyframes * 4,
                max_detections_per_frame=cfg.capacity.max_detections_per_frame,
            )
        )
    if args.crop_size:
        import dataclasses

        cfg = cfg.replace(
            segmentation=dataclasses.replace(
                cfg.segmentation,
                crop_height=args.crop_size,
                crop_width=args.crop_size,
                num_hypotheses=min(cfg.segmentation.num_hypotheses, args.crop_size),
            )
        )
    import dataclasses

    if args.plane_landmarks:
        cfg = cfg.replace(use_plane_landmarks=True)
    if args.plane_gate:
        cfg = cfg.replace(
            association=dataclasses.replace(cfg.association, use_plane_gate=True)
        )
    solver_kw = {}
    if args.robust != "none":
        solver_kw["robust_kernel"] = args.robust
    if args.solver:
        solver_kw["linear_solver"] = args.solver
    if args.precond != "jacobi":
        solver_kw["pcg_precond"] = args.precond
    if args.optimize_every > 1:
        solver_kw["optimize_every_n_ticks"] = args.optimize_every
    if args.ingest_window > 1:
        solver_kw["ingest_window"] = args.ingest_window
    if args.fixed_lag > 0:
        solver_kw["fixed_lag_window"] = args.fixed_lag
    if solver_kw:
        cfg = cfg.replace(solver=dataclasses.replace(cfg.solver, **solver_kw))
    if args.adaptive_normals:
        cfg = cfg.replace(
            segmentation=dataclasses.replace(cfg.segmentation, adaptive_normals=True)
        )

    import contextlib

    trace_ctx = contextlib.nullcontext()
    if args.xla_trace:
        # kernel-level XLA trace of the whole replay (TensorBoard/xprof);
        # the reference's only profiling is a verbose wall-clock print
        from semantic_slam_tpu.utils.profiling import xla_trace

        trace_ctx = xla_trace(args.xla_trace)

    engine = SlamEngine(cfg)
    if args.resume:
        # continue a stopped/crashed session: full solver + association +
        # trajectory state restores, then this log's events keep ingesting
        # (the reference has no load path at all — SURVEY.md §5)
        from semantic_slam_tpu.io.checkpoint import load_checkpoint

        load_checkpoint(args.resume, engine)
    with trace_ctx:
        if args.log.endswith(".slog"):
            replay_mod.replay_slog(args.log, engine)
            gt_t, gt_p = replay_mod.slog_gt(args.log)

            class _GtOnly:
                gt = [replay_mod.GtEvent(float(t), p) for t, p in zip(gt_t, gt_p)]

            log = _GtOnly()
        elif args.log.endswith(".bag"):
            # recorded ROS session (rosbag v2.0) — the reference's native input
            from semantic_slam_tpu.io.rosbag import read_bag

            log = read_bag(args.log)
            replay_mod.replay(log, engine)
        else:
            log = replay_mod.load_log(args.log)
            replay_mod.replay(log, engine)
        if args.optimize_every > 1 or args.ingest_window > 1:
            engine.finalize()

    os.makedirs(args.out, exist_ok=True)

    # --- shutdown work (semantic_graph_SLAM_node.cpp:22-23) ---------------
    kf_t = np.array([k.stamp for k in engine.keyframes])
    kf_poses = engine.get_keyframe_poses()
    if cfg.compute_txt_for_ate or args.compute_ate:
        tum_mod.write_tum(os.path.join(args.out, "robot_pose.txt"), kf_t, kf_poses)
        vio_t = np.array([t for t, _ in engine.vio_traj])
        vio_p = np.stack([p for _, p in engine.vio_traj]) if engine.vio_traj else np.zeros((0, 7))
        tum_mod.write_tum(os.path.join(args.out, "vio_pose.txt"), vio_t, vio_p)
        if log.gt:
            gt_t = np.array([e.t for e in log.gt])
            gt_p = np.stack([e.pose7 for e in log.gt])
            tum_mod.write_tum(os.path.join(args.out, "gt_pose.txt"), gt_t, gt_p)

    if cfg.save_graph or args.save_graph:
        from semantic_slam_tpu.io.g2o_io import save_g2o

        pn = engine.plane_nodes if cfg.use_plane_landmarks else None
        save_g2o(os.path.join(args.out, "semantic_graph.g2o"), engine.graph, pn)

    if args.checkpoint:
        from semantic_slam_tpu.io.checkpoint import save_checkpoint

        save_checkpoint(os.path.join(args.out, "checkpoint.npz"), engine)

    if args.dump_keyframes:
        from semantic_slam_tpu.io.dump import dump_keyframes

        dump_keyframes(os.path.join(args.out, "keyframes"), engine)

    grid = None
    if args.voxel:
        import jax.numpy as jnp

        from semantic_slam_tpu.core import geometry as geo
        from semantic_slam_tpu.mapping import voxel as vox

        import jax

        from semantic_slam_tpu.frontend import depth as depth_mod

        backproject = jax.jit(depth_mod.backproject_depth)
        # chunked map: chunks materialize wherever the trajectory goes, so
        # KITTI-class sessions never silently fall off a fixed extent
        grid = vox.ChunkedVoxelMap(
            carve=args.carve, strict_frames=cfg.strict_reference_frames,
            dtype=engine.dtype,
        )
        for kf in engine.keyframes:
            if kf.cloud is None or kf.node_idx is None:
                continue
            if kf.depth_intr is not None:
                pts, valid = backproject(
                    jnp.asarray(kf.cloud[0]),
                    jnp.asarray(kf.depth_intr, engine.dtype),
                    jnp.asarray(kf.depth_scale, engine.dtype),
                )
            else:
                pts = jnp.asarray(kf.cloud[0], engine.dtype)
                valid = kf.cloud[1]
            est7 = engine.get_keyframe_pose(kf)  # archive-aware (fixed-lag)
            if est7 is None:
                continue
            xyzrpy = geo.pose_to_xyzrpy(jnp.asarray(est7, engine.dtype))
            grid.insert_keyframe_cloud(
                pts, valid, xyzrpy,
                jnp.asarray(cfg.camera_angle_rad, engine.dtype),
            )

    from semantic_slam_tpu.viz.markers import export_session

    voxel_centers = export_session(args.out, engine, grid)

    if args.viz_bag or args.viz_bag_detections:
        # the reference's live publisher surface, replayable in stock rviz
        from semantic_slam_tpu.viz.rviz_bag import write_viz_bag

        write_viz_bag(
            os.path.join(args.out, "viz.bag"), engine, grid,
            path_stride=max(1, len(engine.keyframes) // 64),
            voxel_centers=voxel_centers,
            detections=args.viz_bag_detections,
        )

    # --- in-process evaluation -------------------------------------------
    summary = {
        "profile": args.profile,
        "keyframes": len(engine.keyframes),
        "landmarks": int(engine.table.count),
        "edges": int(engine.graph.num_edges()),
        "optimize_calls": len([s for s in engine.stats_history if s["iterations"] > 0]),
        "mean_solve_ms": float(
            np.mean([s["solve_seconds"] for s in engine.stats_history]) * 1e3
        )
        if engine.stats_history
        else None,
    }
    if log.gt:
        gt_t = np.array([e.t for e in log.gt])
        gt_xyz = np.stack([e.pose7[:3] for e in log.gt])
        vio_t = np.array([t for t, _ in engine.vio_traj])
        vio_xyz = np.stack([p[:3] for _, p in engine.vio_traj])
        summary["ate_rmse_optimized"] = ate_mod.ate_rmse(kf_t, kf_poses[:, :3], gt_t, gt_xyz, align=False)
        summary["ate_rmse_vio"] = ate_mod.ate_rmse(vio_t, vio_xyz, gt_t, gt_xyz, align=False)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    # per-tick solver timeline (chi2 / iterations / solve seconds / graph
    # growth) — the structured form of the reference's verbose stdout
    # (graph_slam.cpp:202-216)
    with open(os.path.join(args.out, "stats.jsonl"), "w") as f:
        for s in engine.stats_history:
            f.write(json.dumps(s) + "\n")
    print(json.dumps(summary, indent=1))


def cmd_merge(args) -> None:
    """Merge N session checkpoints into one map + joint BA.

    Multi-session capability the reference lacks entirely (its state dies at
    shutdown, SURVEY.md §5 checkpoint/resume): sessions are engine
    checkpoints; landmarks cross-associate by class + plane type + merge
    radius; joint (optionally planar-patch) bundle adjustment ties the
    sessions into one frame."""
    from semantic_slam_tpu.config import PROFILES
    from semantic_slam_tpu.io.checkpoint import load_checkpoint
    from semantic_slam_tpu.io.g2o_io import save_g2o
    from semantic_slam_tpu.io import tum as tum_mod
    from semantic_slam_tpu.runtime import multisession as ms
    from semantic_slam_tpu.runtime.engine import SlamEngine

    if args.profile not in PROFILES:
        sys.exit(f"unknown profile {args.profile!r}; have {sorted(PROFILES)}")
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    cfg = PROFILES[args.profile]
    if args.plane_landmarks:
        cfg = cfg.replace(use_plane_landmarks=True)

    engines = []
    for path in args.checkpoints:
        eng = SlamEngine(cfg)
        load_checkpoint(path, eng)
        engines.append(eng)
    graphs = [e.graph for e in engines]
    tables = [e.table for e in engines]

    if cfg.use_plane_landmarks:
        merged, pn, owner = ms.merge_graphs_planes(
            graphs, tables, [e.plane_nodes for e in engines],
            merge_radius=args.merge_radius,
        )
        g, pn, stats = ms.joint_bundle_adjust_planes(
            merged, pn, max_iterations=args.max_iterations
        )
    else:
        merged, owner = ms.merge_graphs(
            graphs, tables, merge_radius=args.merge_radius
        )
        g, stats = ms.joint_bundle_adjust(
            merged, max_iterations=args.max_iterations
        )
        pn = None

    os.makedirs(args.out, exist_ok=True)
    n_act = int(g.num_poses)
    tum_mod.write_tum(
        os.path.join(args.out, "merged_pose.txt"),
        np.arange(n_act, dtype=np.float64),
        np.asarray(g.poses[:n_act], np.float64),
    )
    save_g2o(os.path.join(args.out, "merged_graph.g2o"), g, pn)
    summary = {
        "sessions": len(engines),
        "poses": n_act,
        "landmarks": int(g.num_landmarks),
        "edges": int(g.num_edges()) + (int(pn.num_pe) if pn is not None else 0),
        "landmarks_per_session": [int(e.table.count) for e in engines],
        "chi2_initial": float(stats.chi2_initial),
        "chi2_final": float(stats.chi2_final),
        "lm_iterations": int(stats.iterations),
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


def cmd_baginfo(args) -> None:
    """Topic/type/count summary of a recorded ROS bag (rosbag-info analog)."""
    from semantic_slam_tpu.io.rosbag import DEFAULT_TOPIC_MAP, bag_info

    info = bag_info(args.bag)
    width = max((len(t) for t in info), default=0)
    for topic in sorted(info):
        msg_type, count = info[topic]
        route = DEFAULT_TOPIC_MAP.get(topic)
        used = f" -> {route[0]}" + (f" ({route[1]})" if route and route[1] else "") if route else ""
        print(f"{topic:<{width}}  {count:>7} msgs  {msg_type}{used}")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="semantic_slam_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("synth", help="generate a synthetic replay log")
    ps.add_argument(
        "--out", required=True,
        help=".npz / .slog replay log, or .bag (reference-ready rosbag 2.0 "
        "on the reference node's subscription topics)",
    )
    ps.add_argument("--steps", type=int, default=720)
    ps.add_argument("--seed", type=int, default=0)
    ps.add_argument("--sensor-every", type=int, default=3)
    ps.add_argument("--drift", type=float, default=0.006)
    ps.add_argument("--loops", type=float, default=2.0)
    ps.add_argument("--height", type=int, default=240)
    ps.add_argument("--width", type=int, default=320)
    ps.add_argument(
        "--scene", choices=["lab", "kitti", "dense_indoor", "corridor"],
        default="lab",
        help="simulated environment (lab loop / KITTI car corridor / "
        "dense indoor / chair+tvmonitor+keyboard hallway)",
    )
    ps.add_argument(
        "--cam-pitch-deg", type=float, default=0.0,
        help="camera pitch of the simulated rig; match the profile's camera_angle",
    )
    ps.add_argument(
        "--depth", action="store_true",
        help="store u16 depth frames + intrinsics instead of XYZ clouds "
        "(6x smaller logs; backprojection runs on-device at replay)",
    )
    ps.set_defaults(fn=cmd_synth)

    pr = sub.add_parser(
        "run", help="replay a log (.npz / .slog / ROS .bag) through the SLAM engine"
    )
    pr.add_argument("--log", required=True)
    pr.add_argument("--profile", default="yolo_detector")
    pr.add_argument("--out", default="results")
    pr.add_argument("--save-graph", action="store_true")
    pr.add_argument("--checkpoint", action="store_true")
    pr.add_argument(
        "--dump-keyframes", action="store_true",
        help="per-keyframe text dumps in the KeyFrame::dump format "
        "(keyframe.cpp:22-40; the reference declares but never calls it)",
    )
    pr.add_argument(
        "--resume", default="",
        help="engine checkpoint .npz to restore before replaying (continue "
        "a stopped/crashed session; pair with --checkpoint/autosave)",
    )
    pr.add_argument(
        "--xla-trace", default="",
        help="directory for a kernel-level XLA profiler trace of the replay "
        "(view with TensorBoard/xprof)",
    )
    pr.add_argument("--voxel", action="store_true")
    pr.add_argument(
        "--viz-bag", action="store_true",
        help="also write <out>/viz.bag: the reference's publisher surface "
        "(paths, PoseArray, landmark MarkerArray, map->odom /tf, occupancy "
        "CUBE_LIST) for rosbag play + stock rviz",
    )
    pr.add_argument(
        "--viz-bag-detections", action="store_true",
        help="include the per-frame /detected_landmarks MarkerArray stream "
        "in viz.bag (publishDetectedLandmarks); detections are recomputed "
        "post-hoc from stored clouds — one device program per detection "
        "keyframe here, zero cost on the live path (implies --viz-bag)",
    )
    pr.add_argument("--compute-ate", action="store_true")
    pr.add_argument("--cpu", action="store_true", help="force the CPU backend")
    pr.add_argument(
        "--devices", type=int, default=1,
        help="run every optimize tick's solve sharded over an N-device "
        "mesh (multi-chip product path; 1 = single-chip). Forces the pcg "
        "solver. For CPU testing combine with --cpu and "
        "XLA_FLAGS=--xla_force_host_platform_device_count=N",
    )
    pr.add_argument(
        "--max-keyframes", type=int, default=0,
        help="override graph capacity (0 = profile default; growth still doubles on demand)",
    )
    pr.add_argument(
        "--crop-size", type=int, default=0,
        help="override the bbox resample grid (0 = profile default)",
    )
    pr.add_argument(
        "--plane-landmarks", action="store_true",
        help="planar-patch landmark mode (centroid + plane orientation/offset)",
    )
    pr.add_argument(
        "--plane-gate", action="store_true",
        help="plane-aware association gate (normal angle + offset)",
    )
    pr.add_argument(
        "--robust", choices=["none", "huber", "dcs"], default="none",
        help="robust kernel on observation/plane edges",
    )
    pr.add_argument(
        "--solver", choices=["", "dense", "pcg"], default="",
        help="override the linear solver (empty = profile default)",
    )
    pr.add_argument(
        "--precond", choices=["jacobi", "tridiag"], default="jacobi",
        help="PCG preconditioner (tridiag = odometry-chain block "
        "tridiagonal via parallel cyclic reduction)",
    )
    pr.add_argument(
        "--optimize-every", type=int, default=1,
        help="run the LM solve every Nth tick (1 = reference every-tick); "
        "a finalize pass always runs at the end",
    )
    pr.add_argument(
        "--ingest-window", type=int, default=1,
        help="pool W keyframes and ingest them as ONE scan device program "
        "(+ one solve per window) — offline-throughput mode; association "
        "stays sequential inside the window. 1 = reference per-tick drain. "
        "W larger than the per-tick ingest cap wins over it (whole window "
        "flushes in one program)",
    )
    pr.add_argument(
        "--fixed-lag", type=int, default=0,
        help="fixed-lag smoothing window: marginalize keyframes beyond the "
        "last N into a prior (0 = reference full-history behavior)",
    )
    pr.add_argument(
        "--adaptive-normals", action="store_true",
        help="PCL-faithful adaptive normal windows near depth discontinuities",
    )
    pr.add_argument(
        "--carve", action="store_true",
        help="with --voxel: octomap-style free-space carving + log-odds",
    )
    pr.set_defaults(fn=cmd_run)

    pm = sub.add_parser(
        "merge", help="merge session checkpoints into one map + joint BA"
    )
    pm.add_argument("checkpoints", nargs="+", help="engine checkpoint .npz files")
    pm.add_argument("--out", required=True)
    pm.add_argument("--profile", default="bucket_detector_workspace")
    pm.add_argument("--merge-radius", type=float, default=1.0)
    pm.add_argument("--max-iterations", type=int, default=64)
    pm.add_argument("--plane-landmarks", action="store_true")
    pm.add_argument("--cpu", action="store_true")
    pm.set_defaults(fn=cmd_merge)

    pb = sub.add_parser(
        "baginfo", help="list topics/types/counts of a recorded ROS bag"
    )
    pb.add_argument("bag", help="rosbag v2.0 file")
    pb.set_defaults(fn=cmd_baginfo)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
