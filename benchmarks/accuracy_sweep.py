"""Accuracy sweep: ATE across all synthetic scenes x landmark modes.

Runs every synthetic scene (lab loop, KITTI-style corridor, dense indoor)
through the full engine in point-landmark mode (reference parity), planar-
patch mode, and patch+Huber, reporting ATE RMSE vs ground truth next to the
raw-VIO drift. CPU by default (deterministic; the TPU tunnel serializes one
client — see CLAUDE.md).

Usage:  python benchmarks/accuracy_sweep.py [--steps 360] [--json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from semantic_slam_tpu.config import (  # noqa: E402
    AssociationConfig,
    CapacityConfig,
    InformationConfig,
    KeyframeConfig,
    SegmentationConfig,
    SlamConfig,
    SolverConfig,
)
from semantic_slam_tpu.eval import ate as ate_mod  # noqa: E402
from semantic_slam_tpu.io import replay as replay_mod  # noqa: E402
from semantic_slam_tpu.io import synthetic as synth_mod  # noqa: E402
from semantic_slam_tpu.runtime.engine import SlamEngine  # noqa: E402

# kitti is an OPEN trajectory (no loop closure): landmark observations bound
# drift locally but full-batch re-optimization redistributes it, landing at
# an optimum FARTHER from ground truth than raw VIO. This is the problem's
# optimum, not a solver artifact: benchmarks/independent_solver_check.py
# re-optimizes the identical graph with scipy least_squares (independent
# parameterization, numerical Jacobians) from the reference initial values
# and lands at the SAME ATE and chi2 (0.489/31.5 vs ours 0.489/31.5 at
# steps=360 seed=3; VIO 0.260) — i.e. the reference's g2o full-batch LM
# (graph_slam.cpp:182-219) would degrade identically. Guard: RELATIVE to
# VIO (<= vio_ratio_bound x) plus the absolute bound. Huber reliably helps
# there (stale latest-wins measurements at driving speed act like outliers).
SCENES = {
    "lab": dict(
        gen=dict(scene="lab", loops=2.0, drift_noise=0.008, sensor_every=5),
        require_beat_vio=True, ate_bound=0.35,
    ),
    "kitti": dict(
        gen=dict(scene="kitti", drift_noise=0.006, sensor_every=5),
        require_beat_vio=False, ate_bound=1.0, vio_ratio_bound=2.2,
    ),
    "dense_indoor": dict(
        gen=dict(scene="dense_indoor", loops=1.5, drift_noise=0.008, sensor_every=5),
        require_beat_vio=True, ate_bound=0.35,
    ),
    # out-and-back hallway (chair/tvmonitor/keyboard), re-observation on the
    # return leg — the ROVIO+YOLO regime of tests/test_scenarios.py. Drift
    # 0.012: below ~0.01 the synthetic VIO is already tighter than full-batch
    # re-optimization under this eq-dist config and beat-VIO is the wrong
    # guard (measured at 0.006: opt 0.21 vs vio 0.17).
    "corridor": dict(
        gen=dict(scene="corridor", drift_noise=0.012, sensor_every=5),
        require_beat_vio=True, ate_bound=0.4,
    ),
}

MODES = {
    "points": dict(use_plane_landmarks=False, robust="none"),
    # the yolo_detector_kitti_recommended analog: DCS on point observations
    "points+dcs": dict(use_plane_landmarks=False, robust="dcs"),
    "patches": dict(use_plane_landmarks=True, robust="none"),
    # robust kernels apply to observation AND SE3-plane edges
    "patches+huber": dict(use_plane_landmarks=True, robust="huber"),
    "patches+dcs": dict(use_plane_landmarks=True, robust="dcs"),
    # bounded-memory fixed-lag smoothing: same ATE bounds as full history
    "points+fl": dict(use_plane_landmarks=False, robust="none", fixed_lag=24),
    "patches+fl": dict(use_plane_landmarks=True, robust="none", fixed_lag=24),
}

# The mode we'd actually recommend per scene class (config.py
# *_recommended profiles follow the same logic): the guard below asserts
# the RECOMMENDED configuration never loses to its own VIO input — even on
# the open kitti corridor where the parity configuration legitimately does.
RECOMMENDED_MODE = {
    "lab": "points",
    "kitti": "points+dcs",
    "dense_indoor": "points",
    "corridor": "points",
}


def sweep_config(
    use_plane_landmarks: bool, robust: str, fixed_lag: int = 0
) -> SlamConfig:
    return SlamConfig(
        camera_angle_deg=0.0,
        strict_reference_frames=True,
        use_plane_landmarks=use_plane_landmarks,
        keyframe=KeyframeConfig(delta_trans=0.4, delta_angle=0.4, delta_time=2.0),
        segmentation=SegmentationConfig(
            num_point_seg=100, norm_point_thres=400, planar_area=0.01,
            crop_height=64, crop_width=64, max_planes_per_detection=2,
            num_hypotheses=64, normal_smoothing_size=10,
        ),
        association=AssociationConfig(
            use_maha_dist=False, use_eq_dist=True, eq_dist_thres=1.0,
            land_noise_low=0.1,
        ),
        information=InformationConfig(
            use_const_inf_matrix=True, const_stddev_x=0.00667, const_stddev_q=0.00001
        ),
        solver=SolverConfig(
            max_iterations=32, dtype="float64", robust_kernel=robust,
            robust_delta=1.0, fixed_lag_window=fixed_lag,
            fixed_lag_chunk=8 if fixed_lag else 0,
        ),
        capacity=CapacityConfig(
            max_keyframes=128, max_landmarks=32, max_odom_edges=128,
            max_landmark_edges=512, max_detections_per_frame=6,
        ),
    )


def run_one(scene_kw: dict, mode_kw: dict, steps: int, seed: int = 3):
    log = synth_mod.make_synthetic_log(seed=seed, n_steps=steps, **scene_kw)
    eng = SlamEngine(
        sweep_config(
            mode_kw["use_plane_landmarks"],
            mode_kw["robust"],
            mode_kw.get("fixed_lag", 0),
        )
    )
    replay_mod.replay(log, eng)

    gt_t = np.array([e.t for e in log.gt])
    gt_xyz = np.stack([e.pose7[:3] for e in log.gt])
    kf_t = np.array([k.stamp for k in eng.keyframes])
    kf_xyz = eng.get_keyframe_poses()[:, :3]
    vio_t = np.array([t for t, _ in eng.vio_traj])
    vio_xyz = np.stack([p[:3] for _, p in eng.vio_traj])
    return {
        "ate_opt": float(ate_mod.ate_rmse(kf_t, kf_xyz, gt_t, gt_xyz, align=False)),
        "ate_vio": float(ate_mod.ate_rmse(vio_t, vio_xyz, gt_t, gt_xyz, align=False)),
        "keyframes": len(eng.keyframes),
        "landmarks": int(eng.table.count),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=360)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    results: dict[str, dict[str, dict]] = {}
    for sname, skw in SCENES.items():
        results[sname] = {}
        for mname, mkw in MODES.items():
            r = run_one(skw["gen"], mkw, args.steps, args.seed)
            results[sname][mname] = r
            print(
                f"[{sname:>13s} | {mname:<13s}] ATE {r['ate_opt']:.4f} "
                f"(vio {r['ate_vio']:.4f})  kf={r['keyframes']} lm={r['landmarks']}",
                flush=True,
            )

    if args.json:
        print(json.dumps(results, indent=1))

    # regression guards: beat VIO on looped scenes; relative-to-VIO ratio
    # where full-batch re-optimization legitimately loses (open trajectory,
    # see SCENES comment); absolute bound always
    bad = []
    for s, ms in results.items():
        for m, r in ms.items():
            if SCENES[s]["require_beat_vio"] and not (r["ate_opt"] < r["ate_vio"]):
                bad.append((s, m, "opt !< vio"))
            ratio = SCENES[s].get("vio_ratio_bound")
            if ratio and not (r["ate_opt"] <= ratio * r["ate_vio"]):
                bad.append((s, m, f"ate > {ratio}x vio"))
            if not (r["ate_opt"] < SCENES[s]["ate_bound"]):
                bad.append((s, m, f"ate >= {SCENES[s]['ate_bound']}"))
    # no advertised configuration loses to its own input: the recommended
    # mode must beat raw VIO on EVERY scene (kitti included — DCS handles
    # the stale-measurement outliers the parity config chokes on)
    for s, mrec in RECOMMENDED_MODE.items():
        r = results[s][mrec]
        if not (r["ate_opt"] < r["ate_vio"]):
            bad.append((s, mrec, "RECOMMENDED opt !< vio"))
    if bad:
        print(f"REGRESSION: {bad}")
        sys.exit(1)
    print("all scenes within bounds ✓")


if __name__ == "__main__":
    main()
