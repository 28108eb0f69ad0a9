"""Whole-session composition golden (VERDICT r4 missing #3 / next #7).

``tests/golden/ref_oracle.json``'s ``session`` scenarios are produced by the
REFERENCE SOURCE CODE composed end-to-end (tools/ref_oracle/oracle_main.cpp
``run_session_scenario``): KeyframeUpdater gating with the detection
override, VIOCallback dead-reckoning bookkeeping (robot_pose_ accumulates on
non-keyframe frames only, so the keyframe snapshot lags odometry), the
association loop at the snapshot pose, and the optimize() refresh gated by
GraphSLAM::optimize's <10-edge skip — semantic_graph_slam.cpp:234-287
composed with :58-102 over a 60-frame synthetic VIO log.

This test replays the SAME input stream through OUR production pieces in the
same composition — KeyframeGate + np_geometry pose bookkeeping +
assoc.associate — and asserts every frame-level decision and value matches:
gate verdicts, accum_distance, the robot-pose snapshots handed to
association, per-detection match/new outcomes and landmark ids, and the
final landmark table. The unit goldens pin each piece; THIS pins that the
pieces compose the way the reference composes them."""

from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from semantic_slam_tpu.assoc import association as assoc
from semantic_slam_tpu.config import CLASS_TO_ID
from semantic_slam_tpu.core import np_geometry as npg
from semantic_slam_tpu.frontend.segmentation import DetectedObjects
from semantic_slam_tpu.runtime.keyframe_gate import KeyframeGate

GOLD = json.loads(
    (Path(__file__).parent / "golden" / "ref_oracle.json").read_text()
)

PLANE_TO_ID = {"horizontal": 0, "vertical": 1}
ATOL32 = 2e-5


def _pose7(pos, quat_xyzw):
    x, y, z, w = quat_xyzw
    return np.concatenate([np.asarray(pos, np.float64), [w, x, y, z]])


def _dets_from_frame(frame):
    ds = frame["detections"]
    M = len(ds)
    return DetectedObjects(
        valid=jnp.ones((M,), bool),
        class_id=jnp.asarray([CLASS_TO_ID[d["type"]] for d in ds], jnp.int32),
        prob=jnp.asarray([d["prob"] for d in ds], jnp.float32),
        plane_type=jnp.asarray(
            [PLANE_TO_ID[d["plane_type"]] for d in ds], jnp.int32
        ),
        num_points=jnp.asarray([d["num_points"] for d in ds], jnp.float32),
        pose_cam=jnp.asarray([d["pose_cam"] for d in ds], jnp.float32),
        normal_cam=jnp.asarray([d["normal_cam"] for d in ds], jnp.float32),
        world_pose=jnp.zeros((M, 3), jnp.float32),
    )


@pytest.mark.parametrize("name", ["session_eq", "session_maha"])
def test_session_composition_matches_reference(name):
    scen = next(s for s in GOLD["session"] if s["name"] == name)
    cam_angle = jnp.float32(scen["cam_angle"])
    use_maha = jnp.asarray(scen["use_maha"], bool)

    # production pieces, composed the way SlamEngine.vio_callback +
    # _optimize_tick compose them (engine.py:1099-1144; optimization
    # disabled, so estimates == odometry like the oracle's stub g2o)
    gate = KeyframeGate(delta_trans=0.5, delta_angle=0.5, delta_time=1.0)
    table = assoc.make_table(64)

    ident = np.array([0, 0, 0, 1, 0, 0, 0], np.float64)
    robot_pose = ident.copy()
    prev_odom = ident.copy()
    first_key_added = False
    n_keyframes = 0
    n_edges = 0

    for fi, frame in enumerate(scen["frames"]):
        odom7 = _pose7(frame["odom_pos"], frame["odom_quat_xyzw"])
        stamp = frame["t_sec"] + frame["t_nsec"] * 1e-9
        det_available = frame["det_available"]

        gate_hit = gate.update(odom7, stamp)
        is_kf = gate_hit or det_available
        assert is_kf == frame["is_keyframe"], f"{name} frame {fi}: gate diverges"
        if not is_kf:
            if first_key_added:
                inc = npg.pose_mul(npg.pose_inv(prev_odom), odom7)
                robot_pose = npg.pose_mul(robot_pose, inc)
            prev_odom = odom7
            continue

        np.testing.assert_allclose(
            gate.accum_distance, frame["accum_distance"], atol=1e-5,
            err_msg=f"{name} frame {fi}: accum_distance",
        )
        kf_robot_pose = robot_pose.copy()  # snapshot BEFORE any increment
        prev_odom = odom7
        first_key_added = True

        rp6 = npg.pose_to_xyzrpy(kf_robot_pose)
        np.testing.assert_allclose(
            rp6, frame["robot_pose6"], atol=ATOL32,
            err_msg=f"{name} frame {fi}: robot_pose snapshot",
        )

        n_keyframes += 1
        if n_keyframes >= 2:
            n_edges += 1

        if det_available:
            dets = _dets_from_frame(frame)
            table, res = assoc.associate(
                table,
                dets,
                jnp.asarray(rp6, jnp.float32),
                cam_angle,
                use_maha=use_maha,
                maha_thres=jnp.float32(scen["maha_thres"]),
                eq_thres=jnp.float32(scen["eq_thres"]),
                land_noise=jnp.float32(0.5),
                strict_frames=True,
                rtabmap_y_offset=False,
            )
            results = frame["results"]
            is_new = np.asarray(res.is_new)
            lm_id = np.asarray(res.lm_id)
            world = np.asarray(res.world_pose)
            local = np.asarray(res.local_pose)
            assert len(results) == len(is_new)
            for di, r in enumerate(results):
                assert bool(is_new[di]) == r["is_new"], (
                    f"{name} frame {fi} det {di}: new/match diverges"
                )
                assert int(lm_id[di]) == r["id"], (
                    f"{name} frame {fi} det {di}: landmark id diverges"
                )
                np.testing.assert_allclose(
                    world[di], r["pose_world"], atol=1e-4,
                    err_msg=f"{name} frame {fi} det {di}: world pose",
                )
                np.testing.assert_allclose(
                    local[di], r["local_pose"], atol=1e-4,
                    err_msg=f"{name} frame {fi} det {di}: local pose",
                )
                n_edges += 1

        assert n_edges == frame["n_edges"], f"{name} frame {fi}: edge count"
        if frame["optimized"]:
            # stub-g2o estimate of the last keyframe == its odometry
            robot_pose = odom7.copy()
        assert (n_edges >= 10) == frame["optimized"]

    # final landmark table
    final = scen["final_table"]
    count = int(table.count)
    assert count == len(final), f"{name}: final table size"
    pos = np.asarray(table.world)[:count]
    for li, lm in enumerate(final):
        np.testing.assert_allclose(
            pos[li], lm["pose_world"], atol=1e-4,
            err_msg=f"{name}: final landmark {li}",
        )
