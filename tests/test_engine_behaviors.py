"""Engine behavior details: detection-triggered keyframes, the synthetic
first pose+landmark seed, dead-reckoning, latest-wins pairing."""

import numpy as np
import pytest

from semantic_slam_tpu.config import CLASS_TO_ID
from semantic_slam_tpu.runtime.engine import SlamEngine
from tests.test_e2e import e2e_config

IDENT = np.array([0, 0, 0, 1, 0, 0, 0.0])


def pose_x(x):
    p = IDENT.copy()
    p[0] = x
    return p


class TestDetectionTriggeredKeyframes:
    def test_detection_creates_keyframe_below_gate(self):
        cfg = e2e_config().replace(update_key_using_det=True)
        eng = SlamEngine(cfg)
        eng.vio_callback(0.0, IDENT)  # first always registers
        # tiny motion, below the gate: no keyframe without a detection
        eng.vio_callback(0.05, pose_x(0.01))
        assert len(eng.keyframe_queue) == 1
        # a detection arrives: the next VIO message creates a keyframe even
        # though the gate says no (semantic_graph_slam.cpp:239-250)
        H, W = 60, 80
        eng.set_point_cloud(np.zeros((H, W, 3), np.float32), np.zeros((H, W), bool))
        eng.set_detections(
            np.array([[5, 5, 20, 20.0]]), np.array([0], np.int32), np.array([0.9])
        )
        eng.vio_callback(0.1, pose_x(0.02))
        assert len(eng.keyframe_queue) == 2
        # the flag was consumed: the next sub-gate message does NOT trigger
        eng.vio_callback(0.15, pose_x(0.03))
        assert len(eng.keyframe_queue) == 2

    def test_gate_only_without_flag(self):
        cfg = e2e_config()  # update_key_using_det=False
        eng = SlamEngine(cfg)
        eng.vio_callback(0.0, IDENT)
        eng.set_detections(
            np.array([[5, 5, 20, 20.0]]), np.array([0], np.int32), np.array([0.9])
        )
        eng.vio_callback(0.05, pose_x(0.01))
        assert len(eng.keyframe_queue) == 1  # detection alone doesn't trigger


class TestFirstPoseAndLandmark:
    def test_seed_matches_reference(self):
        cfg = e2e_config().replace(
            add_first_lan=True, first_lan_x=1.42, first_lan_y=-0.028, first_lan_z=0.15
        )
        eng = SlamEngine(cfg)
        # identity keyframe + fixed synthetic landmark (cpp:289-332)
        assert len(eng.keyframes) == 1
        assert int(eng.graph.num_poses) == 1
        assert int(eng.graph.num_landmarks) == 1
        assert int(eng.graph.num_lme) == 1
        lms = eng.get_mapped_landmarks()
        np.testing.assert_allclose(lms["pose"][0], [1.42, -0.028, 0.15], atol=1e-6)
        assert int(lms["class_id"][0]) == CLASS_TO_ID["bucket"]
        assert int(lms["plane_type"][0]) == 1  # vertical
        np.testing.assert_allclose(lms["normal"][0], [-0.4, 0.86, 0, 0], atol=1e-6)
        np.testing.assert_allclose(lms["covariance"][0], np.eye(3) * 0.1, atol=1e-6)

    def test_seeded_engine_accepts_frames(self):
        cfg = e2e_config().replace(add_first_lan=True)
        eng = SlamEngine(cfg)
        eng.vio_callback(1.0, pose_x(0.0))
        eng.run()
        assert int(eng.graph.num_poses) == 2


class TestDeadReckoning:
    def test_robot_pose_integrates_between_keyframes(self):
        cfg = e2e_config()
        eng = SlamEngine(cfg)
        eng.vio_callback(0.0, IDENT)
        eng.run()
        eng.first_key_added = True
        # sub-gate motion: robot pose advances by the VIO increment
        eng.vio_callback(0.1, pose_x(0.1))
        np.testing.assert_allclose(eng.get_robot_pose()[:3], [0.1, 0, 0], atol=1e-9)
        eng.vio_callback(0.2, pose_x(0.25))
        np.testing.assert_allclose(eng.get_robot_pose()[:3], [0.25, 0, 0], atol=1e-9)

    def test_keyframe_snapshot_precedes_increment(self):
        """The keyframe stores robot_pose BEFORE the triggering message's
        increment (semantic_graph_slam.cpp:274-276)."""
        cfg = e2e_config()
        eng = SlamEngine(cfg)
        eng.vio_callback(0.0, IDENT)
        eng.run()
        eng.first_key_added = True
        eng.vio_callback(0.1, pose_x(0.1))  # dead-reckon to 0.1
        eng.vio_callback(5.0, pose_x(0.9))  # gate triggers (time+trans)
        kf = eng.keyframe_queue[-1]
        # snapshot excludes the 0.1 -> 0.9 increment
        np.testing.assert_allclose(kf.robot_pose[:3], [0.1, 0, 0], atol=1e-9)
        np.testing.assert_allclose(kf.odom[:3], [0.9, 0, 0], atol=1e-12)


class TestLatestWins:
    def test_stale_cloud_is_reused(self):
        cfg = e2e_config()
        eng = SlamEngine(cfg)
        H, W = 60, 80
        cloud = np.ones((H, W, 3), np.float32)
        eng.set_point_cloud(cloud, np.ones((H, W), bool))
        eng.vio_callback(0.0, IDENT)
        kf1 = eng.keyframe_queue[-1]
        assert kf1.cloud is not None
        # no new cloud: the NEXT keyframe still carries the stale one
        # (getPointCloudData clears the flag but keeps the message,
        # semantic_graph_slam.cpp:348-352)
        eng.vio_callback(5.0, pose_x(1.0))
        kf2 = eng.keyframe_queue[-1]
        assert kf2.cloud is not None
        np.testing.assert_allclose(kf2.cloud[0], cloud)

    def test_detections_not_reused(self):
        cfg = e2e_config()
        eng = SlamEngine(cfg)
        H, W = 60, 80
        eng.set_point_cloud(np.ones((H, W, 3), np.float32), np.ones((H, W), bool))
        eng.set_detections(
            np.array([[5, 5, 20, 20.0]]), np.array([0], np.int32), np.array([0.9])
        )
        eng.vio_callback(0.0, IDENT)
        assert eng.keyframe_queue[-1].boxes is not None
        eng.vio_callback(5.0, pose_x(1.0))
        # flag consumed: second keyframe has no detections
        assert eng.keyframe_queue[-1].boxes is None


class TestBatchedKeyframeIngest:
    def test_batch_matches_sequential(self):
        """_ingest_keyframes_batch (one program per run) produces the exact
        same graph as B sequential _ingest_keyframe calls."""
        import jax.numpy as jnp

        from semantic_slam_tpu.core import geometry as geo
        from semantic_slam_tpu.graph import state as gs
        from semantic_slam_tpu.runtime.engine import (
            _ingest_keyframe,
            _ingest_keyframes_batch,
        )

        rng = np.random.default_rng(3)
        info6 = jnp.eye(6, dtype=jnp.float64) * 10.0
        odoms = [np.array([0, 0, 0, 1, 0, 0, 0], np.float64)]
        for _ in range(5):
            xi = jnp.asarray(rng.normal(size=6) * 0.3, jnp.float64)
            odoms.append(np.asarray(geo.pose_retract(jnp.asarray(odoms[-1]), xi)))

        # sequential: first keyframe has no prev
        g_seq = gs.make_graph(16, 8, 16, 16, dtype=jnp.float64)
        prev = odoms[0]
        for k, o in enumerate(odoms):
            g_seq, _ = _ingest_keyframe(g_seq, o, prev, k > 0, info6)
            prev = o

        # batched with padding: empty-graph start, has_prev=False
        B = 8
        od = np.tile(odoms[-1], (B, 1))
        for b, o in enumerate(odoms):
            od[b] = o
        valid = np.zeros((B,), bool)
        valid[: len(odoms)] = True
        g_b = gs.make_graph(16, 8, 16, 16, dtype=jnp.float64)
        g_b = _ingest_keyframes_batch(g_b, od, valid, odoms[0], False, info6)

        assert int(g_b.num_poses) == int(g_seq.num_poses) == len(odoms)
        assert int(g_b.num_odom) == int(g_seq.num_odom) == len(odoms) - 1
        np.testing.assert_allclose(np.asarray(g_b.poses), np.asarray(g_seq.poses))
        np.testing.assert_allclose(np.asarray(g_b.odom_meas), np.asarray(g_seq.odom_meas), atol=1e-12)
        np.testing.assert_array_equal(np.asarray(g_b.odom_i), np.asarray(g_seq.odom_i))
        np.testing.assert_array_equal(np.asarray(g_b.odom_j), np.asarray(g_seq.odom_j))

    def test_batch_continues_existing_graph(self):
        import jax.numpy as jnp

        from semantic_slam_tpu.graph import state as gs
        from semantic_slam_tpu.runtime.engine import (
            _ingest_keyframe,
            _ingest_keyframes_batch,
        )

        info6 = jnp.eye(6, dtype=jnp.float64)
        p0 = np.array([0, 0, 0, 1, 0, 0, 0], np.float64)
        p1 = np.array([1, 0, 0, 1, 0, 0, 0], np.float64)
        p2 = np.array([2, 0, 0, 1, 0, 0, 0], np.float64)

        g = gs.make_graph(16, 8, 16, 16, dtype=jnp.float64)
        g, _ = _ingest_keyframe(g, p0, p0, False, info6)
        od = np.stack([p1, p2])
        g = _ingest_keyframes_batch(g, od, np.array([True, True]), p0, True, info6)
        assert int(g.num_poses) == 3
        assert int(g.num_odom) == 2
        np.testing.assert_array_equal(np.asarray(g.odom_i[:2]), [0, 1])
        np.testing.assert_array_equal(np.asarray(g.odom_j[:2]), [1, 2])


class TestAutosave:
    def test_periodic_autosave_and_recovery(self, tmp_path):
        """autosave_every_n_ticks writes a full checkpoint the engine can be
        revived from mid-session (elastic recovery the reference lacks)."""
        import dataclasses

        from semantic_slam_tpu.io import replay as replay_mod
        from semantic_slam_tpu.io import synthetic as synth_mod
        from semantic_slam_tpu.io.checkpoint import load_checkpoint

        p = str(tmp_path / "auto.npz")
        cfg = e2e_config()
        cfg = dataclasses.replace(cfg, autosave_every_n_ticks=3, autosave_path=p)
        log = synth_mod.make_synthetic_log(seed=5, n_steps=120, sensor_every=6, H=120, W=160)
        eng = SlamEngine(cfg)
        replay_mod.replay(log, eng)
        import os

        assert os.path.exists(p)

        # simulate the crash: fresh engine, restore, keep going
        eng2 = SlamEngine(e2e_config())
        load_checkpoint(p, eng2)
        assert eng2.get_keyframe_poses().shape[0] > 0
        eng2.vio_callback(100.0, eng2.prev_odom)
        eng2.vio_callback(
            101.5, eng2.prev_odom + np.array([1, 0, 0, 0, 0, 0, 0.0])
        )
        eng2.run()
        assert int(eng2.graph.num_poses) >= eng2.get_keyframe_poses().shape[0] - 1
