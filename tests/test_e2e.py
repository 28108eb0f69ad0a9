"""End-to-end replay test: synthetic lab session -> engine -> ATE.

The moral equivalent of the reference's rosbag validation (SURVEY.md §4):
replay a deterministic session with drifting VIO, assert the optimized
trajectory beats raw VIO against ground truth.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from semantic_slam_tpu.config import (
    AssociationConfig,
    CapacityConfig,
    InformationConfig,
    KeyframeConfig,
    SegmentationConfig,
    SlamConfig,
    SolverConfig,
)
from semantic_slam_tpu.eval import ate as ate_mod
from semantic_slam_tpu.io import replay as replay_mod
from semantic_slam_tpu.io import synthetic as synth_mod
from semantic_slam_tpu.io import tum as tum_mod
from semantic_slam_tpu.runtime.engine import SlamEngine
from semantic_slam_tpu.runtime.keyframe_gate import KeyframeGate


def e2e_config():
    return SlamConfig(
        camera_angle_deg=0.0,
        update_key_using_det=False,
        strict_reference_frames=True,
        keyframe=KeyframeConfig(delta_trans=0.4, delta_angle=0.4, delta_time=2.0),
        segmentation=SegmentationConfig(
            num_point_seg=100,
            norm_point_thres=400,
            planar_area=0.01,
            crop_height=64,
            crop_width=64,
            max_planes_per_detection=2,
            num_hypotheses=64,
            normal_smoothing_size=10,
        ),
        association=AssociationConfig(
            use_maha_dist=False, use_eq_dist=True, eq_dist_thres=1.0, land_noise_low=0.1
        ),
        information=InformationConfig(
            use_const_inf_matrix=True, const_stddev_x=0.00667, const_stddev_q=0.00001
        ),
        solver=SolverConfig(max_iterations=32, dtype="float64"),
        capacity=CapacityConfig(
            max_keyframes=64,
            max_landmarks=16,
            max_odom_edges=64,
            max_landmark_edges=256,
            max_detections_per_frame=4,
        ),
    )


@pytest.fixture(scope="module")
def session():
    log = synth_mod.make_synthetic_log(
        seed=3, n_steps=360, sensor_every=5, drift_noise=0.008, loops=2.0
    )
    eng = SlamEngine(e2e_config())
    replay_mod.replay(log, eng)
    return log, eng


class TestEndToEnd:
    def test_builds_graph(self, session):
        log, eng = session
        assert int(eng.graph.num_poses) >= 8
        assert int(eng.graph.num_landmarks) >= 2
        assert int(eng.graph.num_lme) >= 8
        # landmark count stays bounded: re-observations associate instead of
        # spawning (4 physical objects; tolerate a few duplicates from the
        # drifting robot pose used in the world transform)
        assert int(eng.table.count) <= 10

    def test_optimizer_ran_and_converged(self, session):
        _, eng = session
        final = [s for s in eng.stats_history if s["iterations"] > 0]
        assert final, "optimizer never ran"
        assert final[-1]["chi2_final"] <= final[-1]["chi2_initial"]

    def test_ate_improves_over_vio(self, session):
        log, eng = session
        gt_t = np.array([e.t for e in log.gt])
        gt_xyz = np.stack([e.pose7[:3] for e in log.gt])

        kf_t = np.array([k.stamp for k in eng.keyframes])
        kf_xyz = eng.get_keyframe_poses()[:, :3]
        vio_t = np.array([t for t, _ in eng.vio_traj])
        vio_xyz = np.stack([p[:3] for _, p in eng.vio_traj])

        ate_opt = ate_mod.ate_rmse(kf_t, kf_xyz, gt_t, gt_xyz, align=False)
        ate_vio = ate_mod.ate_rmse(vio_t, vio_xyz, gt_t, gt_xyz, align=False)
        assert np.isfinite(ate_opt)
        # optimized keyframes must beat raw VIO and stay within a sane bound
        assert ate_opt < ate_vio
        assert ate_opt < 0.35

    def test_map2odom_consistency(self, session):
        _, eng = session
        # robot_pose == map2odom * last_kf_odom (by construction, :92-95)
        from semantic_slam_tpu.core import geometry as geo

        last = eng.keyframes[-1]
        recon = np.asarray(
            geo.pose_mul(jnp.asarray(eng.map2odom), jnp.asarray(last.odom))
        )
        est = np.asarray(eng.graph.poses[last.node_idx], np.float64)
        np.testing.assert_allclose(recon[:3], est[:3], atol=1e-6)

    def test_tum_round_trip(self, session, tmp_path):
        _, eng = session
        kf_t = np.array([k.stamp for k in eng.keyframes])
        poses = eng.get_keyframe_poses()
        path = str(tmp_path / "robot_pose.txt")
        tum_mod.write_tum(path, kf_t, poses)
        first = open(path).readline().strip()
        assert first == "#timestamp ,tx,ty,tz,qx,qy,qz,qw"
        t2, p2 = tum_mod.read_tum(path)
        np.testing.assert_allclose(t2, kf_t)
        np.testing.assert_allclose(p2, poses, rtol=1e-12)


class TestMahalanobisEndToEnd:
    def test_maha_profile_session(self):
        """yolo-style profile: Mahalanobis gating fed by the solver's
        marginal covariances, end to end."""
        cfg = e2e_config().replace(
            association=AssociationConfig(
                use_maha_dist=True, use_eq_dist=False, maha_dist_thres=9.0,
                land_noise_low=0.4,
            )
        )
        log = synth_mod.make_synthetic_log(
            seed=7, n_steps=240, sensor_every=5, drift_noise=0.006, loops=1.5
        )
        eng = SlamEngine(cfg)
        replay_mod.replay(log, eng)
        assert int(eng.table.count) >= 2
        # landmarks still deduplicated across revisits (4 physical objects)
        assert int(eng.table.count) <= 10
        gt_t = np.array([e.t for e in log.gt])
        gt_xyz = np.stack([e.pose7[:3] for e in log.gt])
        kf_t = np.array([k.stamp for k in eng.keyframes])
        kf_xyz = eng.get_keyframe_poses()[:, :3]
        ate = ate_mod.ate_rmse(kf_t, kf_xyz, gt_t, gt_xyz, align=False)
        assert np.isfinite(ate) and ate < 0.4


class TestKeyframeDump:
    def test_dump_matches_reference_layout(self, session, tmp_path):
        from semantic_slam_tpu.io.dump import dump_keyframes

        _, eng = session
        out = str(tmp_path / "kfs")
        dump_keyframes(out, eng)
        import os

        d0 = os.path.join(out, "000000", "data")
        assert os.path.exists(d0)
        txt = open(d0).read()
        assert txt.startswith("stamp ")
        assert "odom\n" in txt and "accum_distance " in txt and "id " in txt


class TestKeyframeGate:
    def test_first_always_registers(self):
        g = KeyframeGate()
        assert g.update(np.array([0, 0, 0, 1, 0, 0, 0.0]), 0.0)

    def test_below_thresholds_rejected(self):
        g = KeyframeGate(0.5, 0.5, 1.0)
        g.update(np.array([0, 0, 0, 1, 0, 0, 0.0]), 0.0)
        assert not g.update(np.array([0.2, 0, 0, 1, 0, 0, 0.0]), 0.3)

    def test_translation_triggers(self):
        g = KeyframeGate(0.5, 0.5, 10.0)
        g.update(np.array([0, 0, 0, 1, 0, 0, 0.0]), 0.0)
        assert g.update(np.array([0.6, 0, 0, 1, 0, 0, 0.0]), 0.1)
        assert g.accum_distance == pytest.approx(0.6)

    def test_integer_second_truncation(self):
        # reference compares Duration.sec (truncated int) < delta_time
        g = KeyframeGate(10.0, 10.0, 1.0)
        g.update(np.array([0, 0, 0, 1, 0, 0, 0.0]), 0.0)
        assert not g.update(np.array([0, 0, 0, 1, 0, 0, 0.0]), 0.999)
        assert g.update(np.array([0, 0, 0, 1, 0, 0, 0.0]), 1.0)

    def test_angle_uses_acos_w(self):
        import math

        g = KeyframeGate(10.0, 0.5, 100.0)
        g.update(np.array([0, 0, 0, 1, 0, 0, 0.0]), 0.0)
        # yaw rotation of 1.2 rad: q_w = cos(0.6) -> acos = 0.6 >= 0.5
        q = np.array([0, 0, 0, math.cos(0.6), 0, 0, math.sin(0.6)])
        assert g.update(q, 0.1)


class TestReplayIO:
    def test_ragged_detection_counts_round_trip(self, tmp_path):
        """Regression: save_log crashed on logs whose detection events carry
        different box counts (ragged np.array)."""
        log = replay_mod.ReplayLog()
        log.odom.append(replay_mod.OdomEvent(0.0, np.array([0, 0, 0, 1, 0, 0, 0.0])))
        log.detections.append(
            replay_mod.DetectionEvent(
                0.1, np.array([[1, 2, 3, 4.0]]), np.array([0], np.int32), np.array([0.9])
            )
        )
        log.detections.append(
            replay_mod.DetectionEvent(
                0.2,
                np.array([[1, 2, 3, 4.0], [5, 6, 7, 8.0], [9, 10, 11, 12.0]]),
                np.array([1, 2, 3], np.int32),
                np.array([0.7, 0.8, 0.9]),
            )
        )
        log.gt.append(replay_mod.GtEvent(0.0, np.array([0, 0, 0, 1, 0, 0, 0.0])))
        p = str(tmp_path / "ragged.npz")
        replay_mod.save_log(p, log)
        log2 = replay_mod.load_log(p)
        assert len(log2.detections[0].boxes) == 1
        assert len(log2.detections[1].boxes) == 3
        np.testing.assert_allclose(log2.detections[1].boxes[2], [9, 10, 11, 12.0])
        np.testing.assert_array_equal(log2.detections[1].class_ids, [1, 2, 3])

    def test_log_save_load(self, tmp_path):
        log = synth_mod.make_synthetic_log(seed=1, n_steps=30, sensor_every=10, H=60, W=80)
        p = str(tmp_path / "log.npz")
        replay_mod.save_log(p, log)
        log2 = replay_mod.load_log(p)
        assert len(log2.odom) == len(log.odom)
        assert len(log2.clouds) == len(log.clouds)
        np.testing.assert_allclose(log2.odom[5].pose7, log.odom[5].pose7)
        np.testing.assert_allclose(log2.clouds[0].points, log.clouds[0].points)


class TestPlanarPatchMode:
    def test_patch_mode_beats_or_matches_points(self):
        """use_plane_landmarks: centroid (point) + orientation/offset (plane)
        constraints per landmark — the paper's formulation layered on the
        reference behavior. Must not regress vs point-only."""
        log = synth_mod.make_synthetic_log(
            seed=3, n_steps=360, sensor_every=5, drift_noise=0.008, loops=2.0
        )
        gt_t = np.array([e.t for e in log.gt])
        gt_xyz = np.stack([e.pose7[:3] for e in log.gt])

        ates = {}
        for flag in (False, True):
            eng = SlamEngine(e2e_config().replace(use_plane_landmarks=flag))
            replay_mod.replay(log, eng)
            kf_t = np.array([k.stamp for k in eng.keyframes])
            kf_xyz = eng.get_keyframe_poses()[:, :3]
            ates[flag] = ate_mod.ate_rmse(kf_t, kf_xyz, gt_t, gt_xyz, align=False)
            if flag:
                assert int(eng.plane_nodes.num_planes) == int(eng.graph.num_landmarks)
                assert int(eng.plane_nodes.num_pe) >= 8
                # optimized planes keep unit normals
                n = int(eng.plane_nodes.num_planes)
                nrm = np.linalg.norm(np.asarray(eng.plane_nodes.planes[:n, :3]), axis=1)
                np.testing.assert_allclose(nrm, 1.0, atol=1e-6)
        assert ates[True] <= ates[False] * 1.1
        assert ates[True] < 0.35


class TestOptimizeEveryN:
    def test_periodic_optimize_with_finalize(self):
        """optimize_every_n_ticks=3 skips 2 of 3 LM solves; finalize() forces
        a last pass so the end trajectory stays comparable to every-tick."""
        log = synth_mod.make_synthetic_log(
            seed=3, n_steps=360, sensor_every=5, drift_noise=0.008, loops=2.0
        )
        gt_t = np.array([e.t for e in log.gt])
        gt_xyz = np.stack([e.pose7[:3] for e in log.gt])

        import dataclasses

        cfg = e2e_config()
        cfg_n3 = cfg.replace(
            solver=dataclasses.replace(cfg.solver, optimize_every_n_ticks=3)
        )
        eng = SlamEngine(cfg_n3)
        replay_mod.replay(log, eng)
        eng.finalize()

        ran = [s["iterations"] > 0 for s in eng.stats_history]
        n_ticks = len(eng.stats_history)
        # strictly fewer solves than ticks, but still some
        assert 0 < sum(ran) < n_ticks
        assert ran[-1]  # finalize forced the last one

        kf_t = np.array([k.stamp for k in eng.keyframes])
        kf_xyz = eng.get_keyframe_poses()[:, :3]
        ate_n3 = ate_mod.ate_rmse(kf_t, kf_xyz, gt_t, gt_xyz, align=False)
        assert ate_n3 < 0.35  # same bound the every-tick test enforces


class TestWarmStartLambda:
    def test_warm_start_converges_same(self):
        """warm_start_lambda feeds the previous tick's final damping back in;
        the trajectory must stay essentially the reference-parity one."""
        import dataclasses

        log = synth_mod.make_synthetic_log(
            seed=3, n_steps=360, sensor_every=5, drift_noise=0.008, loops=2.0
        )
        gt_t = np.array([e.t for e in log.gt])
        gt_xyz = np.stack([e.pose7[:3] for e in log.gt])

        ates = {}
        for ws in (False, True):
            cfg = e2e_config()
            cfg = cfg.replace(solver=dataclasses.replace(cfg.solver, warm_start_lambda=ws))
            eng = SlamEngine(cfg)
            replay_mod.replay(log, eng)
            if ws:
                assert eng._last_lambda > 0.0
            kf_t = np.array([k.stamp for k in eng.keyframes])
            kf_xyz = eng.get_keyframe_poses()[:, :3]
            ates[ws] = ate_mod.ate_rmse(kf_t, kf_xyz, gt_t, gt_xyz, align=False)
        assert abs(ates[True] - ates[False]) < 0.02
        assert ates[True] < 0.35
