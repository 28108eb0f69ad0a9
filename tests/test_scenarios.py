"""BASELINE.json scenario coverage: KITTI-style outdoor corridor (config #3)
and the dense all-classes indoor scene with on-device voxelization (#4)."""

import numpy as np
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
from semantic_slam_tpu.runtime.engine import SlamEngine


def scenario_config(**assoc_kw):
    return SlamConfig(
        camera_angle_deg=0.0,
        keyframe=KeyframeConfig(delta_trans=0.5, delta_angle=0.5, delta_time=2.0),
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
            use_maha_dist=False, use_eq_dist=True, eq_dist_thres=1.5, land_noise_low=0.1,
            **assoc_kw,
        ),
        # profile-accurate weighting: near-exact VIO rotations (the gravity-
        # aligned sensor model all reference profiles encode)
        information=InformationConfig(
            use_const_inf_matrix=True, const_stddev_x=0.00667, const_stddev_q=0.00001
        ),
        solver=SolverConfig(max_iterations=24, dtype="float64"),
        capacity=CapacityConfig(
            max_keyframes=128, max_landmarks=32, max_odom_edges=128,
            max_landmark_edges=512, max_detections_per_frame=6,
        ),
    )


class TestKittiScenario:
    @pytest.fixture(scope="class")
    def kitti_session(self):
        # sensor_every=2 keeps latest-wins cloud staleness at <=1 VIO period
        # (the reference's real cadence); larger gaps inject an artificial
        # along-track measurement bias at driving speed
        log = synth_mod.make_synthetic_log(
            seed=11, n_steps=360, sensor_every=2, drift_noise=0.006, scene="kitti"
        )
        eng = SlamEngine(scenario_config())
        replay_mod.replay(log, eng)
        return log, eng

    def test_car_landmarks_mapped(self, kitti_session):
        _, eng = kitti_session
        lms = eng.get_mapped_landmarks()
        assert len(lms["pose"]) >= 3
        # all landmarks are 'car' (class 6) and vertical planes
        assert (lms["class_id"] == 6).all()
        assert (lms["plane_type"] == 1).all()

    def test_forward_graph_grows(self, kitti_session):
        _, eng = kitti_session
        assert int(eng.graph.num_poses) >= 20
        assert int(eng.graph.num_lme) >= 10

    def test_drift_bounded_by_landmarks(self, kitti_session):
        log, eng = kitti_session
        gt_t = np.array([e.t for e in log.gt])
        gt_xyz = np.stack([e.pose7[:3] for e in log.gt])
        kf_t = np.array([k.stamp for k in eng.keyframes])
        kf_xyz = eng.get_keyframe_poses()[:, :3]
        ate = ate_mod.ate_rmse(kf_t, kf_xyz, gt_t, gt_xyz, align=False)
        # open trajectory (no loop closure): landmark observations bound the
        # drift locally; assert sane global error over ~43 m of travel and
        # that mapped cars sit at their true height band
        assert np.isfinite(ate) and ate < 1.0
        lms = eng.get_mapped_landmarks()
        assert (np.abs(lms["pose"][:, 2] - 0.7) < 0.5).all()

    def test_export_covariances_recovered_on_eq_profile(self, kitti_session):
        """Eq-gating profiles skip per-tick marginal recovery (matching
        never reads covariances), but the reference refreshes them after
        every optimize (semantic_graph_slam.cpp:89,181-205) — exports must
        deliver fresh marginals via the on-demand recovery (PARITY ledger),
        not creation-time or identity covariances."""
        from semantic_slam_tpu.solver import lm as lm_mod

        _, eng = kitti_session
        lms = eng.get_mapped_landmarks()
        n = len(lms["pose"])
        assert n > 0
        md = np.asarray(lm_mod.landmark_marginals(eng.graph))[:n]
        np.testing.assert_allclose(lms["covariance"], md, rtol=1e-5, atol=1e-8)
        assert not np.allclose(
            lms["covariance"], np.broadcast_to(np.eye(3), (n, 3, 3))
        )
        # cached: a second export at the same tick reuses the same arrays
        lms2 = eng.get_mapped_landmarks()
        np.testing.assert_array_equal(lms2["covariance"], lms["covariance"])


class TestDenseIndoorScenario:
    @pytest.fixture(scope="class")
    def dense_session(self):
        log = synth_mod.make_synthetic_log(
            seed=13, n_steps=300, sensor_every=4, drift_noise=0.005,
            loops=1.5, scene="dense_indoor",
        )
        eng = SlamEngine(scenario_config())
        replay_mod.replay(log, eng)
        return log, eng

    def test_multiple_classes_mapped(self, dense_session):
        _, eng = dense_session
        lms = eng.get_mapped_landmarks()
        classes = set(int(c) for c in lms["class_id"])
        assert len(classes) >= 4  # several of the 7 classes visible+mapped

    def test_voxelization_from_optimized_poses(self, dense_session):
        import jax.numpy as jnp

        from semantic_slam_tpu.core import np_geometry as npg
        from semantic_slam_tpu.mapping import voxel as vox

        _, eng = dense_session
        grid = vox.make_grid((160, 128, 32), origin=(-2.0, -3.2, -0.8), resolution=0.05)
        n_inserted = 0
        for kf in eng.keyframes:
            if kf.cloud is None or kf.node_idx is None:
                continue
            est = np.asarray(eng.graph.poses[kf.node_idx], np.float64)
            xyzrpy = npg.pose_to_xyzrpy(est)
            grid = vox.insert_keyframe_cloud(
                grid,
                jnp.asarray(kf.cloud[0], jnp.float64),
                jnp.asarray(kf.cloud[1]),
                jnp.asarray(xyzrpy),
                jnp.asarray(0.0, jnp.float64),
            )
            n_inserted += 1
            if n_inserted >= 10:
                break
        centers = vox.occupied_centers(grid, min_hits=2)
        assert len(centers) > 20
        # occupied cells must concentrate on the scene's actual surfaces:
        # distance from each voxel center to the nearest object patch
        objects = synth_mod.dense_indoor_scene()
        dmin = np.full(len(centers), np.inf)
        for obj in objects:
            n = obj.normal / np.linalg.norm(obj.normal)
            ub, vb = obj.basis()
            rel = centers - obj.center
            du = np.clip(rel @ ub, -obj.half_u, obj.half_u)
            dv = np.clip(rel @ vb, -obj.half_v, obj.half_v)
            closest = obj.center + du[:, None] * ub + dv[:, None] * vb
            dmin = np.minimum(dmin, np.linalg.norm(centers - closest, axis=1))
        assert np.median(dmin) < 0.2


class TestCorridorScenario:
    """BASELINE config #2: ROVIO VIO + YOLO-profile gating (Mahalanobis) over
    the chair/tvmonitor/keyboard hallway, out-and-back for re-observation."""

    @pytest.fixture(scope="class")
    def corridor_session(self):
        log = synth_mod.make_synthetic_log(
            seed=17, n_steps=360, sensor_every=4, drift_noise=0.006,
            scene="corridor",
        )
        # yolo_detector.yaml regime: Mahalanobis gating fed by marginals
        cfg = scenario_config()
        cfg = cfg.replace(
            association=AssociationConfig(
                use_maha_dist=True, use_eq_dist=False, maha_dist_thres=9.0,
                land_noise_low=0.3,
            )
        )
        eng = SlamEngine(cfg)
        replay_mod.replay(log, eng)
        return log, eng

    def test_multi_class_corridor_landmarks(self, corridor_session):
        _, eng = corridor_session
        lms = eng.get_mapped_landmarks()
        classes = set(int(c) for c in lms["class_id"])
        # chair(0) + tvmonitor(1) + keyboard(3) all mapped
        assert {0, 1, 3} <= classes
        # bounded table: 5 physical objects, tolerate a few duplicates
        assert len(lms["pose"]) <= 12

    def test_corridor_ate_improves(self, corridor_session):
        log, eng = corridor_session
        gt_t = np.array([e.t for e in log.gt])
        gt_xyz = np.stack([e.pose7[:3] for e in log.gt])
        kf_t = np.array([k.stamp for k in eng.keyframes])
        kf_xyz = eng.get_keyframe_poses()[:, :3]
        vio_t = np.array([t for t, _ in eng.vio_traj])
        vio_xyz = np.stack([p[:3] for _, p in eng.vio_traj])
        ate_opt = ate_mod.ate_rmse(kf_t, kf_xyz, gt_t, gt_xyz, align=False)
        ate_vio = ate_mod.ate_rmse(vio_t, vio_xyz, gt_t, gt_xyz, align=False)
        assert np.isfinite(ate_opt)
        assert ate_opt < ate_vio
        assert ate_opt < 0.4
