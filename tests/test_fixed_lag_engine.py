"""Engine-level fixed-lag smoothing: bounded window, full trajectory out.

Replays the canonical synthetic lab session with
``SolverConfig.fixed_lag_window`` set and asserts (a) the active graph stays
bounded while the exported trajectory keeps every keyframe, (b) accuracy
still beats raw VIO within the e2e bound, (c) the prior and archive
round-trip through checkpoints.
"""

import dataclasses

import numpy as np
import pytest

from semantic_slam_tpu.eval import ate as ate_mod
from semantic_slam_tpu.io import replay as replay_mod
from semantic_slam_tpu.io import synthetic as synth_mod
from semantic_slam_tpu.runtime.engine import SlamEngine

from test_e2e import e2e_config

WINDOW, CHUNK = 20, 8


def fl_config():
    cfg = e2e_config()
    return dataclasses.replace(
        cfg,
        solver=dataclasses.replace(
            cfg.solver, fixed_lag_window=WINDOW, fixed_lag_chunk=CHUNK
        ),
    )


@pytest.fixture(scope="module")
def session():
    log = synth_mod.make_synthetic_log(
        seed=3, n_steps=360, sensor_every=5, drift_noise=0.008, loops=2.0
    )
    eng = SlamEngine(fl_config())
    replay_mod.replay(log, eng)
    return log, eng


class TestFixedLagEngine:
    def test_window_bounded_and_trajectory_complete(self, session):
        _, eng = session
        assert eng._kf_base > 0, "marginalization never triggered"
        assert eng._n_poses < WINDOW + CHUNK
        assert int(eng.graph.num_poses) == eng._n_poses
        poses = eng.get_keyframe_poses()
        assert len(poses) == len(eng.keyframes)
        assert len(eng.archived_poses) == eng._kf_base
        # landmarks were never removed
        assert int(eng.graph.num_landmarks) == int(eng.table.count)

    def test_ate_still_beats_vio(self, session):
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
        assert ate_opt < ate_vio
        assert ate_opt < 0.35

    def test_archive_aware_pose_lookup(self, session):
        _, eng = session
        first, last = eng.keyframes[0], eng.keyframes[-1]
        p_first = eng.get_keyframe_pose(first)
        p_last = eng.get_keyframe_pose(last)
        assert p_first is not None and p_last is not None
        np.testing.assert_allclose(p_first, eng.archived_poses[0])
        np.testing.assert_allclose(
            p_last, np.asarray(eng.graph.poses[eng._n_poses - 1], np.float64)
        )

    def test_growth_interacts_with_prior(self):
        """Capacity doubling mid-session must grow the prior's landmark
        arrays (_grow_prior) and keep marginalization consistent."""
        from semantic_slam_tpu.config import CapacityConfig

        cfg = fl_config()
        cfg = dataclasses.replace(
            cfg,
            capacity=CapacityConfig(
                max_keyframes=16,
                max_landmarks=4,
                max_odom_edges=16,
                max_landmark_edges=32,
                max_detections_per_frame=4,
            ),
        )
        log = synth_mod.make_synthetic_log(
            seed=3, n_steps=240, sensor_every=5, drift_noise=0.008, loops=2.0
        )
        eng = SlamEngine(cfg)
        replay_mod.replay(log, eng)
        assert eng.graph.poses.shape[0] > 16  # growth happened
        assert eng.prior.Hl.shape[0] == eng.graph.landmarks.shape[0]
        assert eng._kf_base > 0
        assert len(eng.get_keyframe_poses()) == len(eng.keyframes)

    @pytest.mark.parametrize("solver", ["dense", "pcg"])
    def test_plane_mode_fixed_lag(self, solver):
        """Planar-patch mode + fixed lag on both linear solvers: bounded
        window, plane edges of dropped keyframes absorbed into anchored
        plane priors, ATE bound."""
        cfg = dataclasses.replace(fl_config(), use_plane_landmarks=True)
        cfg = dataclasses.replace(
            cfg, solver=dataclasses.replace(cfg.solver, linear_solver=solver)
        )
        log = synth_mod.make_synthetic_log(
            seed=3, n_steps=360, sensor_every=5, drift_noise=0.008, loops=2.0
        )
        eng = SlamEngine(cfg)
        replay_mod.replay(log, eng)
        assert eng._kf_base > 0
        assert eng._n_poses < WINDOW + CHUNK
        assert int(eng.plane_nodes.num_planes) == int(eng.graph.num_landmarks)
        # plane edges referencing dropped keyframes are gone
        n_pe = int(eng.plane_nodes.num_pe)
        if n_pe:
            assert np.asarray(eng.plane_nodes.pe_k)[:n_pe].min() >= 0
            assert np.asarray(eng.plane_nodes.pe_k)[:n_pe].max() < eng._n_poses
        # accumulated plane-prior information exists once plane edges dropped
        assert float(np.abs(np.asarray(eng.prior.Hpl)).sum()) > 0

        gt_t = np.array([e.t for e in log.gt])
        gt_xyz = np.stack([e.pose7[:3] for e in log.gt])
        kf_t = np.array([k.stamp for k in eng.keyframes])
        kf_xyz = eng.get_keyframe_poses()[:, :3]
        ate_opt = ate_mod.ate_rmse(kf_t, kf_xyz, gt_t, gt_xyz, align=False)
        assert np.isfinite(ate_opt) and ate_opt < 0.35

    def test_checkpoint_round_trip_keeps_prior(self, session, tmp_path):
        _, eng = session
        from semantic_slam_tpu.io.checkpoint import load_checkpoint, save_checkpoint

        path = str(tmp_path / "fl_ckpt.npz")
        save_checkpoint(path, eng)
        eng2 = SlamEngine(fl_config())
        load_checkpoint(path, eng2)
        assert eng2._kf_base == eng._kf_base
        np.testing.assert_allclose(
            np.asarray(eng2.prior.Hp), np.asarray(eng.prior.Hp), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(eng2.prior.Hl), np.asarray(eng.prior.Hl), atol=1e-12
        )
        np.testing.assert_allclose(
            eng2.get_keyframe_poses(), eng.get_keyframe_poses(), atol=1e-12
        )
