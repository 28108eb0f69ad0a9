"""Multi-chip as a PRODUCT feature (r4): MeshConfig.num_devices routes the
engine's optimize ticks through the sharded PCG solvers under a device mesh
(runtime/engine.py), reachable from `cli run --devices N`.

This is the reference's runtime loop (semantic_graph_slam.cpp:58-102)
scaled across devices — validated on the virtual CPU mesh: a full replay
under a 4-device mesh must reproduce the single-chip session within float
tolerance (identical frontend/association; the solve differs only in
reduction order)."""

import dataclasses
import json
import os

import numpy as np
import pytest

from semantic_slam_tpu.io import replay as replay_mod
from semantic_slam_tpu.io import synthetic as synth_mod
from semantic_slam_tpu.runtime.engine import SlamEngine
from tests.test_scenarios import scenario_config


def _mesh_config(n, maha=False, planes=False, **solver_kw):
    from semantic_slam_tpu.config import MeshConfig

    cfg = scenario_config()
    if maha:
        cfg = cfg.replace(
            association=dataclasses.replace(
                cfg.association, use_maha_dist=True, use_eq_dist=False,
                maha_dist_thres=2.0,
            )
        )
    cfg = cfg.replace(
        mesh=MeshConfig(num_devices=n),
        use_plane_landmarks=planes,
        solver=dataclasses.replace(
            cfg.solver, linear_solver="pcg", **solver_kw
        ),
    )
    return cfg


@pytest.fixture(scope="module")
def small_log():
    return synth_mod.make_synthetic_log(
        seed=9, n_steps=100, sensor_every=3, drift_noise=0.006, scene="lab"
    )


def _run(cfg, log):
    eng = SlamEngine(cfg)
    replay_mod.replay(log, eng)
    return eng


class TestEngineMesh:
    def test_mesh_session_matches_single_chip(self, small_log):
        e1 = _run(_mesh_config(1), small_log)
        e4 = _run(_mesh_config(4), small_log)
        assert len(e4.keyframes) == len(e1.keyframes) > 5
        assert int(e4.table.count) == int(e1.table.count)
        n = e1._n_poses
        np.testing.assert_allclose(
            np.asarray(e4.graph.poses[:n]), np.asarray(e1.graph.poses[:n]),
            atol=1e-6,
        )
        np.testing.assert_allclose(e4.robot_pose, e1.robot_pose, atol=1e-6)

    def test_mesh_maha_with_marginals(self, small_log):
        """The headline (yolo_detector-class) configuration: Mahalanobis
        gating requires per-tick marginal recovery — under the mesh it runs
        the pose-row sharded recovery inside the tick program."""
        e1 = _run(_mesh_config(1, maha=True), small_log)
        e4 = _run(_mesh_config(4, maha=True), small_log)
        assert len(e4.keyframes) == len(e1.keyframes) > 5
        assert int(e4.table.count) == int(e1.table.count) > 0
        n = e1._n_poses
        np.testing.assert_allclose(
            np.asarray(e4.graph.poses[:n]), np.asarray(e1.graph.poses[:n]),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(e4.table.cov[: int(e4.table.count)]),
            np.asarray(e1.table.cov[: int(e1.table.count)]),
            atol=1e-6,
        )

    def test_mesh_planes_session(self, small_log):
        """Planar-patch landmarks under the mesh (merged point+plane
        pose-row grid)."""
        e1 = _run(_mesh_config(1, planes=True), small_log)
        e4 = _run(_mesh_config(4, planes=True), small_log)
        assert len(e4.keyframes) == len(e1.keyframes) > 5
        n = e1._n_poses
        np.testing.assert_allclose(
            np.asarray(e4.graph.poses[:n]), np.asarray(e1.graph.poses[:n]),
            atol=1e-6,
        )

    def test_mesh_fixed_lag_session(self, small_log):
        """Fixed-lag marginalization composes with the mesh (replicated
        prior folded post-psum on every shard)."""
        e1 = _run(_mesh_config(1, fixed_lag_window=16, fixed_lag_chunk=8), small_log)
        e4 = _run(_mesh_config(4, fixed_lag_window=16, fixed_lag_chunk=8), small_log)
        assert e4._kf_base == e1._kf_base  # same marginalization schedule
        n = e1._n_poses
        np.testing.assert_allclose(
            np.asarray(e4.graph.poses[:n]), np.asarray(e1.graph.poses[:n]),
            atol=5e-6,
        )

    def test_capacity_rounding_and_growth_divisibility(self, small_log):
        """Initial capacities round up to mesh multiples and doubling
        preserves divisibility (sharded solves split edge/pose arrays)."""
        from semantic_slam_tpu.config import CapacityConfig

        cfg = _mesh_config(4).replace(
            capacity=CapacityConfig(
                max_keyframes=10, max_landmarks=8, max_odom_edges=10,
                max_landmark_edges=30, max_detections_per_frame=6,
            )
        )
        eng = _run(cfg, small_log)  # forces growth past the tiny caps
        assert eng.graph.poses.shape[0] % 4 == 0
        assert eng.graph.odom_i.shape[0] % 4 == 0
        assert eng.graph.lme_k.shape[0] % 4 == 0
        assert len(eng.keyframes) > 10  # growth actually happened

    def test_too_many_devices_raises(self):
        with pytest.raises(ValueError, match="num_devices"):
            SlamEngine(_mesh_config(64))


class TestCliDevices:
    def test_cli_run_devices_matches_single(self, tmp_path, small_log):
        """End-to-end CLI: `run --devices 4` on a synthetic log produces the
        single-chip trajectory within float tolerance (VERDICT r3 item 1
        done-criterion)."""
        from semantic_slam_tpu import cli

        log_path = os.path.join(tmp_path, "log.npz")
        replay_mod.save_log(log_path, small_log)

        def run(devices, out):
            cli.main([
                "run", "--log", log_path, "--profile", "yolo_detector",
                "--out", str(tmp_path / out), "--compute-ate", "--cpu",
                "--crop-size", "64", "--max-keyframes", "64",
                "--solver", "pcg", "--devices", str(devices),
            ])
            tum = np.loadtxt(tmp_path / out / "robot_pose.txt")
            with open(tmp_path / out / "summary.json") as f:
                summary = json.load(f)
            return tum, summary

        t1, s1 = run(1, "out1")
        t4, s4 = run(4, "out4")
        assert s4["keyframes"] == s1["keyframes"] > 5
        np.testing.assert_allclose(t4, t1, atol=1e-6)


class TestEngineMeshSoaDist:
    """The r5 mesh solver (solver/soa_dist.py) through the ENGINE: on TPU
    the dispatch routes every jacobi mesh tick there from K >= 1024;
    SLAM_SOLVER_IMPL=soa_dist forces the route on the CPU mesh so the
    session-level product path is exercised in CI."""

    def test_mesh_soa_dist_session_matches_ell(self, small_log, monkeypatch):
        import jax

        def run(impl):
            monkeypatch.setenv("SLAM_SOLVER_IMPL", impl)
            jax.clear_caches()
            eng = _run(_mesh_config(4), small_log)
            return eng

        try:
            e_ell = run("ell")
            e_soa = run("soa_dist")
        finally:
            monkeypatch.delenv("SLAM_SOLVER_IMPL")
            jax.clear_caches()
        assert len(e_soa.keyframes) == len(e_ell.keyframes) > 5
        assert int(e_soa.table.count) == int(e_ell.table.count)
        n = e_ell._n_poses
        # different solver family => summation-order drift only
        np.testing.assert_allclose(
            np.asarray(e_soa.graph.poses[:n]),
            np.asarray(e_ell.graph.poses[:n]),
            atol=5e-4,
        )

    def test_mesh_soa_dist_maha_session(self, small_log, monkeypatch):
        """Maha gating under the forced soa_dist mesh route: marginal
        recovery comes from the sharded final-state EllBlocks path."""
        import jax

        monkeypatch.setenv("SLAM_SOLVER_IMPL", "soa_dist")
        jax.clear_caches()
        try:
            eng = _run(_mesh_config(4, maha=True), small_log)
        finally:
            monkeypatch.delenv("SLAM_SOLVER_IMPL")
            jax.clear_caches()
        assert len(eng.keyframes) > 5
        assert int(eng.table.count) > 0
        assert np.isfinite(np.asarray(eng.graph.poses)).all()
