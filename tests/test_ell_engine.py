"""Engine-level ELL assembly contract (solver/assembly.build_slots).

The solver's O(K*R) ELL layout assumes every engine-built graph keeps its
observation edges sorted by keyframe with at most
``max_detections_per_frame * max_planes_per_detection`` edges per keyframe
— across association re-observations, capacity growth, and fixed-lag
compaction. These tests pin the invariant on live sessions and check the
forced-ELL engine produces the same session outputs as the default CPU
(scatter) path.
"""

import jax
import jax.numpy as jnp
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
from semantic_slam_tpu.io import replay as replay_mod
from semantic_slam_tpu.io import synthetic as synth_mod
from semantic_slam_tpu.runtime.engine import SlamEngine


def _cfg(**solver_kw):
    return SlamConfig(
        camera_angle_deg=0.0,
        update_key_using_det=False,
        strict_reference_frames=True,
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
            use_const_inf_matrix=True, const_stddev_x=0.00667,
            const_stddev_q=0.00001,
        ),
        solver=SolverConfig(max_iterations=16, dtype="float64", **solver_kw),
        capacity=CapacityConfig(
            max_keyframes=16,  # forces capacity growth mid-session
            max_landmarks=8,
            max_odom_edges=16,
            max_landmark_edges=32,
            max_detections_per_frame=4,
        ),
    )


def _check_invariant(eng):
    g = eng.graph
    n = int(np.asarray(g.num_lme))
    lk = np.asarray(g.lme_k)[:n]
    assert np.all(np.diff(lk) >= 0), "lme_k not sorted"
    mpd = (
        eng.cfg.capacity.max_detections_per_frame
        * eng.cfg.segmentation.max_planes_per_detection
    )
    if n:
        assert np.bincount(lk).max() <= mpd, "per-pose edge bound exceeded"
    no = int(np.asarray(g.num_odom))
    oi = np.asarray(g.odom_i)[:no]
    oj = np.asarray(g.odom_j)[:no]
    for arr in (oi, oj):
        assert np.all(np.diff(arr) >= 0)
        if no:
            assert np.bincount(arr).max() <= 1


def _run(cfg, seed=3, n_steps=160):
    log = synth_mod.make_synthetic_log(
        seed=seed, n_steps=n_steps, sensor_every=5, drift_noise=0.008, loops=2.0
    )
    eng = SlamEngine(cfg)
    replay_mod.replay(log, eng)
    eng.finalize()
    return eng


class TestEllEngineContract:
    def test_invariant_holds_point_session(self):
        eng = _run(_cfg(linear_solver="pcg", pcg_iters=32))
        assert len(eng.keyframes) > 8
        _check_invariant(eng)

    def test_invariant_holds_fixed_lag_session(self):
        eng = _run(_cfg(linear_solver="pcg", pcg_iters=32, fixed_lag_window=8))
        _check_invariant(eng)

    def test_forced_ell_planes_engine_matches_scatter(self, monkeypatch):
        """Planar-patch sessions route through the merged per-pose layout
        (run_lm_loop_pcg_ellk_planes) — same trajectory as scatter."""
        from semantic_slam_tpu.solver import assembly as asm

        import dataclasses

        def cfg():
            c = _cfg(linear_solver="pcg", pcg_iters=32)
            return dataclasses.replace(c, use_plane_landmarks=True)

        ref = _run(cfg(), n_steps=120)
        monkeypatch.setattr(asm, "_ENV_FORCED", "ell")
        jax.clear_caches()
        try:
            eng = _run(cfg(), n_steps=120)
        finally:
            monkeypatch.undo()
            jax.clear_caches()
        a = np.asarray(ref.graph.poses, np.float64)
        b = np.asarray(eng.graph.poses, np.float64)
        np.testing.assert_allclose(b, a, atol=1e-8)

    def test_forced_ell_engine_matches_scatter(self, monkeypatch):
        """SLAM_ASSEMBLY=ell on this session must reproduce the default
        (scatter) trajectory — the TPU default path, checked on CPU."""
        from semantic_slam_tpu.solver import assembly as asm

        ref = _run(_cfg(linear_solver="pcg", pcg_iters=32))
        monkeypatch.setattr(asm, "_ENV_FORCED", "ell")
        # resolve_assembly is consulted at TRACE time: drop compiled
        # programs so the forced kind actually takes effect
        jax.clear_caches()
        try:
            eng = _run(_cfg(linear_solver="pcg", pcg_iters=32))
        finally:
            monkeypatch.undo()
            jax.clear_caches()
        _check_invariant(eng)
        a = np.asarray(ref.graph.poses, np.float64)
        b = np.asarray(eng.graph.poses, np.float64)
        np.testing.assert_allclose(b, a, atol=1e-8)
