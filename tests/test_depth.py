"""Depth-image ingestion: on-device pinhole backprojection (the in-framework
replacement for the reference's external depth_image_proc nodelet) and the
engine's u16 depth-mode path vs the organized-cloud path."""

import numpy as np
import jax.numpy as jnp

from semantic_slam_tpu.eval import ate as ate_mod
from semantic_slam_tpu.frontend import depth as depth_mod
from semantic_slam_tpu.io import replay as replay_mod
from semantic_slam_tpu.io import synthetic as synth_mod
from semantic_slam_tpu.runtime.engine import SlamEngine
from tests.test_e2e import e2e_config


class TestBackprojection:
    def test_round_trip_pinhole(self, rng):
        """cloud -> u16 depth -> cloud round-trips to quantization accuracy."""
        H, W = 48, 64
        fx = fy = 80.0
        cx, cy = W / 2, H / 2
        intr = jnp.asarray([fx, fy, cx, cy], jnp.float64)
        z = jnp.asarray(rng.uniform(0.5, 4.0, size=(H, W)), jnp.float64)
        u = jnp.arange(W, dtype=jnp.float64)[None, :]
        v = jnp.arange(H, dtype=jnp.float64)[:, None]
        pts = jnp.stack([(u - cx) * z / fx, (v - cy) * z / fy, z], -1)
        valid = jnp.asarray(rng.uniform(size=(H, W)) > 0.1)

        d16 = depth_mod.project_cloud_to_depth(pts, valid, intr, 1e-3)
        pts2, valid2 = depth_mod.backproject_depth(d16, intr, jnp.float64(1e-3))
        np.testing.assert_array_equal(np.asarray(valid2), np.asarray(valid))
        err = np.abs(np.asarray(pts2 - pts))[np.asarray(valid)]
        assert err.max() < 2e-3  # half-millimeter z quantization, scaled by x/z

    def test_zero_depth_invalid(self):
        intr = jnp.asarray([100.0, 100.0, 8.0, 8.0], jnp.float64)
        d = jnp.zeros((16, 16), jnp.uint16).at[3, 4].set(1500)
        pts, valid = depth_mod.backproject_depth(d, intr, jnp.float64(1e-3))
        assert int(valid.sum()) == 1
        assert bool(valid[3, 4])
        np.testing.assert_allclose(float(pts[3, 4, 2]), 1.5, atol=1e-9)
        np.testing.assert_allclose(np.asarray(pts)[~np.asarray(valid)], 0.0)


# the library transform the CLI's --depth flag uses — the equivalence test
# below must validate THAT path, not a private re-implementation
_clouds_to_depth = synth_mod.clouds_to_depth


class TestDepthModeEngine:
    def test_depth_mode_matches_cloud_mode(self):
        """Replaying u16 depth events must land on (nearly) the same
        trajectory as replaying the equivalent organized clouds."""
        kw = dict(seed=3, n_steps=360, sensor_every=5, drift_noise=0.008, loops=2.0)
        log_c = synth_mod.make_synthetic_log(**kw)
        log_d = _clouds_to_depth(synth_mod.make_synthetic_log(**kw))

        gt_t = np.array([e.t for e in log_c.gt])
        gt_xyz = np.stack([e.pose7[:3] for e in log_c.gt])

        ates = {}
        counts = {}
        for name, log in (("cloud", log_c), ("depth", log_d)):
            eng = SlamEngine(e2e_config())
            replay_mod.replay(log, eng)
            kf_t = np.array([k.stamp for k in eng.keyframes])
            kf_xyz = eng.get_keyframe_poses()[:, :3]
            ates[name] = ate_mod.ate_rmse(kf_t, kf_xyz, gt_t, gt_xyz, align=False)
            counts[name] = (int(eng.graph.num_landmarks), int(eng.graph.num_lme))

        assert counts["depth"] == counts["cloud"]
        # 1 mm depth quantization: trajectories agree to well under a cm
        assert abs(ates["depth"] - ates["cloud"]) < 0.01
        assert ates["depth"] < 0.35

    def test_depth_log_npz_round_trip(self, tmp_path):
        log = _clouds_to_depth(
            synth_mod.make_synthetic_log(seed=1, n_steps=40, sensor_every=5)
        )
        p = str(tmp_path / "log.npz")
        replay_mod.save_log(p, log)
        log2 = replay_mod.load_log(p)
        assert len(log2.depths) == len(log.depths)
        np.testing.assert_array_equal(log2.depths[0].depth, log.depths[0].depth)
        np.testing.assert_allclose(log2.depths[0].intrinsics, log.depths[0].intrinsics)
