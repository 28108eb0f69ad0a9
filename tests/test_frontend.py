"""Frontend tests on synthetic organized clouds with known plane geometry."""

import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.core import frames
from semantic_slam_tpu.frontend import normals as nrm_mod
from semantic_slam_tpu.frontend import planes as planes_mod
from semantic_slam_tpu.frontend import segmentation as seg_mod

H, W = 240, 320
FX = FY = 300.0
CX, CY = W / 2, H / 2


def synth_cloud():
    """Top half: fronto-parallel wall at z=3 (cam normal (0,0,-1)).
    Bottom half: horizontal 'table' 0.3m below the optical axis
    (cam normal (0,-1,0), plane -y + 0.3 = 0)."""
    u = np.arange(W)[None, :].repeat(H, 0)
    v = np.arange(H)[None, :].repeat(W, 0).T
    dirx = (u - CX) / FX
    diry = (v - CY) / FY
    z = np.full((H, W), 3.0)
    table = v >= CY + 10
    with np.errstate(divide="ignore"):
        z_table = 0.3 / np.where(diry > 0, diry, np.nan)
    z = np.where(table, z_table, z)
    valid = np.isfinite(z) & (z > 0.1) & (z < 12.0)
    z = np.nan_to_num(z, nan=0.0)
    pts = np.stack([dirx * z, diry * z, z], axis=-1)
    return jnp.asarray(pts, jnp.float64), jnp.asarray(valid)


class TestNormals:
    def test_wall_normals(self):
        pts, valid = synth_cloud()
        n, nv = nrm_mod.compute_normals(pts, valid, smoothing_size=10)
        # interior wall pixel
        region = np.asarray(n[40:80, 100:220])
        ok = np.asarray(nv[40:80, 100:220])
        assert ok.mean() > 0.9
        mean_n = region[ok].mean(axis=0)
        np.testing.assert_allclose(mean_n, [0, 0, -1], atol=0.05)

    def test_table_normals(self):
        pts, valid = synth_cloud()
        n, nv = nrm_mod.compute_normals(pts, valid, smoothing_size=10)
        region = np.asarray(n[170:220, 100:220])
        ok = np.asarray(nv[170:220, 100:220])
        assert ok.mean() > 0.8
        mean_n = region[ok].mean(axis=0)
        mean_n /= np.linalg.norm(mean_n)
        np.testing.assert_allclose(mean_n, [0, -1, 0], atol=0.08)


def run_extract(bbox, expect_normal, expect_d):
    pts, valid = synth_cloud()
    n, nv = nrm_mod.compute_normals(pts, valid, smoothing_size=10)
    p, nr, ok = seg_mod._bbox_sample(
        pts, valid, n, nv, jnp.asarray(bbox, jnp.float64), 64, 64
    )
    # robot level pose: horizontal (world z) normal in cam
    h_cam = frames.horizontal_plane_normal_in_cam(jnp.zeros(6, jnp.float64), 0.0)[:3]
    count_scale = bbox[2] * bbox[3] / (64.0 * 64.0)
    ps = planes_mod.extract_planes(
        p,
        nr,
        ok,
        h_cam,
        jnp.asarray(count_scale, jnp.float64),
        jnp.asarray(200.0, jnp.float64),
        jnp.asarray(0.01, jnp.float64),
        jnp.asarray(0.05, jnp.float64),
        jnp.asarray(np.cos(np.deg2rad(8.0)), jnp.float64),
        max_planes=2,
        num_hypotheses=64,
    )
    return ps


class TestPlaneExtraction:
    def test_wall_plane(self):
        ps = run_extract([100, 30, 140, 70], [0, 0, -1], 3.0)
        v = np.asarray(ps.valid)
        assert v[0]
        n = np.asarray(ps.coeffs[0])
        # vertical wall: classified vertical (flag 1); reference flips so
        # that coeff[0] <= 0 — here n ~ (0,0,-1) already
        assert int(ps.hv_flag[0]) == 1
        np.testing.assert_allclose(np.abs(n[2]), 1.0, atol=0.02)
        np.testing.assert_allclose(abs(n[3]), 3.0, atol=0.05)
        c = np.asarray(ps.centroid[0])
        np.testing.assert_allclose(c[2], 3.0, atol=0.05)
        # area: bbox 140x70 px at z=3 -> (140/300*3)*(70/300*3) = 0.98 m^2
        assert 0.6 < float(ps.area[0]) < 1.6

    def test_table_plane(self):
        ps = run_extract([80, 150, 160, 60], [0, -1, 0], 0.3)
        assert bool(ps.valid[0])
        n = np.asarray(ps.coeffs[0])
        assert int(ps.hv_flag[0]) == 0  # horizontal
        np.testing.assert_allclose(np.abs(n[1]), 1.0, atol=0.05)
        # canonicalization: horizontal planes flipped so n[1] <= 0
        assert n[1] <= 0
        c = np.asarray(ps.centroid[0])
        # centroid lies on the plane -y + 0.3 = 0
        np.testing.assert_allclose(c[1], 0.3, atol=0.03)


class TestSegmentAll:
    def test_two_detections(self):
        pts, valid = synth_cloud()
        boxes = jnp.asarray(
            [[100, 30, 140, 70], [80, 150, 160, 60], [0, 0, 0, 0]], jnp.float64
        )
        class_ids = jnp.asarray([1, 0, -1], jnp.int32)  # tvmonitor, chair, none
        probs = jnp.asarray([0.9, 0.8, 0.0], jnp.float64)
        out = seg_mod.segment_all(
            pts,
            valid,
            boxes,
            class_ids,
            probs,
            jnp.zeros(6, jnp.float64),
            jnp.asarray(0.0, jnp.float64),
            num_point_seg=jnp.asarray(200.0, jnp.float64),
            norm_point_thres=jnp.asarray(1000.0, jnp.float64),
            planar_area=jnp.asarray(0.01, jnp.float64),
            distance_thres=jnp.asarray(0.05, jnp.float64),
            cos_angular_thres=jnp.asarray(np.cos(np.deg2rad(8.0)), jnp.float64),
            samp_h=64,
            samp_w=64,
            max_planes=2,
            num_hypotheses=64,
            smoothing_size=10,
        )
        valid_out = np.asarray(out.valid)
        cid = np.asarray(out.class_id)
        ptype = np.asarray(out.plane_type)
        # detection 0 (wall) produced a vertical plane of class 1
        assert valid_out[0] and cid[0] == 1 and ptype[0] == 1
        # detection 1 (table) produced a horizontal plane of class 0
        i1 = 2  # first plane slot of detection 1 (max_planes=2)
        assert valid_out[i1] and cid[i1] == 0 and ptype[i1] == 0
        # absent detection produced nothing
        assert not valid_out[4] and not valid_out[5]

        # world pose of the wall: with identity robot pose, cam (x,y,z) ->
        # world ~ (z, -x, -y); wall centroid z~3 -> world x ~ 3
        np.testing.assert_allclose(np.asarray(out.world_pose[0])[0], 3.0, atol=0.1)
        # table at y_cam ~ +0.3 (down) -> world z ~ -0.3
        np.testing.assert_allclose(np.asarray(out.world_pose[i1])[2], -0.3, atol=0.05)

    def test_spurious_and_threshold_gates(self):
        pts, valid = synth_cloud()
        boxes = jnp.asarray(
            [
                [200, 30, 200, 70],  # exceeds right edge -> spurious
                [80, 150, 20, 20],  # 400 px < norm_point_thres -> rejected
            ],
            jnp.float64,
        )
        out = seg_mod.segment_all(
            pts,
            valid,
            boxes,
            jnp.asarray([0, 0], jnp.int32),
            jnp.asarray([0.9, 0.9], jnp.float64),
            jnp.zeros(6, jnp.float64),
            jnp.asarray(0.0, jnp.float64),
            num_point_seg=jnp.asarray(100.0, jnp.float64),
            norm_point_thres=jnp.asarray(1000.0, jnp.float64),
            planar_area=jnp.asarray(0.0, jnp.float64),
            distance_thres=jnp.asarray(0.05, jnp.float64),
            cos_angular_thres=jnp.asarray(np.cos(np.deg2rad(8.0)), jnp.float64),
            samp_h=64,
            samp_w=64,
            max_planes=2,
            num_hypotheses=64,
            smoothing_size=10,
        )
        assert not np.asarray(out.valid).any()


class TestAdaptiveNormals:
    def _two_plane_scene(self):
        """Two fronto-parallel planes with a depth step at column W/2."""
        import jax.numpy as jnp

        H, W = 48, 64
        fx = 60.0
        cx, cy = W / 2, H / 2
        u = np.arange(W)[None, :].repeat(H, 0)
        v = np.arange(H)[:, None].repeat(W, 1)
        z = np.where(u < W // 2, 1.0, 2.0)
        pts = np.stack([(u - cx) * z / fx, (v - cy) * z / fx, z], -1)
        return jnp.asarray(pts, jnp.float64), jnp.ones((H, W), bool)

    def test_adaptive_recovers_more_pixels_at_step(self):
        """Fixed windows invalidate a band around the depth step; adaptive
        windows shrink instead, keeping normals valid closer to the edge —
        and the recovered normals still point along -z."""
        from semantic_slam_tpu.frontend import normals as nrm

        pts, valid = self._two_plane_scene()
        n_f, v_f = nrm.compute_normals(pts, valid, smoothing_size=16)
        n_a, v_a = nrm.compute_normals_adaptive(pts, valid, smoothing_size=16)
        band = np.s_[8:-8, 24:40]  # rows away from border, cols around step
        assert int(np.asarray(v_a)[band].sum()) > int(np.asarray(v_f)[band].sum())
        # normals on valid pixels near the step face the camera (-z)
        va = np.asarray(v_a)[band]
        nz = np.asarray(n_a)[band][..., 2]
        assert (np.abs(nz[va]) > 0.95).all()

    def test_adaptive_matches_fixed_on_smooth_scene(self, rng):
        """No discontinuities -> largest window always selected -> identical
        to the fixed-window path."""
        import jax.numpy as jnp

        from semantic_slam_tpu.frontend import normals as nrm

        H, W = 40, 48
        u = np.arange(W)[None, :].repeat(H, 0)
        v = np.arange(H)[:, None].repeat(W, 1)
        z = 2.0 + 0.002 * u  # gentle slope, below the depth-change threshold
        pts = jnp.asarray(np.stack([u * 0.01, v * 0.01, z], -1), jnp.float64)
        valid = jnp.ones((H, W), bool)
        n_f, v_f = nrm.compute_normals(pts, valid, smoothing_size=8)
        n_a, v_a = nrm.compute_normals_adaptive(pts, valid, smoothing_size=8)
        np.testing.assert_array_equal(np.asarray(v_a), np.asarray(v_f))
        np.testing.assert_allclose(np.asarray(n_a), np.asarray(n_f), atol=1e-12)
