"""Filters + legacy k-means pipeline + plane-edge residual tests."""

import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.core import geometry as geo
from semantic_slam_tpu.frontend import filters, kmeans
from semantic_slam_tpu.graph import residuals as res


class TestFilters:
    def test_range_filter(self):
        pts = jnp.asarray([[0.1, 0, 0], [1.0, 0, 0], [5.0, 0, 0]])
        v = filters.range_filter(pts, jnp.ones(3, bool))
        assert list(np.asarray(v)) == [False, True, False]

    def test_voxel_downsample_merges_cluster(self, rng):
        # two tight clusters, each well inside one 0.1 m voxel
        a = rng.normal(size=(10, 3)) * 0.002 + [0.55, 0.55, 0.55]
        b = rng.normal(size=(5, 3)) * 0.002 + [1.29, 1.29, 1.29]
        pts = jnp.asarray(np.concatenate([a, b]))
        cent, keep = filters.voxel_downsample(pts, jnp.ones(15, bool), leaf=0.1)
        assert int(np.asarray(keep).sum()) == 2
        kept = np.asarray(cent)[np.asarray(keep)]
        got = kept[np.argsort(kept[:, 0])]
        np.testing.assert_allclose(got[0], a.mean(0), atol=1e-6)
        np.testing.assert_allclose(got[1], b.mean(0), atol=1e-6)

    def test_outlier_removal(self, rng):
        cluster = rng.normal(size=(60, 3)) * 0.05
        outlier = np.array([[5.0, 5.0, 5.0]])
        pts = jnp.asarray(np.concatenate([cluster, outlier]))
        keep = filters.statistical_outlier_removal(pts, jnp.ones(61, bool), mean_k=10)
        k = np.asarray(keep)
        assert not k[-1]
        assert k[:-1].mean() > 0.9


class TestKmeans:
    def test_recovers_clusters(self, rng):
        a = rng.normal(size=(100, 2)) * 0.1 + [0, 0]
        b = rng.normal(size=(100, 2)) * 0.1 + [5, 5]
        x = jnp.asarray(np.concatenate([a, b]))
        c, labels, comp = kmeans.kmeans(x, jnp.ones(200, bool), k=2)
        c = np.asarray(c)
        c = c[np.argsort(c[:, 0])]
        np.testing.assert_allclose(c[0], [0, 0], atol=0.1)
        np.testing.assert_allclose(c[1], [5, 5], atol=0.1)
        lab = np.asarray(labels)
        assert (lab[:100] == lab[0]).all() and (lab[100:] == lab[100]).all()

    def test_legacy_pipeline_finds_horizontal_plane(self, rng):
        # points on a "floor" plane, cam normal (0,-1,0), d = 0.5
        n = np.array([0.0, -1.0, 0.0])
        pts = rng.uniform(-1, 1, size=(2048, 3))
        pts[:, 1] = 0.5  # plane -y + 0.5 = 0 -> n.p + d = 0 with d = 0.5
        nrm = np.tile(n, (2048, 1)) + rng.normal(size=(2048, 3)) * 0.01
        h_cam = jnp.asarray([0.0, -1.0, 0.0])
        planes, counts, valid = kmeans.legacy_cluster_planes(
            jnp.asarray(pts), jnp.asarray(nrm), jnp.ones(2048, bool), h_cam,
            min_points=200,
        )
        v = np.asarray(valid)
        assert v.any()
        p = np.asarray(planes)[v][0]
        np.testing.assert_allclose(p[:3], n, atol=0.05)
        np.testing.assert_allclose(abs(p[3]), 0.5, atol=0.05)


class TestPlaneResidual:
    def test_zero_at_consistent_observation(self, rng):
        pose = geo.pose_retract(
            geo.pose_identity(jnp.float64), jnp.asarray(rng.normal(size=6), jnp.float64)
        )
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        d = 0.7
        # observation = plane transformed into the sensor frame
        R = np.asarray(geo.quat_to_rotmat(pose[3:]))
        t = np.asarray(pose[:3])
        meas = np.concatenate([R.T @ n, [d + n @ t]])
        r = res.se3_plane_residual(pose, jnp.asarray(np.append(n, d)), jnp.asarray(meas))
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-9)

    def test_sensitive_to_offsets(self):
        pose = geo.pose_identity(jnp.float64)
        plane = jnp.asarray([0.0, 0.0, 1.0, 2.0])
        meas = jnp.asarray([0.0, 0.0, 1.0, 2.5])
        r = np.asarray(res.se3_plane_residual(pose, plane, meas))
        np.testing.assert_allclose(r, [0, 0, -0.5], atol=1e-12)


class TestHullArea:
    def test_square_area(self, rng):
        from semantic_slam_tpu.frontend import hull

        # uniform square 2x1 in the z=0.5 plane
        pts = np.zeros((4096, 3))
        pts[:, 0] = rng.uniform(-1, 1, 4096)
        pts[:, 1] = rng.uniform(-0.5, 0.5, 4096)
        pts[:, 2] = 0.5
        a = float(
            hull.polygon_area(
                jnp.asarray(pts), jnp.ones(4096, bool), jnp.asarray([0.0, 0, 1.0])
            )
        )
        assert 1.6 < a < 2.1  # true area 2.0; binned boundary underestimates

    def test_disk_area(self, rng):
        from semantic_slam_tpu.frontend import hull

        r = np.sqrt(rng.uniform(0, 1, 4096))
        th = rng.uniform(0, 2 * np.pi, 4096)
        pts = np.stack([r * np.cos(th), r * np.sin(th), np.full(4096, 2.0)], axis=-1)
        a = float(
            hull.polygon_area(
                jnp.asarray(pts), jnp.ones(4096, bool), jnp.asarray([0.0, 0, 1.0])
            )
        )
        assert abs(a - np.pi) < 0.3

    def test_mask_respected(self, rng):
        from semantic_slam_tpu.frontend import hull

        pts = np.zeros((1024, 3))
        pts[:, 0] = rng.uniform(-1, 1, 1024)
        pts[:, 1] = rng.uniform(-1, 1, 1024)
        mask = np.abs(pts[:, 0]) < 0.2  # thin strip
        a = float(
            hull.polygon_area(
                jnp.asarray(pts), jnp.asarray(mask), jnp.asarray([0.0, 0, 1.0])
            )
        )
        assert a < 1.0  # strip ~0.8, full square 4.0
