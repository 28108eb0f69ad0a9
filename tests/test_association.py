"""Association semantics tests: first-frame mapping, NN gating, class/plane
masks, Mahalanobis vs Euclidean, intra-frame landmark visibility."""

import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.assoc import association as assoc
from semantic_slam_tpu.frontend.segmentation import DetectedObjects


def make_dets(poses_cam, class_ids, plane_types, valid=None):
    m = len(poses_cam)
    poses_cam = jnp.asarray(poses_cam, jnp.float64)
    return DetectedObjects(
        valid=jnp.asarray([True] * m if valid is None else valid),
        class_id=jnp.asarray(class_ids, jnp.int32),
        prob=jnp.ones((m,), jnp.float64),
        plane_type=jnp.asarray(plane_types, jnp.int32),
        num_points=jnp.full((m,), 500.0, jnp.float64),
        pose_cam=poses_cam,
        normal_cam=jnp.tile(jnp.asarray([0, 0, -1, 1.0], jnp.float64), (m, 1)),
        world_pose=jnp.zeros((m, 3), jnp.float64),
    )


def run_assoc(table, dets, use_maha=False, maha=1.5, eq=1.5, noise=0.4):
    return assoc.associate(
        table,
        dets,
        jnp.zeros(6, jnp.float64),
        jnp.asarray(0.0, jnp.float64),
        jnp.asarray(use_maha),
        jnp.asarray(maha, jnp.float64),
        jnp.asarray(eq, jnp.float64),
        jnp.asarray(noise, jnp.float64),
    )


class TestFirstFrame:
    def test_all_new_no_intra_matching(self):
        table = assoc.make_table(8, jnp.float64)
        # two detections of the same class at the same spot: first-frame path
        # maps BOTH as new landmarks (reference find_matches:79-85)
        dets = make_dets([[0, 0, 2.0], [0, 0, 2.0]], [0, 0], [0, 0])
        table, res = run_assoc(table, dets)
        assert int(table.count) == 2
        assert np.asarray(res.is_new).all()
        assert list(np.asarray(res.lm_id)) == [0, 1]

    def test_world_conversion(self):
        table = assoc.make_table(8, jnp.float64)
        # cam (0,0,2) with identity robot pose -> world ~ (2, 0, 0)
        dets = make_dets([[0, 0, 2.0]], [0], [0])
        table, res = run_assoc(table, dets)
        np.testing.assert_allclose(np.asarray(res.world_pose[0]), [2, 0, 0], atol=1e-3)
        np.testing.assert_allclose(np.asarray(table.world[0]), [2, 0, 0], atol=1e-3)


class TestMatching:
    def seeded_table(self):
        table = assoc.make_table(8, jnp.float64)
        dets = make_dets([[0, 0, 2.0]], [0], [0])
        table, _ = run_assoc(table, dets)
        return table

    def test_euclid_match_within_threshold(self):
        table = self.seeded_table()
        dets = make_dets([[0.3, 0, 2.0]], [0], [0])  # ~0.3m from landmark 0
        table, res = run_assoc(table, dets, eq=1.5)
        assert int(table.count) == 1
        assert not bool(res.is_new[0])
        assert int(res.lm_id[0]) == 0

    def test_euclid_new_beyond_threshold(self):
        table = self.seeded_table()
        dets = make_dets([[0, 0, 5.0]], [0], [0])  # 3m away
        table, res = run_assoc(table, dets, eq=1.5)
        assert int(table.count) == 2
        assert bool(res.is_new[0])

    def test_class_mask_prevents_match(self):
        table = self.seeded_table()
        dets = make_dets([[0, 0, 2.0]], [3], [0])  # different class, same spot
        table, res = run_assoc(table, dets)
        assert bool(res.is_new[0])
        assert int(table.count) == 2

    def test_plane_type_mask_prevents_match(self):
        table = self.seeded_table()
        dets = make_dets([[0, 0, 2.0]], [0], [1])  # vertical vs horizontal
        table, res = run_assoc(table, dets)
        assert bool(res.is_new[0])

    def test_intra_frame_matching_after_first(self):
        table = self.seeded_table()
        # detection 0 creates a new landmark far away; detection 1 at the same
        # place should match detection 0's landmark (reference grows the table
        # inside the loop)
        dets = make_dets([[0, 0, 8.0], [0.1, 0, 8.0]], [0, 0], [0, 0])
        table, res = run_assoc(table, dets, eq=1.5)
        assert bool(res.is_new[0])
        assert not bool(res.is_new[1])
        assert int(res.lm_id[1]) == int(res.lm_id[0]) == 1
        assert int(table.count) == 2

    def test_matched_does_not_move_landmark(self):
        table = self.seeded_table()
        before = np.asarray(table.world[0]).copy()
        dets = make_dets([[0.4, 0, 2.0]], [0], [0])
        table, res = run_assoc(table, dets, eq=1.5)
        np.testing.assert_allclose(np.asarray(table.world[0]), before)

    def test_invalid_detection_is_noop(self):
        table = self.seeded_table()
        dets = make_dets([[0, 0, 9.0]], [0], [0], valid=[False])
        table, res = run_assoc(table, dets)
        assert int(table.count) == 1
        assert not bool(res.is_new[0])


class TestMahalanobis:
    def test_tight_cov_rejects_far(self):
        table = self.make_seed()
        # with tiny covariance + Q=0.01, a 0.5m offset has huge Mahalanobis
        table = table._replace(cov=table.cov.at[0].set(jnp.eye(3, dtype=jnp.float64) * 1e-4))
        dets = make_dets([[0.5, 0, 2.0]], [0], [0])
        table, res = run_assoc(table, dets, use_maha=True, maha=1.5, noise=0.01)
        assert bool(res.is_new[0])

    def test_loose_cov_accepts_far(self):
        table = self.make_seed()
        table = table._replace(cov=table.cov.at[0].set(jnp.eye(3, dtype=jnp.float64) * 1.0))
        dets = make_dets([[0.5, 0, 2.0]], [0], [0])
        table, res = run_assoc(table, dets, use_maha=True, maha=1.5, noise=0.5)
        assert not bool(res.is_new[0])

    def make_seed(self):
        table = assoc.make_table(8, jnp.float64)
        dets = make_dets([[0, 0, 2.0]], [0], [0])
        table, _ = run_assoc(table, dets)
        return table


class TestSync:
    def test_sync_from_graph(self):
        table = assoc.make_table(4, jnp.float64)
        dets = make_dets([[0, 0, 2.0]], [0], [0])
        table, _ = run_assoc(table, dets)
        glm = jnp.asarray(np.arange(12).reshape(4, 3), jnp.float64)
        marg = jnp.tile(jnp.eye(3, dtype=jnp.float64) * 0.25, (4, 1, 1))
        t2 = assoc.sync_from_graph(table, glm, marg)
        np.testing.assert_allclose(np.asarray(t2.world[0]), [0, 1, 2])
        # inactive rows untouched
        np.testing.assert_allclose(np.asarray(t2.world[1]), np.asarray(table.world[1]))
        np.testing.assert_allclose(np.asarray(t2.cov[0]), np.eye(3) * 0.25)


class TestPlaneGate:
    """Optional plane-aware gating: normals must agree in angle and offset."""

    def _dets_with_normal(self, poses_cam, normals_cam):
        m = len(poses_cam)
        return DetectedObjects(
            valid=jnp.asarray([True] * m),
            class_id=jnp.zeros((m,), jnp.int32),
            prob=jnp.ones((m,), jnp.float64),
            plane_type=jnp.zeros((m,), jnp.int32),
            num_points=jnp.full((m,), 500.0, jnp.float64),
            pose_cam=jnp.asarray(poses_cam, jnp.float64),
            normal_cam=jnp.asarray(normals_cam, jnp.float64),
            world_pose=jnp.zeros((m, 3), jnp.float64),
        )

    def _run(self, table, dets, use_gate, cos_thres=0.866, off_thres=0.5):
        return assoc.associate(
            table,
            dets,
            jnp.zeros(6, jnp.float64),
            jnp.asarray(0.0, jnp.float64),
            jnp.asarray(False),
            jnp.asarray(1.5, jnp.float64),
            jnp.asarray(1.5, jnp.float64),
            jnp.asarray(0.4, jnp.float64),
            use_plane_gate=jnp.asarray(use_gate),
            plane_cos_thres=jnp.asarray(cos_thres, jnp.float64),
            plane_offset_thres=jnp.asarray(off_thres, jnp.float64),
        )

    def test_gate_off_matches_centroid_only(self):
        table = assoc.make_table(8, jnp.float64)
        # seed landmark with normal along -z (cam)
        d0 = self._dets_with_normal([[0, 0, 2.0]], [[0, 0, -1, 1.0]])
        table, _ = self._run(table, d0, use_gate=False)
        # same centroid, orthogonal normal: centroid-only matches
        d1 = self._dets_with_normal([[0.1, 0, 2.0]], [[1, 0, 0, 1.0]])
        t_off, r_off = self._run(table, d1, use_gate=False)
        assert not bool(r_off.is_new[0])
        assert int(t_off.count) == 1

    def test_gate_on_rejects_orthogonal_normal(self):
        table = assoc.make_table(8, jnp.float64)
        d0 = self._dets_with_normal([[0, 0, 2.0]], [[0, 0, -1, 1.0]])
        table, _ = self._run(table, d0, use_gate=True)
        d1 = self._dets_with_normal([[0.1, 0, 2.0]], [[1, 0, 0, 1.0]])
        t_on, r_on = self._run(table, d1, use_gate=True)
        assert bool(r_on.is_new[0])  # orthogonal plane -> new landmark
        assert int(t_on.count) == 2

    def test_gate_accepts_same_plane(self):
        table = assoc.make_table(8, jnp.float64)
        d0 = self._dets_with_normal([[0, 0, 2.0]], [[0, 0, -1, 1.0]])
        table, _ = self._run(table, d0, use_gate=True)
        d1 = self._dets_with_normal([[0.1, 0, 2.0]], [[0, 0, -1, 1.0]])
        t_on, r_on = self._run(table, d1, use_gate=True)
        assert not bool(r_on.is_new[0])
        assert int(t_on.count) == 1

    def test_gate_sign_invariance(self):
        """(n, d) and (-n, -d) describe the same plane -> must match."""
        table = assoc.make_table(8, jnp.float64)
        d0 = self._dets_with_normal([[0, 0, 2.0]], [[0, 0, -1, 1.0]])
        table, _ = self._run(table, d0, use_gate=True)
        d1 = self._dets_with_normal([[0.1, 0, 2.0]], [[0, 0, 1, -1.0]])
        t_on, r_on = self._run(table, d1, use_gate=True)
        assert not bool(r_on.is_new[0])

    def test_gate_rejects_offset_mismatch_parallel_planes(self):
        """Two parallel planes ~1.2 m apart along the normal, centroids within
        the (loose) euclidean threshold -> gate splits them."""
        table = assoc.make_table(8, jnp.float64)
        d0 = self._dets_with_normal([[0, 0, 2.0]], [[0, 0, -1, 1.0]])
        table, _ = self._run(table, d0, use_gate=True, off_thres=0.5)
        # same normal, centroid shifted 1.2 m along the plane normal (world x)
        d1 = self._dets_with_normal([[0, 0, 3.2]], [[0, 0, -1, 1.0]])
        _, r_loose = self._run(table, d1, use_gate=False)
        t_on, r_on = self._run(table, d1, use_gate=True, off_thres=0.5)
        assert not bool(r_loose.is_new[0])  # centroid-only would merge (eq=1.5)
        assert bool(r_on.is_new[0])
