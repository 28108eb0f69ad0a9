"""Multi-session merge + joint BA tests (incl. sharded on the CPU mesh)."""

import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.core import geometry as geo
from semantic_slam_tpu.graph import residuals as res
from semantic_slam_tpu.graph import state as gs
from semantic_slam_tpu.runtime import multisession as ms


class FakeTable:
    def __init__(self, class_id, plane_type):
        self.class_id = jnp.asarray(class_id, jnp.int32)
        self.plane_type = jnp.asarray(plane_type, jnp.int32)


def make_session(rng, offset, lm_worlds, classes, n_poses=6, noise=0.02):
    dtype = jnp.float64
    g = gs.make_graph(16, 8, 16, 64, dtype=dtype)
    info6 = jnp.eye(6, dtype=dtype) * 100.0
    info3 = jnp.eye(3, dtype=dtype) * 50.0
    gt = [geo.pose_make(jnp.asarray([offset, 0.0, 0.0]), geo.quat_identity(dtype))]
    for i in range(n_poses - 1):
        gt.append(geo.pose_retract(gt[-1], jnp.asarray([0.8, 0, 0, 0, 0, 0.1], dtype)))
    cur = gt[0]
    g, _ = gs.add_se3_node(g, cur)
    for i in range(1, n_poses):
        rel = geo.pose_mul(geo.pose_inv(gt[i - 1]), gt[i])
        reln = geo.pose_retract(rel, jnp.asarray(rng.normal(size=6) * noise, dtype))
        cur = geo.pose_mul(cur, reln)
        g, _ = gs.add_se3_node(g, cur)
        g = gs.add_se3_edge(g, i - 1, i, reln, info6)
    for li, lw in enumerate(lm_worlds):
        g, lid = gs.add_point_node(g, jnp.asarray(lw, dtype))
        for k in range(n_poses):
            z = res.se3_point_residual(gt[k], jnp.asarray(lw, dtype), jnp.zeros(3, dtype))
            g = gs.add_se3_point_edge(g, k, lid, z, info3)
    table = FakeTable(classes, [0] * len(lm_worlds))
    return g, table, jnp.stack(gt)


class TestMerge:
    def test_shared_landmarks_unify(self, rng):
        lms = [[1.0, 1.0, 0.5], [3.0, -1.0, 0.2]]
        g1, t1, _ = make_session(rng, 0.0, lms, [0, 1])
        g2, t2, _ = make_session(rng, 0.5, lms, [0, 1])
        merged, owner = ms.merge_graphs([g1, g2], [t1, t2], merge_radius=0.8)
        # both sessions' landmarks unified: 2 total, owned by session 0
        assert int(merged.num_landmarks) == 2
        assert (owner == 0).all()
        assert int(merged.num_poses) == int(g1.num_poses) + int(g2.num_poses)
        assert int(merged.num_lme) == int(g1.num_lme) + int(g2.num_lme)

    def test_distinct_landmarks_stay_separate(self, rng):
        g1, t1, _ = make_session(rng, 0.0, [[1.0, 1.0, 0.5]], [0])
        g2, t2, _ = make_session(rng, 0.0, [[5.0, 5.0, 0.5]], [0])
        merged, owner = ms.merge_graphs([g1, g2], [t1, t2], merge_radius=0.8)
        assert int(merged.num_landmarks) == 2

    def test_class_mask_blocks_merge(self, rng):
        g1, t1, _ = make_session(rng, 0.0, [[1.0, 1.0, 0.5]], [0])
        g2, t2, _ = make_session(rng, 0.0, [[1.0, 1.0, 0.5]], [3])
        merged, _ = ms.merge_graphs([g1, g2], [t1, t2], merge_radius=0.8)
        assert int(merged.num_landmarks) == 2

    def test_joint_ba_reduces_chi2(self, rng):
        lms = [[1.0, 1.0, 0.5], [3.0, -1.0, 0.2], [2.0, 2.0, 1.0]]
        g1, t1, _ = make_session(rng, 0.0, lms, [0, 1, 5], noise=0.05)
        g2, t2, _ = make_session(rng, 0.0, lms, [0, 1, 5], noise=0.05)
        merged, _ = ms.merge_graphs([g1, g2], [t1, t2], merge_radius=0.8)
        out, stats = ms.joint_bundle_adjust(merged)
        assert float(stats.chi2_final) < float(stats.chi2_initial)

    def test_joint_ba_sharded_matches(self, rng):
        import jax

        from semantic_slam_tpu.parallel.sharded import make_mesh

        lms = [[1.0, 1.0, 0.5], [3.0, -1.0, 0.2]]
        g1, t1, _ = make_session(rng, 0.0, lms, [0, 1], noise=0.05)
        g2, t2, _ = make_session(rng, 0.3, lms, [0, 1], noise=0.05)
        merged, _ = ms.merge_graphs([g1, g2], [t1, t2], merge_radius=0.8)
        out1, s1 = ms.joint_bundle_adjust(merged)
        mesh = make_mesh(4)
        out2, s2 = ms.joint_bundle_adjust(merged, mesh=mesh)
        np.testing.assert_allclose(
            np.asarray(out2.poses), np.asarray(out1.poses), atol=1e-8
        )
