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


class TestMergePlanes:
    def _plane_session(self, rng, offset):
        from semantic_slam_tpu.graph import planes as planes_ext
        from semantic_slam_tpu.solver.plane_ba import observe_plane

        lms = [[1.0, 1.0, 0.5], [3.0, -1.0, 0.2]]
        g, t, gt = make_session(rng, offset, lms, [0, 1])
        # one plane patch per landmark (engine invariant: plane i == lm i)
        pn = planes_ext.make_planes(8, 32, dtype=jnp.float64)
        pws = [
            jnp.asarray([0.0, 0.0, 1.0, -0.5], jnp.float64),
            jnp.asarray([1.0, 0.0, 0.0, -3.0], jnp.float64),
        ]
        info3 = jnp.eye(3, dtype=jnp.float64) * 25.0
        for pw in pws:
            pn, pid = planes_ext.add_plane_node(pn, pw)
            for k in range(0, int(g.num_poses), 2):
                pn = planes_ext.add_se3_plane_edge(
                    pn, k, pid, observe_plane(gt[k], pw), info3
                )
        return g, t, pn

    def test_planes_unify_and_joint_ba(self, rng):
        from semantic_slam_tpu.parallel.sharded import make_mesh

        g1, t1, pn1 = self._plane_session(rng, 0.0)
        g2, t2, pn2 = self._plane_session(rng, 0.5)
        merged, pn_m, owner = ms.merge_graphs_planes(
            [g1, g2], [t1, t2], [pn1, pn2], merge_radius=0.8
        )
        # plane nodes unified 1:1 with landmarks; edges from both sessions
        assert int(pn_m.num_planes) == int(merged.num_landmarks) == 2
        n_pe = int(pn_m.num_pe)
        assert n_pe == int(pn1.num_pe) + int(pn2.num_pe)
        ks = np.asarray(pn_m.pe_k)[:n_pe]
        assert ks.max() >= int(g1.num_poses)  # session-2 edges re-offset
        assert np.asarray(pn_m.pe_p)[:n_pe].max() < 2

        out, pn_o, stats = ms.joint_bundle_adjust_planes(merged, pn_m)
        assert float(stats.chi2_final) < float(stats.chi2_initial)

        mesh = make_mesh(4)
        out_s, pn_s, stats_s = ms.joint_bundle_adjust_planes(
            merged, pn_m, mesh=mesh, max_iterations=20
        )
        assert float(stats_s.chi2_final) < float(stats_s.chi2_initial)
        n_act = int(merged.num_poses)
        g_1c, pn_1c, s_1c = ms.joint_bundle_adjust_planes(
            merged, pn_m, max_iterations=20
        )
        # sharded lands on a consistent joint solution
        assert np.isfinite(np.asarray(out_s.poses)[:n_act]).all()
