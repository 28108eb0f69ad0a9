"""Plane landmarks in the production Schur solver (graph/planes.py)."""

import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.core import geometry as geo
from semantic_slam_tpu.graph import planes as gp
from semantic_slam_tpu.solver import lm as lm_mod
from semantic_slam_tpu.solver.plane_ba import observe_plane
from tests.test_solver import build_chain_graph


def with_plane_observations(rng, g, gt_poses, planes_world, noise=0.0):
    pn = gp.make_planes(8, 64, dtype=jnp.float64)
    info3 = jnp.eye(3, dtype=jnp.float64) * 100.0
    for pw in planes_world:
        pw = jnp.asarray(pw, jnp.float64)
        pn, pid = gp.add_plane_node(pn, pw)  # init at truth or perturbed later
        for k in range(gt_poses.shape[0]):
            z = observe_plane(gt_poses[k], pw)
            if noise > 0:
                z = z + jnp.asarray(rng.normal(size=4) * noise, jnp.float64)
            pn = gp.add_se3_plane_edge(pn, k, pid, z, info3)
    return pn


class TestNoPlanesIdentical:
    def test_empty_planes_matches_point_solver(self, rng):
        g, _, _ = build_chain_graph(rng, noise=0.05)
        pn = gp.make_planes(8, 64, dtype=jnp.float64)
        g1, s1 = lm_mod.lm_optimize(g)
        g2, pn2, s2 = gp.lm_optimize_with_planes(g, pn)
        np.testing.assert_allclose(np.asarray(g2.poses), np.asarray(g1.poses), atol=1e-10)
        np.testing.assert_allclose(float(s2.chi2_final), float(s1.chi2_final), rtol=1e-9)


class TestJointOptimization:
    def test_planes_tighten_the_solution(self, rng):
        g, gt_poses, _ = build_chain_graph(rng, noise=0.05)
        planes = [[1.0, 0.0, 0.0, -6.0], [0.0, 0.0, 1.0, 1.5]]
        pn = with_plane_observations(rng, g, gt_poses, planes)
        # perturb the plane initial estimates
        pn = pn._replace(
            planes=pn.planes.at[0, 3].add(0.2).at[1, 3].add(-0.15)
        )
        n = gt_poses.shape[0]
        g_pt, s_pt = lm_mod.lm_optimize(g)
        g_j, pn_j, s_j = gp.lm_optimize_with_planes(g, pn)
        err_pt = np.linalg.norm(np.asarray(g_pt.poses[:n, :3] - gt_poses[:, :3]), axis=1).mean()
        err_j = np.linalg.norm(np.asarray(g_j.poses[:n, :3] - gt_poses[:, :3]), axis=1).mean()
        assert float(s_j.chi2_final) < float(s_j.chi2_initial) * 0.1
        # extra plane constraints should not hurt, usually help
        assert err_j <= err_pt * 1.05

    def test_plane_parameters_recovered(self, rng):
        g, gt_poses, _ = build_chain_graph(rng, noise=0.03)
        truth = [[0.0, 1.0, 0.0, -3.0]]
        pn = with_plane_observations(rng, g, gt_poses, truth)
        pn = pn._replace(planes=pn.planes.at[0].set(jnp.asarray([0.05, 0.99, 0.05, -2.7], jnp.float64)))
        pn = pn._replace(
            planes=pn.planes.at[0, :3].set(
                pn.planes[0, :3] / jnp.linalg.norm(pn.planes[0, :3])
            )
        )
        g_j, pn_j, s_j = gp.lm_optimize_with_planes(g, pn)
        got = np.asarray(pn_j.planes[0])
        sign = np.sign(got[:3] @ np.asarray(truth[0][:3]))
        np.testing.assert_allclose(got[:3] * sign, truth[0][:3], atol=0.03)
        np.testing.assert_allclose(got[3] * sign, truth[0][3], atol=0.1)

    def test_unit_normals_preserved(self, rng):
        g, gt_poses, _ = build_chain_graph(rng, noise=0.05)
        pn = with_plane_observations(rng, g, gt_poses, [[1.0, 0, 0, -5.0]], noise=0.01)
        g_j, pn_j, _ = gp.lm_optimize_with_planes(g, pn)
        nrm = np.linalg.norm(np.asarray(pn_j.planes[:, :3]), axis=1)
        np.testing.assert_allclose(nrm, 1.0, atol=1e-9)


class TestPCGPlanesPath:
    def test_pcg_planes_matches_dense_planes(self, rng):
        """Matrix-free planar-patch LM converges to the dense path's optimum."""
        from semantic_slam_tpu.solver import pcg as pcg_mod

        g, gt_poses, _ = build_chain_graph(rng, noise=0.05)
        planes = [[1.0, 0.0, 0.0, -6.0], [0.0, 0.0, 1.0, 1.5]]
        pn = with_plane_observations(rng, g, gt_poses, planes, noise=0.005)
        pn = pn._replace(planes=pn.planes.at[0, 3].add(0.2).at[1, 3].add(-0.15))

        g_d, pn_d, s_d = gp.lm_optimize_with_planes(g, pn)
        g_p, pn_p, s_p = pcg_mod.lm_optimize_pcg_planes(g, pn, max_cg_iters=256)
        assert float(s_p.chi2_final) < float(s_p.chi2_initial) * 0.1
        np.testing.assert_allclose(
            float(s_p.chi2_final), float(s_d.chi2_final), rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(g_p.poses[:6, :3]), np.asarray(g_d.poses[:6, :3]), atol=1e-3
        )

    def test_pcg_planes_empty_matches_point_pcg(self, rng):
        from semantic_slam_tpu.solver import pcg as pcg_mod

        g, _, _ = build_chain_graph(rng, noise=0.05)
        pn = gp.make_planes(8, 64, dtype=jnp.float64)
        g1, s1 = pcg_mod.lm_optimize_pcg(g)
        g2, _, s2 = pcg_mod.lm_optimize_pcg_planes(g, pn)
        np.testing.assert_allclose(np.asarray(g2.poses), np.asarray(g1.poses), atol=1e-9)
        np.testing.assert_allclose(float(s2.chi2_final), float(s1.chi2_final), rtol=1e-8)

    def test_sharded_pcg_planes_matches_single(self, rng):
        from semantic_slam_tpu.parallel import sharded as sh
        from semantic_slam_tpu.solver import pcg as pcg_mod

        cpu_mesh8 = sh.make_mesh(8)
        g, gt_poses, _ = build_chain_graph(rng, noise=0.05)
        planes = [[1.0, 0.0, 0.0, -6.0]]
        pn = with_plane_observations(rng, g, gt_poses, planes, noise=0.005)
        g_s, pn_s, s_s = pcg_mod.sharded_lm_optimize_pcg_planes(g, pn, cpu_mesh8)
        g_1, pn_1, s_1 = pcg_mod.lm_optimize_pcg_planes(g, pn)
        np.testing.assert_allclose(
            float(s_s.chi2_final), float(s_1.chi2_final), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(g_s.poses), np.asarray(g_1.poses), atol=1e-6
        )


class TestRobustPlaneEdges:
    def test_huber_downweights_outlier_plane_obs(self, rng):
        """A grossly wrong plane observation must pull the solution less
        under Huber than under pure least squares."""
        g, gt_poses, _ = build_chain_graph(rng, noise=0.02)
        truth = [[0.0, 1.0, 0.0, -3.0]]
        pn = with_plane_observations(rng, g, gt_poses, truth, noise=0.002)
        # corrupt ONE observation's offset by 2 m
        pn = pn._replace(pe_meas=pn.pe_meas.at[2, 3].add(2.0))

        g_ls, pn_ls, _ = gp.lm_optimize_with_planes(g, pn)
        g_hb, pn_hb, _ = gp.lm_optimize_with_planes(
            g, pn, robust_kind="huber", robust_delta=1.0
        )
        d_truth = np.asarray(truth[0][3])

        def off_err(p):
            got = np.asarray(p.planes[0])
            s = np.sign(got[:3] @ np.asarray(truth[0][:3]))
            return abs(got[3] * s - d_truth)

        assert off_err(pn_hb) < off_err(pn_ls)

    def test_robust_none_matches_baseline(self, rng):
        g, gt_poses, _ = build_chain_graph(rng, noise=0.05)
        pn = with_plane_observations(rng, g, gt_poses, [[1.0, 0, 0, -6.0]], noise=0.005)
        g1, pn1, s1 = gp.lm_optimize_with_planes(g, pn)
        g2, pn2, s2 = gp.lm_optimize_with_planes(g, pn, robust_kind="none")
        np.testing.assert_allclose(np.asarray(g1.poses), np.asarray(g2.poses))

    def test_pcg_robust_matches_dense_robust(self, rng):
        from semantic_slam_tpu.solver import pcg as pcg_mod

        g, gt_poses, _ = build_chain_graph(rng, noise=0.03)
        pn = with_plane_observations(rng, g, gt_poses, [[0.0, 1.0, 0.0, -3.0]], noise=0.002)
        pn = pn._replace(pe_meas=pn.pe_meas.at[2, 3].add(2.0))
        g_d, pn_d, s_d = gp.lm_optimize_with_planes(
            g, pn, robust_kind="dcs", robust_delta=2.0
        )
        g_p, pn_p, s_p = pcg_mod.lm_optimize_pcg_planes(
            g, pn, max_cg_iters=256, robust_kind="dcs", robust_delta=2.0
        )
        np.testing.assert_allclose(
            float(s_p.chi2_final), float(s_d.chi2_final), rtol=1e-3
        )


def test_plane_linearize_matmul_matches_scatter():
    """One-hot matmul assembly of the plane-extended dense linearization
    (graph/planes.py) equals the scatter path (solver/assembly.py)."""
    import numpy as np

    from __graft_entry__ import _build_graph
    from semantic_slam_tpu.graph import planes as planes_ext
    from semantic_slam_tpu.solver.plane_ba import observe_plane

    g = _build_graph(K=48, L=16, E2=160, dtype=jnp.float64, seed=3, noise=0.02)
    pn = planes_ext.make_planes(4, 32, dtype=jnp.float64)
    pw = jnp.asarray([0.0, 0.0, 1.0, -1.2], jnp.float64)
    pn, pid = planes_ext.add_plane_node(pn, pw)
    info3 = jnp.eye(3, dtype=jnp.float64) * 25.0
    for k in range(0, 12, 2):
        pn = planes_ext.add_se3_plane_edge(
            pn, k, pid, observe_plane(g.poses[k], pw), info3
        )
    a = planes_ext.linearize_with_planes(g, pn, assembly="scatter")
    b = planes_ext.linearize_with_planes(g, pn, assembly="matmul")
    for name in ("Hpp", "W", "Hll", "gp", "gl", "chi2"):
        np.testing.assert_allclose(
            np.asarray(getattr(b, name)), np.asarray(getattr(a, name)), atol=1e-10
        )
