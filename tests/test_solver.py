"""Solver tests: Jacobian correctness, Schur == dense solve, marginals ==
brute-force block inverse, and convergence on synthetic graphs."""

import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.core import geometry as geo
from semantic_slam_tpu.graph import residuals as res
from semantic_slam_tpu.graph import state as gs
from semantic_slam_tpu.solver import lm as lmsolve


def build_chain_graph(rng, n_poses=6, n_lms=4, noise=0.0, obs_per_pose=2, dtype=jnp.float64):
    """Ground-truth trajectory along +x with random yaw wiggle; landmarks
    scattered nearby; odometry and observations optionally corrupted."""
    gt_poses = [geo.pose_identity(dtype)]
    for _ in range(n_poses - 1):
        xi = jnp.asarray(
            np.concatenate([[1.0, 0, 0] + rng.normal(size=3) * 0.1, rng.normal(size=3) * 0.1]),
            dtype,
        )
        gt_poses.append(geo.pose_retract(gt_poses[-1], xi))
    gt_poses = jnp.stack(gt_poses)
    gt_lms = jnp.asarray(
        rng.uniform(-1, 1, size=(n_lms, 3)) + np.array([[2.0, 0, 0]]) * np.arange(n_lms)[:, None] / 2,
        dtype,
    )

    g = gs.make_graph(16, 8, 32, 64, dtype=dtype)
    info6 = jnp.eye(6, dtype=dtype) * 100.0
    info3 = jnp.eye(3, dtype=dtype) * 50.0

    # pose nodes initialised from noisy odometry integration
    cur = geo.pose_identity(dtype)
    g, _ = gs.add_se3_node(g, cur)
    for i in range(1, n_poses):
        rel = geo.pose_mul(geo.pose_inv(gt_poses[i - 1]), gt_poses[i])
        if noise > 0:
            rel = geo.pose_retract(rel, jnp.asarray(rng.normal(size=6) * noise, dtype))
        cur = geo.pose_mul(cur, rel)
        g, _ = gs.add_se3_node(g, cur)
        g = gs.add_se3_edge(g, i - 1, i, rel, info6)

    for l in range(n_lms):
        # initialise landmark from first observing pose's measurement
        first_obs = None
        for k in range(n_poses):
            z = res.se3_point_residual(gt_poses[k], gt_lms[l], jnp.zeros(3, dtype))
            if noise > 0:
                z = z + jnp.asarray(rng.normal(size=3) * noise, dtype)
            if first_obs is None:
                init = geo.pose_apply(g.poses[k], z)
                g, _ = gs.add_point_node(g, init)
                first_obs = k
            g = gs.add_se3_point_edge(g, k, l, z, info3)
    return g, gt_poses, gt_lms


class TestJacobians:
    def test_se3_edge_jacobian_vs_numeric(self, rng):
        dtype = jnp.float64
        pi = geo.pose_retract(geo.pose_identity(dtype), jnp.asarray(rng.normal(size=6), dtype))
        pj = geo.pose_retract(geo.pose_identity(dtype), jnp.asarray(rng.normal(size=6), dtype))
        meas = geo.pose_retract(geo.pose_identity(dtype), jnp.asarray(rng.normal(size=6) * 0.1, dtype))
        r, Ji, Jj = res.se3_edge_residual_jac(pi, pj, meas)
        eps = 1e-7
        for a in range(6):
            d = jnp.zeros(6, dtype).at[a].set(eps)
            num_i = (res.se3_edge_residual(geo.pose_retract(pi, d), pj, meas) - r) / eps
            num_j = (res.se3_edge_residual(pi, geo.pose_retract(pj, d), meas) - r) / eps
            np.testing.assert_allclose(np.asarray(Ji[:, a]), np.asarray(num_i), atol=1e-5)
            np.testing.assert_allclose(np.asarray(Jj[:, a]), np.asarray(num_j), atol=1e-5)

    def test_se3_edge_jacobian_analytic_vs_ad(self, rng):
        """Analytic (Barfoot Q-matrix) SE3-SE3 Jacobians == forward-AD, over
        random poses incl. near-identity residuals (small-angle branches)."""
        dtype = jnp.float64
        for scale in (1e-9, 1e-4, 0.1, 1.0, 2.5):
            pi = geo.pose_retract(
                geo.pose_identity(dtype), jnp.asarray(rng.normal(size=6), dtype)
            )
            pj = geo.pose_retract(pi, jnp.asarray(rng.normal(size=6) * scale, dtype))
            meas = geo.pose_retract(
                geo.pose_mul(geo.pose_inv(pi), pj),
                jnp.asarray(rng.normal(size=6) * scale * 0.3, dtype),
            )
            r_a, Ji_a, Jj_a = res.se3_edge_residual_jac(pi, pj, meas)
            r_d, Ji_d, Jj_d = res.se3_edge_residual_jac_ad(pi, pj, meas)
            np.testing.assert_allclose(np.asarray(r_a), np.asarray(r_d), atol=1e-12)
            np.testing.assert_allclose(np.asarray(Ji_a), np.asarray(Ji_d), atol=1e-8)
            np.testing.assert_allclose(np.asarray(Jj_a), np.asarray(Jj_d), atol=1e-8)

    def test_se3_point_jacobian_vs_numeric(self, rng):
        dtype = jnp.float64
        p = geo.pose_retract(geo.pose_identity(dtype), jnp.asarray(rng.normal(size=6), dtype))
        l = jnp.asarray(rng.normal(size=3), dtype)
        z = jnp.asarray(rng.normal(size=3), dtype)
        r, Jp, Jl = res.se3_point_residual_jac(p, l, z)
        eps = 1e-7
        for a in range(6):
            d = jnp.zeros(6, dtype).at[a].set(eps)
            num = (res.se3_point_residual(geo.pose_retract(p, d), l, z) - r) / eps
            np.testing.assert_allclose(np.asarray(Jp[:, a]), np.asarray(num), atol=1e-5)
        for a in range(3):
            d = jnp.zeros(3, dtype).at[a].set(eps)
            num = (res.se3_point_residual(p, l + d, z) - r) / eps
            np.testing.assert_allclose(np.asarray(Jl[:, a]), np.asarray(num), atol=1e-5)


class TestSchur:
    def test_schur_equals_dense_solve(self, rng):
        g, _, _ = build_chain_graph(rng, noise=0.05)
        lin = lmsolve.linearize(g)
        pose_free, lm_free = lmsolve._free_masks(g)
        lam = jnp.asarray(1e-3, jnp.float64)
        dp, dl = lmsolve.schur_solve(lin, pose_free, lm_free, lam)

        # brute force: assemble the full (active, free) system and solve
        K6 = lin.Hpp.shape[0]
        L3 = 3 * lin.Hll.shape[0]
        H = np.zeros((K6 + L3, K6 + L3))
        H[:K6, :K6] = np.asarray(lin.Hpp)
        H[:K6, K6:] = np.asarray(lin.W)
        H[K6:, :K6] = np.asarray(lin.W).T
        Hll = np.asarray(lin.Hll)
        for l in range(lin.Hll.shape[0]):
            H[K6 + 3 * l : K6 + 3 * l + 3, K6 + 3 * l : K6 + 3 * l + 3] = Hll[l]
        b = -np.concatenate([np.asarray(lin.gp), np.asarray(lin.gl)])
        free = np.concatenate(
            [np.repeat(np.asarray(pose_free), 6), np.repeat(np.asarray(lm_free), 3)]
        )
        idx = np.where(free)[0]
        Hf = H[np.ix_(idx, idx)] + float(lam) * np.eye(len(idx))
        x = np.zeros(K6 + L3)
        x[idx] = np.linalg.solve(Hf, b[idx])

        got = np.concatenate([np.asarray(dp).reshape(-1), np.asarray(dl).reshape(-1)])
        np.testing.assert_allclose(got, x, atol=1e-8)

    def test_marginals_match_bruteforce(self, rng):
        g, _, _ = build_chain_graph(rng, noise=0.05)
        sigma = np.asarray(lmsolve.landmark_marginals(g))

        lin = lmsolve.linearize(g)
        pose_free, lm_free = lmsolve._free_masks(g)
        K6 = lin.Hpp.shape[0]
        L = lin.Hll.shape[0]
        H = np.zeros((K6 + 3 * L, K6 + 3 * L))
        H[:K6, :K6] = np.asarray(lin.Hpp)
        H[:K6, K6:] = np.asarray(lin.W)
        H[K6:, :K6] = np.asarray(lin.W).T
        Hll = np.asarray(lin.Hll)
        for l in range(L):
            H[K6 + 3 * l : K6 + 3 * l + 3, K6 + 3 * l : K6 + 3 * l + 3] = Hll[l]
        free = np.concatenate(
            [np.repeat(np.asarray(pose_free), 6), np.repeat(np.asarray(lm_free), 3)]
        )
        idx = np.where(free)[0]
        Hinv = np.linalg.inv(H[np.ix_(idx, idx)])
        # map landmark block positions into the reduced index space
        nfree_pose = int(np.sum(pose_free)) * 6
        for li, l in enumerate(np.where(np.asarray(lm_free))[0]):
            blk = Hinv[
                nfree_pose + 3 * li : nfree_pose + 3 * li + 3,
                nfree_pose + 3 * li : nfree_pose + 3 * li + 3,
            ]
            np.testing.assert_allclose(sigma[l], blk, atol=1e-6)


class TestConvergence:
    def test_perfect_measurements_zero_chi2(self, rng):
        g, gt_poses, gt_lms = build_chain_graph(rng, noise=0.0)
        g2, stats = lmsolve.lm_optimize(g)
        assert float(stats.chi2_final) < 1e-10
        # with zero noise odometry integration == ground truth already
        np.testing.assert_allclose(
            np.asarray(g2.poses[: gt_poses.shape[0], :3]), np.asarray(gt_poses[:, :3]), atol=1e-6
        )

    def test_noisy_graph_reduces_chi2_and_error(self, rng):
        g, gt_poses, gt_lms = build_chain_graph(rng, noise=0.03)
        n = gt_poses.shape[0]
        err_before = np.linalg.norm(np.asarray(g.poses[:n, :3] - gt_poses[:, :3]), axis=1).mean()
        g2, stats = lmsolve.lm_optimize(g)
        assert float(stats.chi2_final) < float(stats.chi2_initial) * 0.5
        err_after = np.linalg.norm(np.asarray(g2.poses[:n, :3] - gt_poses[:, :3]), axis=1).mean()
        assert err_after < err_before

    def test_min_edges_gate(self, rng):
        dtype = jnp.float64
        g = gs.make_graph(8, 4, 8, 8, dtype=dtype)
        g, _ = gs.add_se3_node(g, geo.pose_identity(dtype))
        g, _ = gs.add_se3_node(g, geo.pose_retract(geo.pose_identity(dtype), jnp.ones(6, dtype) * 0.1))
        g = gs.add_se3_edge(g, 0, 1, geo.pose_identity(dtype), jnp.eye(6, dtype=dtype))
        g2, stats = lmsolve.lm_optimize(g)
        # fewer than 10 edges: untouched (graph_slam.cpp:184-186 semantics)
        assert int(stats.iterations) == 0
        np.testing.assert_allclose(np.asarray(g2.poses), np.asarray(g.poses))

    def test_loop_closure_corrects_drift(self, rng):
        """Square loop with drifting odometry; a landmark seen at start and
        end pulls the loop shut — the VPS-SLAM value proposition."""
        dtype = jnp.float64
        g = gs.make_graph(16, 4, 32, 32, dtype=dtype)
        info6 = jnp.eye(6, dtype=dtype)
        info3 = jnp.eye(3, dtype=dtype) * 100.0

        # ground truth: 8 poses around a square (2m sides), yaw turning
        gt = [geo.pose_identity(dtype)]
        steps = [
            [1, 0, 0, 0, 0, 0], [1, 0, 0, 0, 0, np.pi / 2],
            [1, 0, 0, 0, 0, 0], [1, 0, 0, 0, 0, np.pi / 2],
            [1, 0, 0, 0, 0, 0], [1, 0, 0, 0, 0, np.pi / 2],
            [1, 0, 0, 0, 0, 0],
        ]
        for s in steps:
            gt.append(geo.pose_retract(gt[-1], jnp.asarray(s, dtype)))
        gt = jnp.stack(gt)

        lm_worlds = jnp.asarray(
            [[1.0, 0.5, 0.3], [0.5, -0.5, 0.8], [-0.3, 1.0, 0.1]], dtype
        )
        g, _ = gs.add_se3_node(g, gt[0])
        cur = gt[0]
        for i in range(1, 8):
            rel = geo.pose_mul(geo.pose_inv(gt[i - 1]), gt[i])
            rel_noisy = geo.pose_retract(rel, jnp.asarray(rng.normal(size=6) * 0.05, dtype))
            cur = geo.pose_mul(cur, rel_noisy)
            g, _ = gs.add_se3_node(g, cur)
            g = gs.add_se3_edge(g, i - 1, i, rel_noisy, info6)

        # each landmark observed (noise-free) from two early + two late poses:
        # a well-constrained loop closure
        for lw in lm_worlds:
            lidx = None
            for k in (0, 1, 6, 7):
                z = res.se3_point_residual(gt[k], lw, jnp.zeros(3, dtype))
                if lidx is None:
                    g, lidx = gs.add_point_node(g, geo.pose_apply(g.poses[k], z))
                g = gs.add_se3_point_edge(g, k, lidx, z, info3)

        err_before = float(jnp.linalg.norm(g.poses[7, :3] - gt[7, :3]))
        g2, stats = lmsolve.lm_optimize(g)
        err_after = float(jnp.linalg.norm(g2.poses[7, :3] - gt[7, :3]))
        assert float(stats.chi2_final) < float(stats.chi2_initial)
        assert err_after < err_before


class TestFloat32SmallAngleJacobians:
    def test_analytic_jacobian_f32_matches_f64_in_cancellation_zone(self, rng):
        """The closed-form Q-matrix coefficients divide O(eps) cancellation by
        theta^4/theta^5 — deadly in float32 for theta in [1e-4, 3e-2], the
        near-convergence regime of the DEFAULT f32 solver. The raised Taylor
        cutoff must keep the f32 analytic Jacobians within f32 accuracy of
        the f64 AD reference across that zone."""
        for theta in (1e-4, 3e-4, 1e-3, 3e-3, 1e-2, 3e-2, 6e-2, 0.1):
            xi = rng.normal(size=6)
            xi = xi / np.linalg.norm(xi) * theta
            pi64 = geo.pose_retract(geo.pose_identity(jnp.float64), jnp.asarray(rng.normal(size=6), jnp.float64))
            pj64 = geo.pose_retract(pi64, jnp.asarray(xi, jnp.float64))
            meas64 = geo.pose_retract(
                geo.pose_mul(geo.pose_inv(pi64), pj64),
                jnp.asarray(xi * 0.3, jnp.float64),
            )
            r64, Ji64, Jj64 = res.se3_edge_residual_jac_ad(pi64, pj64, meas64)

            pi32 = pi64.astype(jnp.float32)
            pj32 = pj64.astype(jnp.float32)
            meas32 = meas64.astype(jnp.float32)
            r32, Ji32, Jj32 = res.se3_edge_residual_jac(pi32, pj32, meas32)
            # Jacobian entries are O(1); demand ~f32-roundoff-level agreement
            np.testing.assert_allclose(np.asarray(Ji32), np.asarray(Ji64), atol=5e-4)
            np.testing.assert_allclose(np.asarray(Jj32), np.asarray(Jj64), atol=5e-4)
