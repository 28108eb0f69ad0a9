"""Block-tridiagonal PCR solver: equality with dense solves, masked rows,
and its use as the chain preconditioner inside PCG."""

import numpy as np
import jax.numpy as jnp

from semantic_slam_tpu.solver import tridiag as td


def random_spd_tridiag(rng, K, dtype=jnp.float64):
    """Random SPD block-tridiag: A = T^T T + K*I restricted to tridiagonal
    structure by construction (build diag-dominant blocks directly)."""
    diag = []
    upper = []
    for k in range(K):
        M = rng.normal(size=(6, 6))
        diag.append(M @ M.T + 8.0 * np.eye(6))
    for k in range(K - 1):
        upper.append(rng.normal(size=(6, 6)) * 0.5)
    upper.append(np.zeros((6, 6)))
    return jnp.asarray(np.stack(diag), dtype), jnp.asarray(np.stack(upper), dtype)


def dense_from_tridiag(diag, upper):
    K = diag.shape[0]
    A = np.zeros((K * 6, K * 6))
    for k in range(K):
        A[k * 6 : k * 6 + 6, k * 6 : k * 6 + 6] = np.asarray(diag[k])
        if k + 1 < K:
            U = np.asarray(upper[k])
            A[k * 6 : k * 6 + 6, (k + 1) * 6 : (k + 1) * 6 + 6] = U
            A[(k + 1) * 6 : (k + 1) * 6 + 6, k * 6 : k * 6 + 6] = U.T
    return A


class TestPCR:
    def test_matches_dense_solve(self, rng):
        for K in (1, 2, 3, 7, 16, 33):
            diag, upper = random_spd_tridiag(rng, K)
            A = dense_from_tridiag(diag, upper)
            r = rng.normal(size=(K, 6))
            fac = td.pcr_factor(diag, upper)
            z = np.asarray(td.pcr_solve(fac, jnp.asarray(r)))
            z_ref = np.linalg.solve(A, r.reshape(-1)).reshape(K, 6)
            np.testing.assert_allclose(z, z_ref, rtol=1e-9, atol=1e-9)

    def test_identity_rows_pass_through(self, rng):
        """Masked (identity-diagonal, zero-coupling) rows return r unchanged."""
        K = 12
        diag, upper = random_spd_tridiag(rng, K)
        dead = [0, 5, 11]
        diag = diag.at[jnp.asarray(dead)].set(jnp.eye(6, dtype=jnp.float64))
        for d in dead:
            upper = upper.at[d].set(0.0)
            if d > 0:
                upper = upper.at[d - 1].set(0.0)
        r = rng.normal(size=(K, 6))
        fac = td.pcr_factor(diag, upper)
        z = np.asarray(td.pcr_solve(fac, jnp.asarray(r)))
        for d in dead:
            np.testing.assert_allclose(z[d], r[d], rtol=1e-12)
        A = dense_from_tridiag(diag, upper)
        z_ref = np.linalg.solve(A, r.reshape(-1)).reshape(K, 6)
        np.testing.assert_allclose(z, z_ref, rtol=1e-8, atol=1e-9)

    def test_chain_blocks_assembly(self, rng):
        from semantic_slam_tpu.solver.lm import linearize
        from tests.test_solver import build_chain_graph

        g, _, _ = build_chain_graph(rng, noise=0.02)
        K = g.poses.shape[0]
        # build edge blocks the same way pcg does
        from semantic_slam_tpu.solver.pcg import build_edge_blocks, _edge_args

        eb = build_edge_blocks(g.poses, g.landmarks, *_edge_args(g), lambda x: x)
        pose_free = (jnp.arange(K) < g.num_poses) & (jnp.arange(K) > 0)
        lam = jnp.float64(0.01)
        eye6 = jnp.eye(6, dtype=jnp.float64)
        pf = pose_free.astype(jnp.float64)
        D = eb.diag + lam * eye6[None]
        D = D * pf[:, None, None] + eye6[None] * (1.0 - pf)[:, None, None]
        D2, upper = td.chain_blocks_from_edges(D, eb.oi, eb.oj, eb.H_ij, pose_free)
        # compare against the dense damped Hpp tridiagonal part
        lin = linearize(g)
        Hpp = np.asarray(lin.Hpp).reshape(K, 6, K, 6)
        for k in range(1, int(g.num_poses) - 1):
            np.testing.assert_allclose(
                np.asarray(upper[k]), Hpp[k, :, k + 1, :], atol=1e-9
            )


class TestTridiagPreconditionedPCG:
    def test_pcg_tridiag_matches_jacobi_solution(self, rng):
        from semantic_slam_tpu.solver import pcg as pcg_mod
        from tests.test_solver import build_chain_graph

        g, _, _ = build_chain_graph(rng, noise=0.05)
        g_j, s_j = pcg_mod.lm_optimize_pcg(g, precond_kind="jacobi")
        g_t, s_t = pcg_mod.lm_optimize_pcg(g, precond_kind="tridiag")
        np.testing.assert_allclose(
            float(s_t.chi2_final), float(s_j.chi2_final), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(g_t.poses), np.asarray(g_j.poses), atol=1e-5
        )

    def test_tridiag_cuts_cg_iterations(self, rng):
        """On a long chain, the tridiag preconditioner must converge CG in
        strictly fewer iterations than block-Jacobi for the same tolerance."""
        import jax

        from semantic_slam_tpu.solver import pcg as pcg_mod
        from semantic_slam_tpu.solver import tridiag as td
        from tests.test_solver import build_chain_graph

        g, _, _ = build_chain_graph(rng, n_poses=14, n_lms=6, noise=0.05)
        K = g.poses.shape[0]
        eb = pcg_mod.build_edge_blocks(
            g.poses, g.landmarks, *pcg_mod._edge_args(g), lambda x: x
        )
        pose_free = (jnp.arange(K) < g.num_poses) & (jnp.arange(K) > 0)
        lam = jnp.float64(1e-4)
        eye3 = jnp.eye(3, dtype=jnp.float64)
        lmf = ((jnp.arange(g.landmarks.shape[0]) < g.num_landmarks)).astype(jnp.float64)
        A = eb.Hll + lam * eye3[None]
        A = A * lmf[:, None, None] + eye3[None] * (1.0 - lmf)[:, None, None]
        Ainv = pcg_mod.inv33(A)
        b = -eb.gp * pose_free.astype(jnp.float64)[:, None]

        def count_iters(precond):
            # replicate pcg_solve's loop but count iterations
            pf = pose_free.astype(jnp.float64)
            if precond is None:
                Mdiag = eb.diag + lam * jnp.eye(6, dtype=jnp.float64)[None]
                Mdiag = Mdiag * pf[:, None, None] + jnp.eye(6, dtype=jnp.float64)[None] * (1 - pf)[:, None, None]
                Minv = jnp.linalg.inv(Mdiag)
                precond = lambda r: jnp.einsum("kij,kj->ki", Minv, r) * pf[:, None]
            bb = b * pf[:, None]
            x = jnp.zeros_like(bb)
            r = bb
            z = precond(r)
            p = z
            rz = jnp.sum(r * z)
            b2 = max(float(jnp.sum(bb * bb)), 1e-30)
            it = 0
            while float(jnp.sum(r * r)) > 1e-10 * b2 and it < 200:
                Ap = pcg_mod.reduced_matvec(eb, Ainv, lam, pf, p, lambda x: x)
                alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
                x = x + alpha * p
                r = r - alpha * Ap
                z = precond(r)
                rz_new = jnp.sum(r * z)
                p = z + (rz_new / jnp.maximum(rz, 1e-30)) * p
                rz = rz_new
                it += 1
            return it

        n_jac = count_iters(None)

        eye6 = jnp.eye(6, dtype=jnp.float64)
        pf = pose_free.astype(jnp.float64)
        D = eb.diag + lam * eye6[None]
        D = D * pf[:, None, None] + eye6[None] * (1.0 - pf)[:, None, None]
        D, upper = td.chain_blocks_from_edges(D, eb.oi, eb.oj, eb.H_ij, pose_free)
        fac = td.pcr_factor(D, upper)
        n_tri = count_iters(lambda r: td.pcr_solve(fac, r) * pf[:, None])
        assert n_tri < n_jac, (n_tri, n_jac)
