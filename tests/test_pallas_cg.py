"""VMEM-resident Pallas CG kernel (solver/pallas_cg.py): parity with the
XLA SoA CG loop it replaces, via interpret mode on the CPU test platform."""

import jax.numpy as jnp
import numpy as np
import pytest

from semantic_slam_tpu.solver import ellk_soa as soa_mod
from semantic_slam_tpu.solver import pcg as pcg_mod
from tests.test_pcg import _sort_obs_edges
from tests.test_solver import build_chain_graph


@pytest.fixture()
def graph(rng):
    g, _, _ = build_chain_graph(rng, noise=0.05)
    g = jax.tree.map(
        lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a, g
    )
    return _sort_obs_edges(g)


import jax  # noqa: E402


class TestResidentCG:
    def test_step_matches_xla_loop(self, graph):
        """One damped Schur solve: the resident kernel's dp equals the XLA
        while-loop CG's dp (same math, fixed step count)."""
        g, ell_rows = graph
        K = g.poses.shape[0]
        L = g.landmarks.shape[0]
        se = soa_mod.build_soa_edges(
            pcg_mod._edge_args(g), K, ell_rows[2], L
        )
        lin = soa_mod.soa_linearize(g.poses, g.landmarks, se)
        from semantic_slam_tpu.solver.lm import _free_masks

        pf, lf = _free_masks(g)
        lam = jnp.asarray(1e-3, jnp.float32)
        dp_x, db_x = soa_mod.soa_schur_step(
            lin, se, lam, pf, lf, 64, cg_tol=0.0, use_pallas=False
        )
        dp_p, db_p = soa_mod.soa_schur_step(
            lin, se, lam, pf, lf, 64, cg_tol=0.0,
            use_pallas=True, pallas_interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(dp_p), np.asarray(dp_x), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(db_p), np.asarray(db_x), rtol=1e-4, atol=1e-6
        )

    def test_full_lm_matches_xla_loop(self, graph):
        g, ell_rows = graph
        ga, sa = soa_mod.lm_optimize_soa(
            g, max_iterations=10, ell_rows=ell_rows, max_cg_iters=64,
            use_pallas=False,
        )
        gb, sb = soa_mod.lm_optimize_soa(
            g, max_iterations=10, ell_rows=ell_rows, max_cg_iters=64,
            use_pallas=True, pallas_interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(gb.poses), np.asarray(ga.poses), atol=5e-5
        )
        np.testing.assert_allclose(
            float(sb.chi2_final), float(sa.chi2_final), rtol=1e-4
        )

    def test_tolerance_masking_matches_early_exit(self, graph):
        """With a loose cg_tol the masked kernel must reproduce the
        while-loop's early-exit solution (updates freeze once converged)."""
        g, ell_rows = graph
        K = g.poses.shape[0]
        L = g.landmarks.shape[0]
        se = soa_mod.build_soa_edges(pcg_mod._edge_args(g), K, ell_rows[2], L)
        lin = soa_mod.soa_linearize(g.poses, g.landmarks, se)
        from semantic_slam_tpu.solver.lm import _free_masks

        pf, lf = _free_masks(g)
        lam = jnp.asarray(1e-3, jnp.float32)
        dp_x, _ = soa_mod.soa_schur_step(
            lin, se, lam, pf, lf, 128, cg_tol=1e-6, use_pallas=False
        )
        dp_p, _ = soa_mod.soa_schur_step(
            lin, se, lam, pf, lf, 128, cg_tol=1e-6,
            use_pallas=True, pallas_interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(dp_p), np.asarray(dp_x), rtol=1e-4, atol=1e-6
        )

    def test_linearize_matches_xla(self, graph):
        """resident_linearize (obs + chain in one kernel): every output
        (v/Ow/Rt/gp/diag/gl/Hll/chi2) matches the XLA soa_linearize up to
        float summation order, across robust kernels."""
        g, ell_rows = graph
        K = g.poses.shape[0]
        L = g.landmarks.shape[0]
        se = soa_mod.build_soa_edges(pcg_mod._edge_args(g), K, ell_rows[2], L)
        for kind in ("none", "huber", "dcs"):
            lin_x = soa_mod.soa_linearize(
                g.poses, g.landmarks, se, robust_kind=kind, robust_delta=1.0
            )
            lin_p = soa_mod.soa_linearize(
                g.poses, g.landmarks, se, robust_kind=kind, robust_delta=1.0,
                use_pallas=True, pallas_interpret=True,
            )
            for name in ("v", "Ow", "gp", "gl", "diag", "Hll"):
                # atol covers float-order noise on ~1e2-magnitude blocks
                np.testing.assert_allclose(
                    np.asarray(getattr(lin_p, name)),
                    np.asarray(getattr(lin_x, name)),
                    rtol=1e-4, atol=1e-5, err_msg=f"{kind}:{name}",
                )
            np.testing.assert_allclose(
                np.asarray(lin_p.Rt), np.asarray(lin_x.Rt), atol=1e-6
            )
            np.testing.assert_allclose(
                float(lin_p.chi2), float(lin_x.chi2), rtol=1e-5
            )

    def test_full_lm_pallas_linearize_matches(self, graph):
        """Full LM with BOTH kernels (linearize + resident CG) in interpret
        mode lands at the XLA solution."""
        g, ell_rows = graph
        ga, sa = soa_mod.lm_optimize_soa(
            g, max_iterations=10, ell_rows=ell_rows, max_cg_iters=64,
            use_pallas=False,
        )
        gb, sb = soa_mod.lm_optimize_soa(
            g, max_iterations=10, ell_rows=ell_rows, max_cg_iters=64,
            use_pallas=True, pallas_interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(gb.poses), np.asarray(ga.poses), atol=5e-5
        )
        np.testing.assert_allclose(
            float(sb.chi2_final), float(sa.chi2_final), rtol=1e-4
        )

    def test_chain_blocks_match_xla(self, graph):
        """The chain blocks (Hii/Hij/Hjj) the linearize kernel emits match
        the XLA channelwise build."""
        g, ell_rows = graph
        K = g.poses.shape[0]
        L = g.landmarks.shape[0]
        se = soa_mod.build_soa_edges(pcg_mod._edge_args(g), K, ell_rows[2], L)
        lin_x = soa_mod.soa_linearize(g.poses, g.landmarks, se)
        lin_p = soa_mod.soa_linearize(
            g.poses, g.landmarks, se, use_pallas=True, pallas_interpret=True
        )
        for name in ("Hii", "Hij", "Hjj"):
            np.testing.assert_allclose(
                np.asarray(getattr(lin_p, name)),
                np.asarray(getattr(lin_x, name)),
                rtol=1e-4, atol=1e-5, err_msg=name,
            )

    def test_chi2_kernel_matches_xla(self, graph):
        """resident_chi2 equals the XLA trial-point objective and the
        linearize kernel's chi2 (the accept/reject pair)."""
        g, ell_rows = graph
        K = g.poses.shape[0]
        L = g.landmarks.shape[0]
        se = soa_mod.build_soa_edges(pcg_mod._edge_args(g), K, ell_rows[2], L)
        for kind in ("none", "huber"):
            c_x = soa_mod.soa_chi2(
                g.poses, g.landmarks, se, robust_kind=kind, robust_delta=1.0
            )
            c_p = soa_mod.soa_chi2(
                g.poses, g.landmarks, se, robust_kind=kind, robust_delta=1.0,
                use_pallas=True, pallas_interpret=True,
            )
            np.testing.assert_allclose(float(c_p), float(c_x), rtol=1e-5)
            lin_p = soa_mod.soa_linearize(
                g.poses, g.landmarks, se, robust_kind=kind, robust_delta=1.0,
                use_pallas=True, pallas_interpret=True,
            )
            np.testing.assert_allclose(
                float(c_p), float(lin_p.chi2), rtol=1e-6
            )

    def test_prior_in_kernel_matches_xla(self, graph):
        """Fixed-lag boundary prior (r5: applied INSIDE the solve kernel's
        matvec + folded into the grid tables): full LM with prior on the
        kernel path lands at the XLA solution."""
        import jax.numpy as jnp

        from semantic_slam_tpu.solver import fixed_lag as fl

        g, _ = graph
        L = g.landmarks.shape[0]
        g2, prior, _ = fl.marginalize(
            g, fl.empty_prior(L, dtype=jnp.float32), drop=4
        )
        g2, ell_rows = _sort_obs_edges(g2)
        ga, sa = soa_mod.lm_optimize_soa(
            g2, max_iterations=10, ell_rows=ell_rows, max_cg_iters=64,
            prior=prior, use_pallas=False,
        )
        gb, sb = soa_mod.lm_optimize_soa(
            g2, max_iterations=10, ell_rows=ell_rows, max_cg_iters=64,
            prior=prior, use_pallas=True, pallas_interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(gb.poses), np.asarray(ga.poses), atol=1e-4
        )
        np.testing.assert_allclose(
            float(sb.chi2_final), float(sa.chi2_final), rtol=1e-4
        )

    def test_fits_predicate(self):
        from semantic_slam_tpu.solver.pallas_cg import fits

        from semantic_slam_tpu.solver.pallas_cg import digit_split

        assert not fits(512, 5, 128, *digit_split(128))  # envelope: K >= 1024
        assert fits(2048, 4, 512, *digit_split(512))
        assert fits(4096, 4, 1024, *digit_split(1024))
        assert not fits(8192, 4, 2048, *digit_split(2048))  # Mosaic crash > 4096
        assert not fits(65536, 8, 4096, 64, 64)
