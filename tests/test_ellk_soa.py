"""SoA (K-last) per-pose solver (solver/ellk_soa.py): exact-math parity
with the AoS per-pose path it re-expresses — same LM trajectory, chi2,
marginals, across robust kernels, preconditioners, and fixed-lag priors."""

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
    return _sort_obs_edges(g)


class TestSoAParity:
    def test_linearize_matches_aos(self, graph):
        """One linearization: assembled gp/gl/diag/Hll/chi2 equal the AoS
        per-pose build up to summation order."""
        g, ell_rows = graph
        K = g.poses.shape[0]
        ee = pcg_mod.build_ell_edges(pcg_mod._edge_args(g), K, ell_rows[2])
        eb = pcg_mod.ell_linearize(g.poses, g.landmarks, ee)
        se = soa_mod.soa_from_ell_edges(ee, g.landmarks.shape[0])
        lin = soa_mod.soa_linearize(g.poses, g.landmarks, se)
        np.testing.assert_allclose(np.asarray(lin.gp), np.asarray(eb.gp), atol=1e-9)
        np.testing.assert_allclose(np.asarray(lin.gl), np.asarray(eb.gl), atol=1e-9)
        np.testing.assert_allclose(np.asarray(lin.diag), np.asarray(eb.diag), atol=1e-9)
        np.testing.assert_allclose(np.asarray(lin.Hll), np.asarray(eb.Hll), atol=1e-9)
        np.testing.assert_allclose(float(lin.chi2), float(eb.chi2), rtol=1e-12)
        # materialized block view (the marginals input) matches too
        ebm = soa_mod.soa_to_ell_blocks(lin, se)
        np.testing.assert_allclose(np.asarray(ebm.H_kk), np.asarray(eb.H_kk), atol=1e-9)
        np.testing.assert_allclose(np.asarray(ebm.W_kl), np.asarray(eb.W_kl), atol=1e-9)
        np.testing.assert_allclose(np.asarray(ebm.H_ij), np.asarray(eb.H_ij), atol=1e-12)

    def test_lm_matches_aos(self, graph):
        g, ell_rows = graph
        ga, sa = pcg_mod.lm_optimize_pcg(
            g, max_iterations=25, assembly="ell", ell_rows=ell_rows
        )
        gb, sb = soa_mod.lm_optimize_soa(
            g, max_iterations=25, ell_rows=ell_rows
        )
        np.testing.assert_allclose(
            np.asarray(gb.poses), np.asarray(ga.poses), atol=1e-8
        )
        np.testing.assert_allclose(
            float(sb.chi2_final), float(sa.chi2_final), rtol=1e-8
        )

    def test_lm_robust_matches_aos(self, graph):
        g, ell_rows = graph
        for kind in ("huber", "dcs"):
            ga, sa = pcg_mod.lm_optimize_pcg(
                g, max_iterations=15, assembly="ell", ell_rows=ell_rows,
                robust_kind=kind, robust_delta=1.0,
            )
            gb, sb = soa_mod.lm_optimize_soa(
                g, max_iterations=15, ell_rows=ell_rows,
                robust_kind=kind, robust_delta=1.0,
            )
            np.testing.assert_allclose(
                np.asarray(gb.poses), np.asarray(ga.poses), atol=1e-8
            )

    def test_lm_tridiag_matches_aos(self, graph):
        g, ell_rows = graph
        ga, sa = pcg_mod.lm_optimize_pcg(
            g, max_iterations=15, assembly="ell", ell_rows=ell_rows,
            precond_kind="tridiag",
        )
        gb, sb = soa_mod.lm_optimize_soa(
            g, max_iterations=15, ell_rows=ell_rows, precond_kind="tridiag"
        )
        np.testing.assert_allclose(
            np.asarray(gb.poses), np.asarray(ga.poses), atol=1e-8
        )

    def test_marginals_match_aos(self, graph):
        g, ell_rows = graph
        ga, sa, ma = pcg_mod.lm_optimize_pcg(
            g, max_iterations=15, assembly="ell", ell_rows=ell_rows,
            with_marginals=True,
        )
        gb, sb, mb = soa_mod.lm_optimize_soa(
            g, max_iterations=15, ell_rows=ell_rows, with_marginals=True
        )
        np.testing.assert_allclose(np.asarray(mb), np.asarray(ma), atol=1e-8)

    def test_prior_matches_aos(self, graph):
        from semantic_slam_tpu.solver import fixed_lag as fl

        g, _ = graph
        L = g.landmarks.shape[0]
        g2, prior, _ = fl.marginalize(
            g, fl.empty_prior(L, dtype=jnp.float64), drop=4
        )
        g2, ell_rows = _sort_obs_edges(g2)
        ga, sa, ma = pcg_mod.lm_optimize_pcg(
            g2, max_iterations=15, assembly="ell", ell_rows=ell_rows,
            prior=prior, with_marginals=True,
        )
        gb, sb, mb = soa_mod.lm_optimize_soa(
            g2, max_iterations=15, ell_rows=ell_rows, prior=prior,
            with_marginals=True,
        )
        np.testing.assert_allclose(
            np.asarray(gb.poses), np.asarray(ga.poses), atol=1e-8
        )
        np.testing.assert_allclose(np.asarray(mb), np.asarray(ma), atol=1e-8)

    def test_engine_soa_dispatch_matches_pcg(self, monkeypatch):
        """SLAM_SOLVER_IMPL=soa routes the engine's single-chip pcg ticks
        through lm_optimize_soa (the TPU default); a full replay must match
        the portable pcg engine path. Maha gating exercises the marginal
        recovery through soa_to_ell_blocks."""
        import dataclasses

        import jax

        from semantic_slam_tpu.io import replay as replay_mod
        from semantic_slam_tpu.io import synthetic as synth_mod
        from semantic_slam_tpu.runtime.engine import SlamEngine
        from tests.test_scenarios import scenario_config

        log = synth_mod.make_synthetic_log(
            seed=12, n_steps=80, sensor_every=3, drift_noise=0.006,
            scene="lab",
        )
        cfg = scenario_config()
        cfg = cfg.replace(
            association=dataclasses.replace(
                cfg.association, use_maha_dist=True, use_eq_dist=False,
                maha_dist_thres=2.0,
            ),
            solver=dataclasses.replace(
                cfg.solver, linear_solver="pcg", dtype="float32"
            ),
        )

        def run(impl):
            monkeypatch.setenv("SLAM_SOLVER_IMPL", impl)
            # the impl knob is read at trace time; force fresh traces
            jax.clear_caches()
            eng = SlamEngine(cfg)
            replay_mod.replay(log, eng)
            return eng

        e_pcg = run("pcg")
        e_soa = run("soa")
        monkeypatch.delenv("SLAM_SOLVER_IMPL")
        jax.clear_caches()
        assert len(e_soa.keyframes) == len(e_pcg.keyframes) > 5
        assert int(e_soa.table.count) == int(e_pcg.table.count)
        n = e_pcg._n_poses
        np.testing.assert_allclose(
            np.asarray(e_soa.graph.poses[:n]),
            np.asarray(e_pcg.graph.poses[:n]),
            atol=1e-5,
        )

    def test_min_edges_gate(self, rng):
        from semantic_slam_tpu.graph import state as gs

        g = gs.make_graph(8, 4, 16, 16, dtype=jnp.float64)
        g, _ = gs.add_se3_node(g, jnp.asarray([0, 0, 0, 1, 0, 0, 0.0]))
        g2, stats = soa_mod.lm_optimize_soa(g, min_edges=10)
        assert int(stats.iterations) == 0
        np.testing.assert_array_equal(np.asarray(g2.poses), np.asarray(g.poses))
