"""Robust kernel tests: outlier observations get down-weighted (the real
DCS/Huber kernels replacing the reference's uninitialized RobustKernelDCS)."""

import jax.numpy as jnp
import numpy as np
import pytest

from semantic_slam_tpu.graph import state as gs
from semantic_slam_tpu.solver import lm as lm_mod
from semantic_slam_tpu.solver import pcg as pcg_mod
from semantic_slam_tpu.solver.robust import robust_rho, robust_weight
from tests.test_solver import build_chain_graph


def add_outlier(g):
    """Corrupt one landmark observation grossly (5 m off)."""
    bad = jnp.asarray([5.0, -5.0, 3.0], jnp.float64)
    return g._replace(lme_meas=g.lme_meas.at[0].add(bad))


class TestWeights:
    def test_inlier_weight_is_one(self):
        chi2 = jnp.asarray([0.01, 0.5])
        for kind in ("huber", "dcs"):
            w = np.asarray(robust_weight(chi2, kind, 1.0))
            np.testing.assert_allclose(w, 1.0)

    def test_outlier_downweighted(self):
        chi2 = jnp.asarray([400.0])
        wh = float(robust_weight(chi2, "huber", 1.0)[0])
        wd = float(robust_weight(chi2, "dcs", 1.0)[0])
        assert wh == pytest.approx(1.0 / 20.0)
        assert wd < 0.01

    def test_rho_monotone(self):
        x = jnp.linspace(0.0, 100.0, 256)
        for kind in ("none", "huber", "dcs"):
            r = np.asarray(robust_rho(x, kind, 1.0))
            assert (np.diff(r) >= -1e-9).all()

    def test_unknown_kind_raises(self):
        with pytest.raises(ValueError):
            robust_weight(jnp.asarray([1.0]), "cauchy", 1.0)


class TestOutlierRejection:
    def test_huber_bounds_outlier_damage(self, rng):
        g, gt_poses, gt_lms = build_chain_graph(rng, noise=0.01)
        g_bad = add_outlier(g)
        n = gt_poses.shape[0]

        g_plain, _ = lm_mod.lm_optimize(g_bad)
        g_huber, _ = lm_mod.lm_optimize(g_bad, robust_kind="huber", robust_delta=2.0)

        err_plain = np.linalg.norm(
            np.asarray(g_plain.poses[:n, :3] - gt_poses[:, :3]), axis=1
        ).mean()
        err_huber = np.linalg.norm(
            np.asarray(g_huber.poses[:n, :3] - gt_poses[:, :3]), axis=1
        ).mean()
        assert err_huber < err_plain * 0.8

    def test_dcs_bounds_outlier_damage(self, rng):
        g, gt_poses, _ = build_chain_graph(rng, noise=0.01)
        g_bad = add_outlier(g)
        n = gt_poses.shape[0]
        g_plain, _ = lm_mod.lm_optimize(g_bad)
        g_dcs, _ = lm_mod.lm_optimize(g_bad, robust_kind="dcs", robust_delta=2.0)
        err_plain = np.linalg.norm(np.asarray(g_plain.poses[:n, :3] - gt_poses[:, :3]), axis=1).mean()
        err_dcs = np.linalg.norm(np.asarray(g_dcs.poses[:n, :3] - gt_poses[:, :3]), axis=1).mean()
        assert err_dcs < err_plain * 0.8

    def test_pcg_path_robust_matches_dense(self, rng):
        g, _, _ = build_chain_graph(rng, noise=0.02)
        g_bad = add_outlier(g)
        gd, sd = lm_mod.lm_optimize(g_bad, robust_kind="huber", robust_delta=2.0)
        gp, sp = pcg_mod.lm_optimize_pcg(
            g_bad, robust_kind="huber", robust_delta=2.0, max_cg_iters=256
        )
        np.testing.assert_allclose(
            float(sp.chi2_final), float(sd.chi2_final), rtol=0.05, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(gp.poses[:6, :3]), np.asarray(gd.poses[:6, :3]), atol=1e-3
        )

    def test_clean_graph_unchanged_by_robust(self, rng):
        """With no outliers all weights are ~1: same solution as plain."""
        g, _, _ = build_chain_graph(rng, noise=0.01)
        g1, s1 = lm_mod.lm_optimize(g)
        g2, s2 = lm_mod.lm_optimize(g, robust_kind="huber", robust_delta=50.0)
        np.testing.assert_allclose(
            np.asarray(g2.poses), np.asarray(g1.poses), atol=1e-6
        )
