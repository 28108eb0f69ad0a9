"""Fixed-lag marginalization (solver/fixed_lag.py).

The reference re-optimizes the full history every tick and has no
marginalization at all (graph_slam.cpp:182-219); these tests validate the
TPU build's fixed-lag extension: Schur-marginalizing old keyframes into a
dense boundary-pose prior + anchored landmark priors must (a) keep the
compacted graph's objective consistent with the full one at the
linearization point, (b) hold the full-batch solution in place, and
(c) compact counts/indices correctly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _build_graph
from semantic_slam_tpu.graph.residuals import graph_chi2
from semantic_slam_tpu.solver import fixed_lag as fl
from semantic_slam_tpu.solver import lm as lm_mod

K, L, E2 = 32, 16, 128
DROP = 8


@pytest.fixture(scope="module")
def optimized_graph():
    g = _build_graph(K=K, L=L, E2=E2, dtype=jnp.float32, noise=0.02, seed=7)
    g, stats = lm_mod.lm_optimize(g, max_iterations=60)
    assert float(stats.chi2_final) < float(stats.chi2_initial)
    return g


def total_chi2(g, prior):
    return float(graph_chi2(g)) + float(fl.prior_chi2(prior, g.poses, g.landmarks))


def test_chi2_consistent_at_linearization_point(optimized_graph):
    g = optimized_graph
    prior0 = fl.empty_prior(L)
    chi_full = float(graph_chi2(g))

    g2, prior, nb = fl.marginalize(g, prior0, drop=DROP)
    assert int(nb) <= prior.max_poses
    # at a converged estimate the eliminated gradient is ~0, so the
    # marginalized objective equals the full one up to the g^T H^-1 g term
    chi_marg = total_chi2(g2, prior)
    assert chi_marg == pytest.approx(chi_full, rel=5e-2, abs=1e-3)


def test_prior_holds_full_batch_solution(optimized_graph):
    g = optimized_graph
    g2, prior, _ = fl.marginalize(g, fl.empty_prior(L), drop=DROP)
    ref_poses = np.asarray(g.poses)[DROP : int(g.num_poses)]

    # perturb the window and re-solve WITH the prior: recovers the full-batch
    # estimate for the surviving keyframes
    rng = np.random.default_rng(0)
    noisy = np.asarray(g2.poses).copy()
    n_act = int(g2.num_poses)
    noisy[1:n_act, :3] += rng.normal(scale=0.05, size=(n_act - 1, 3))
    g_noisy = g2._replace(poses=jnp.asarray(noisy))

    g3, stats = fl.lm_optimize_prior(g_noisy, prior, max_iterations=60)
    got = np.asarray(g3.poses)[:n_act]
    err_prior = np.sqrt(np.mean((got[:, :3] - ref_poses[:, :3]) ** 2))
    assert err_prior < 2e-2, err_prior

    # WITHOUT the prior the compacted window loses the marginal information
    # and lands measurably farther from the full-batch solution
    g4, _ = lm_mod.lm_optimize(g_noisy, max_iterations=60)
    got4 = np.asarray(g4.poses)[:n_act]
    err_noprior = np.sqrt(np.mean((got4[:, :3] - ref_poses[:, :3]) ** 2))
    assert err_prior < err_noprior


def test_compaction_counts_and_indices(optimized_graph):
    g = optimized_graph
    n_poses, n_odom, n_lme = int(g.num_poses), int(g.num_odom), int(g.num_lme)
    oi = np.asarray(g.odom_i)[:n_odom]
    oj = np.asarray(g.odom_j)[:n_odom]
    lk = np.asarray(g.lme_k)[:n_lme]
    ll = np.asarray(g.lme_l)[:n_lme]
    keep_o = (oi >= DROP) & (oj >= DROP)
    keep_e = lk >= DROP

    g2, prior, _ = fl.marginalize(g, fl.empty_prior(L), drop=DROP)
    assert int(g2.num_poses) == n_poses - DROP
    assert int(g2.num_landmarks) == int(g.num_landmarks)  # landmarks never removed
    assert int(g2.num_odom) == int(keep_o.sum())
    assert int(g2.num_lme) == int(keep_e.sum())

    # kept edges preserve order and shift indices by DROP
    np.testing.assert_array_equal(
        np.asarray(g2.odom_i)[: int(g2.num_odom)], oi[keep_o] - DROP
    )
    np.testing.assert_array_equal(
        np.asarray(g2.lme_k)[: int(g2.num_lme)], lk[keep_e] - DROP
    )
    np.testing.assert_array_equal(
        np.asarray(g2.lme_l)[: int(g2.num_lme)], ll[keep_e]
    )
    # surviving poses shifted down
    np.testing.assert_allclose(
        np.asarray(g2.poses)[: n_poses - DROP],
        np.asarray(g.poses)[DROP:n_poses],
        rtol=0,
        atol=0,
    )
    # prior references live where it says
    np.testing.assert_allclose(
        np.asarray(prior.p_ref)[: int(prior.num_p)],
        np.asarray(g2.poses)[np.asarray(prior.p_idx)[: int(prior.num_p)]],
    )


def test_repeated_marginalization_composes(optimized_graph):
    g = optimized_graph
    chi_full = float(graph_chi2(g))
    g2, prior, nb1 = fl.marginalize(g, fl.empty_prior(L), drop=4)
    g3, prior2, nb2 = fl.marginalize(g2, prior, drop=4)
    assert int(nb1) <= prior.max_poses and int(nb2) <= prior2.max_poses
    assert int(g3.num_poses) == int(g.num_poses) - 8
    chi_marg = total_chi2(g3, prior2)
    assert chi_marg == pytest.approx(chi_full, rel=8e-2, abs=1e-3)
    # solving the twice-marginalized window stays near the full solution
    g4, _ = fl.lm_optimize_prior(g3, prior2, max_iterations=40)
    ref = np.asarray(g.poses)[8 : int(g.num_poses), :3]
    got = np.asarray(g4.poses)[: int(g4.num_poses), :3]
    assert np.sqrt(np.mean((got - ref) ** 2)) < 2e-2


def test_pcg_prior_matches_dense_prior(optimized_graph):
    from semantic_slam_tpu.solver import pcg as pcg_mod

    g2, prior, _ = fl.marginalize(optimized_graph, fl.empty_prior(L), drop=DROP)
    rng = np.random.default_rng(1)
    noisy = np.asarray(g2.poses).copy()
    n_act = int(g2.num_poses)
    noisy[1:n_act, :3] += rng.normal(scale=0.03, size=(n_act - 1, 3))
    g_noisy = g2._replace(poses=jnp.asarray(noisy))

    gd, sd = fl.lm_optimize_prior(g_noisy, prior, max_iterations=40)
    gp, sp = pcg_mod.lm_optimize_pcg(
        g_noisy, prior=prior, max_iterations=40, max_cg_iters=128
    )
    np.testing.assert_allclose(
        np.asarray(gp.poses)[:n_act, :3],
        np.asarray(gd.poses)[:n_act, :3],
        atol=2e-3,
    )
    assert float(sp.chi2_final) == pytest.approx(float(sd.chi2_final), rel=1e-2)


def test_prior_chi2_nonnegative_unconverged():
    """Marginalizing an UNCONVERGED graph (the MULTICHIP dryrun scenario that
    once printed chi2 -> -0.506): the c0 lift in _marginalize_impl must keep
    every chi2 report non-negative — the prior quadratic's minimum is >= 0 by
    construction, and all edge terms are sums of squares."""
    from semantic_slam_tpu.solver import pcg as pcg_mod

    g = _build_graph(K=16, L=8, E2=32, dtype=jnp.float32, noise=0.05, seed=3)
    g2, prior, _ = fl.marginalize(g, fl.empty_prior(L=8), drop=4)
    # prior factor itself: non-negative at its own minimum and at the current
    # estimate
    assert float(fl.prior_chi2(prior, g2.poses, g2.landmarks)) >= 0.0
    g3, stats = pcg_mod.lm_optimize_pcg(g2, prior=prior, max_iterations=4)
    assert float(stats.chi2_initial) >= 0.0
    assert float(stats.chi2_final) >= 0.0
    gd, sd = fl.lm_optimize_prior(g2, prior, max_iterations=4)
    assert float(sd.chi2_initial) >= 0.0
    assert float(sd.chi2_final) >= 0.0
    # randomly perturbed evaluation points stay non-negative too
    rng = np.random.default_rng(0)
    for _ in range(5):
        noisy = np.asarray(g2.poses).copy()
        n_act = int(g2.num_poses)
        noisy[1:n_act, :3] += rng.normal(scale=0.1, size=(n_act - 1, 3))
        lms = np.asarray(g2.landmarks) + rng.normal(
            scale=0.1, size=g2.landmarks.shape
        ).astype(np.float32)
        assert (
            float(fl.prior_chi2(prior, jnp.asarray(noisy), jnp.asarray(lms)))
            >= 0.0
        )


def test_sharded_pcg_prior_matches_single_chip(optimized_graph):
    from semantic_slam_tpu.parallel.sharded import make_mesh
    from semantic_slam_tpu.solver import pcg as pcg_mod

    g2, prior, _ = fl.marginalize(optimized_graph, fl.empty_prior(L), drop=DROP)
    mesh = make_mesh(4)
    gs_, ss = pcg_mod.sharded_lm_optimize_pcg(
        g2, mesh, max_iterations=20, prior=prior
    )
    g1, s1 = pcg_mod.lm_optimize_pcg(g2, prior=prior, max_iterations=20)
    n_act = int(g2.num_poses)
    np.testing.assert_allclose(
        np.asarray(gs_.poses)[:n_act], np.asarray(g1.poses)[:n_act], atol=1e-6
    )
    assert float(ss.chi2_final) == pytest.approx(float(s1.chi2_final), rel=1e-6)


def _attach_plane(g):
    """Plane node observed from several keyframes (incl. soon-dropped ones)."""
    from semantic_slam_tpu.graph import planes as planes_ext
    from semantic_slam_tpu.solver.plane_ba import observe_plane

    n_act = int(g.num_poses)
    pn = planes_ext.make_planes(4, 32, dtype=jnp.float32)
    plane_w = jnp.asarray([0.0, 0.0, 1.0, -1.2], jnp.float32)
    pn, pid = planes_ext.add_plane_node(pn, plane_w)
    info3 = jnp.eye(3, dtype=jnp.float32) * 25.0
    for k in range(0, min(n_act, 16), 2):
        obs = observe_plane(g.poses[k], plane_w)
        pn = planes_ext.add_se3_plane_edge(pn, k, pid, obs, info3)
    return pn


def test_plane_marginalization_chi2_consistent(optimized_graph):
    """Planar-patch marginalization: dropped SE3-plane edges become anchored
    plane-tangent priors; the objective stays consistent at a converged
    estimate and a re-solve with the prior stays put."""
    from semantic_slam_tpu.graph import planes as planes_ext

    g = optimized_graph
    n_act = int(g.num_poses)
    pn = _attach_plane(g)

    g2, pn2, stats = planes_ext.lm_optimize_with_planes(g, pn, max_iterations=30)
    chi_full = float(
        planes_ext.chi2_with_planes(g2, pn2)
    )

    prior0 = fl.empty_prior(L, Pl=4)
    g3, pn3, prior, nb = fl.marginalize_planes(g2, pn2, prior0, drop=DROP)
    assert int(nb) <= prior.max_poses
    # plane edges from dropped poses removed; plane node survives
    assert int(pn3.num_planes) == int(pn2.num_planes)
    lk = np.asarray(pn2.pe_k)[: int(pn2.num_pe)]
    assert int(pn3.num_pe) == int((lk >= DROP).sum())
    chi_marg = float(planes_ext.chi2_with_planes(g3, pn3)) + float(
        fl.prior_chi2_planes(prior, g3.poses, g3.landmarks, pn3.planes)
    )
    assert chi_marg == pytest.approx(chi_full, rel=8e-2, abs=2e-2)

    # re-solving with the prior keeps the full-batch solution
    g4, pn4, _ = planes_ext.lm_optimize_with_planes(
        g3, pn3, max_iterations=30, prior=prior
    )
    ref = np.asarray(g2.poses)[DROP:n_act, :3]
    got = np.asarray(g4.poses)[: n_act - DROP, :3]
    assert np.sqrt(np.mean((got - ref) ** 2)) < 2e-2


def test_pcg_plane_prior_matches_dense(optimized_graph):
    """Plane-extended PCG with a fixed-lag prior lands on the dense joint
    solve, single-chip and sharded."""
    from semantic_slam_tpu.graph import planes as planes_ext
    from semantic_slam_tpu.parallel.sharded import make_mesh
    from semantic_slam_tpu.solver import pcg as pcg_mod

    g = optimized_graph
    pn = _attach_plane(g)
    g2, pn2, _ = planes_ext.lm_optimize_with_planes(g, pn, max_iterations=30)
    g3, pn3, prior, _ = fl.marginalize_planes(
        g2, pn2, fl.empty_prior(L, Pl=4), drop=DROP
    )

    # perturb the window; re-solve with the prior on all three paths
    rng = np.random.default_rng(2)
    noisy = np.asarray(g3.poses).copy()
    n_act = int(g3.num_poses)
    noisy[1:n_act, :3] += rng.normal(scale=0.03, size=(n_act - 1, 3))
    g_noisy = g3._replace(poses=jnp.asarray(noisy))

    gd, pnd, sd = planes_ext.lm_optimize_with_planes(
        g_noisy, pn3, max_iterations=40, prior=prior
    )
    gp, pnp, sp = pcg_mod.lm_optimize_pcg_planes(
        g_noisy, pn3, max_iterations=40, max_cg_iters=128, prior=prior
    )
    np.testing.assert_allclose(
        np.asarray(gp.poses)[:n_act, :3],
        np.asarray(gd.poses)[:n_act, :3],
        atol=3e-3,
    )
    assert float(sp.chi2_final) == pytest.approx(float(sd.chi2_final), rel=2e-2)

    mesh = make_mesh(4)
    gs_, pns, ss = pcg_mod.sharded_lm_optimize_pcg_planes(
        g_noisy, pn3, mesh, max_iterations=20, prior=prior
    )
    g1, pn1, s1 = pcg_mod.lm_optimize_pcg_planes(
        g_noisy, pn3, max_iterations=20, prior=prior
    )
    # f32 reduction-order noise between the psum'd and single-chip paths
    np.testing.assert_allclose(
        np.asarray(gs_.poses)[:n_act], np.asarray(g1.poses)[:n_act], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(pns.planes), np.asarray(pn1.planes), atol=1e-5
    )
    assert float(ss.chi2_final) == pytest.approx(float(s1.chi2_final), rel=1e-5)


def test_marginals_with_prior_are_psd(optimized_graph):
    g2, prior, _ = fl.marginalize(optimized_graph, fl.empty_prior(L), drop=DROP)
    sig = np.asarray(fl.landmark_marginals_prior(g2, prior))
    nl = int(g2.num_landmarks)
    eig = np.linalg.eigvalsh(sig[:nl])
    assert np.all(eig > 0)
    # prior information tightens (or keeps) the no-prior marginals
    sig0 = np.asarray(lm_mod.landmark_marginals(g2))
    assert np.all(np.trace(sig[:nl], axis1=1, axis2=2) <= np.trace(sig0[:nl], axis1=1, axis2=2) + 1e-5)
