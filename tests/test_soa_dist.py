"""Distributed / large-K SoA LM loop (solver/soa_dist.py) and the tiled
Pallas kernels behind it (solver/pallas_tiled.py).

Parity chain: the dist loop on XLA channel math vs the proven single-chip
SoA loop; the tiled kernels (interpret mode, forced multi-block grids) vs
the XLA fallback; the sharded entry on a virtual 4-device CPU mesh vs
single-chip — all on the same graphs. Compiled-on-TPU values are pinned by
tools/tpu_kernel_check.py (tunnel-serialization constraint)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_slam_tpu.parallel.sharded import make_mesh
from semantic_slam_tpu.solver import ellk_soa as soa_mod
from semantic_slam_tpu.solver import pallas_tiled as pt
from semantic_slam_tpu.solver import pcg as pcg_mod
from semantic_slam_tpu.solver import soa_dist as sd
from tests.test_pcg import _sort_obs_edges
from tests.test_solver import build_chain_graph


@pytest.fixture()
def graph(rng):
    g, _, _ = build_chain_graph(rng, noise=0.05)
    return _sort_obs_edges(g)


@pytest.fixture()
def force_small_blocks():
    """Interpret mode has no Mosaic envelope: force 4-lane-class tiles so
    CPU tests exercise REAL multi-block grids (accumulation + revisiting)."""
    old = pt._FORCE_BLOCK
    pt._FORCE_BLOCK = 4
    yield
    pt._FORCE_BLOCK = old


KW = dict(max_iterations=12, rel_tol=0.0, max_cg_iters=16, cg_tol=0.0)
# planes comparisons run against pcg.lm_optimize_pcg_planes, which keeps
# its internal cg_tol=1e-8 — match it instead of pinning work
KWP = dict(max_iterations=12, rel_tol=0.0, max_cg_iters=32)


class TestDistSingleChip:
    def test_xla_matches_soa(self, graph):
        g, ell_rows = graph
        ga, sa = soa_mod.lm_optimize_soa(g, ell_rows=ell_rows, **KW)
        gb, sb = sd.lm_optimize_soa_tiled(
            g, ell_rows=ell_rows, use_tiled=False, **KW
        )
        np.testing.assert_allclose(
            np.asarray(gb.poses), np.asarray(ga.poses), atol=1e-8
        )
        np.testing.assert_allclose(
            float(sb.chi2_final), float(sa.chi2_final), rtol=1e-8
        )

    def test_tiled_interpret_matches(self, graph, force_small_blocks):
        g, ell_rows = graph
        ga, sa = sd.lm_optimize_soa_tiled(
            g, ell_rows=ell_rows, use_tiled=False, **KW
        )
        gb, sb = sd.lm_optimize_soa_tiled(
            g, ell_rows=ell_rows, use_tiled=True, interpret=True, **KW
        )
        # kernels run f32; the XLA reference under x64 runs f64
        np.testing.assert_allclose(
            np.asarray(gb.poses), np.asarray(ga.poses), atol=5e-4
        )
        np.testing.assert_allclose(
            float(sb.chi2_final), float(sa.chi2_final), rtol=1e-3
        )

    def test_robust_matches(self, graph):
        g, ell_rows = graph
        for kind in ("huber", "dcs"):
            ga, _ = soa_mod.lm_optimize_soa(
                g, ell_rows=ell_rows, robust_kind=kind, robust_delta=1.0, **KW
            )
            gb, _ = sd.lm_optimize_soa_tiled(
                g, ell_rows=ell_rows, robust_kind=kind, robust_delta=1.0,
                use_tiled=False, **KW
            )
            np.testing.assert_allclose(
                np.asarray(gb.poses), np.asarray(ga.poses), atol=1e-8
            )

    def test_with_marginals_matches(self, graph):
        g, ell_rows = graph
        ga, sa, ma = soa_mod.lm_optimize_soa(
            g, ell_rows=ell_rows, with_marginals=True, **KW
        )
        gb, sb, mb = sd.lm_optimize_soa_tiled(
            g, ell_rows=ell_rows, with_marginals=True, use_tiled=False, **KW
        )
        np.testing.assert_allclose(
            np.asarray(mb), np.asarray(ma), atol=1e-6
        )

    def test_prior_matches(self, graph):
        from semantic_slam_tpu.solver import fixed_lag as fl

        g, ell_rows = graph
        L = g.landmarks.shape[0]
        g, prior, _ = fl.marginalize(g, fl.empty_prior(L, dtype=g.poses.dtype), drop=2)
        g, ell_rows = _sort_obs_edges(g)
        ga, sa = soa_mod.lm_optimize_soa(
            g, ell_rows=ell_rows, prior=prior, **KW
        )
        gb, sb = sd.lm_optimize_soa_tiled(
            g, ell_rows=ell_rows, prior=prior, use_tiled=False, **KW
        )
        np.testing.assert_allclose(
            np.asarray(gb.poses), np.asarray(ga.poses), atol=1e-8
        )
        np.testing.assert_allclose(
            float(sb.chi2_final), float(sa.chi2_final), rtol=1e-8
        )
        # tiled kernels with the prior (interpret)
        old = pt._FORCE_BLOCK
        pt._FORCE_BLOCK = 4
        try:
            gc_, sc = sd.lm_optimize_soa_tiled(
                g, ell_rows=ell_rows, prior=prior, use_tiled=True,
                interpret=True, **KW
            )
        finally:
            pt._FORCE_BLOCK = old
        np.testing.assert_allclose(
            np.asarray(gc_.poses), np.asarray(ga.poses), atol=5e-4
        )


class TestDistSharded:
    def test_sharded_matches_single(self, graph):
        g, ell_rows = graph
        mesh = make_mesh(4)
        ga, sa = sd.lm_optimize_soa_tiled(
            g, ell_rows=ell_rows, use_tiled=False, **KW
        )
        gb, sb = sd.sharded_lm_optimize_soa(
            g, mesh, ell_rows=ell_rows, use_tiled=False, **KW
        )
        np.testing.assert_allclose(
            np.asarray(gb.poses), np.asarray(ga.poses), atol=1e-7
        )
        np.testing.assert_allclose(
            float(sb.chi2_final), float(sa.chi2_final), rtol=1e-8
        )

    def test_sharded_tiled_interpret(self, graph, force_small_blocks):
        g, ell_rows = graph
        mesh = make_mesh(4)
        ga, _ = sd.lm_optimize_soa_tiled(
            g, ell_rows=ell_rows, use_tiled=False, **KW
        )
        gb, _ = sd.sharded_lm_optimize_soa(
            g, mesh, ell_rows=ell_rows, use_tiled=True, interpret=True, **KW
        )
        np.testing.assert_allclose(
            np.asarray(gb.poses), np.asarray(ga.poses), atol=5e-4
        )

    def test_sharded_with_marginals(self, graph):
        g, ell_rows = graph
        mesh = make_mesh(4)
        ga, sa, ma = soa_mod.lm_optimize_soa(
            g, ell_rows=ell_rows, with_marginals=True, **KW
        )
        gb, sb, mb = sd.sharded_lm_optimize_soa(
            g, mesh, ell_rows=ell_rows, with_marginals=True,
            use_tiled=False, **KW
        )
        np.testing.assert_allclose(np.asarray(mb), np.asarray(ma), atol=1e-6)

    def test_collective_sizes(self, graph):
        """Collective budget pin (docs/SCALING.md): nothing bigger than
        the [36K]-class linearize psum crosses the mesh."""
        g, ell_rows = graph
        K = g.poses.shape[0]
        L = g.landmarks.shape[0]
        mesh = make_mesh(4)

        def run(g):
            return sd.sharded_lm_optimize_soa(
                g, mesh, ell_rows=ell_rows, use_tiled=False, **KW
            )

        from tests.test_pcg import _walk_jaxpr

        jaxpr = jax.make_jaxpr(run)(g)
        eqns = _walk_jaxpr(jaxpr.jaxpr, [])
        psums = [e for e in eqns if "psum" in e.primitive.name]
        assert psums
        limit = max(K * 36, L * 9)
        for e in psums:
            for v in e.invars:
                size = int(np.prod(v.aval.shape)) if v.aval.shape else 1
                assert size <= limit, (e.primitive.name, v.aval.shape)


class TestDistPlanes:
    """Planar-patch joint solve on the dist loop (r4 verdict #4)."""

    @pytest.fixture()
    def plane_graph(self, rng):
        from semantic_slam_tpu.graph import planes as gp
        from tests.test_graph_planes import observe_plane

        g, gt_poses, _ = build_chain_graph(rng, noise=0.05)
        planes = [[1.0, 0.0, 0.0, -6.0], [0.0, 0.0, 1.0, -1.2]]
        pn = gp.make_planes(8, 64, dtype=jnp.float64)
        info3 = jnp.eye(3, dtype=jnp.float64) * 100.0
        pids = []
        for pw in planes:
            pn, pid = gp.add_plane_node(pn, jnp.asarray(pw, jnp.float64))
            pids.append(pid)
        # k-major edge order: the ELL build_slots sorted-by-keyframe contract
        for k in range(gt_poses.shape[0]):
            for pw, pid in zip(planes, pids):
                z = observe_plane(
                    gt_poses[k], jnp.asarray(pw, jnp.float64)
                ) + jnp.asarray(rng.normal(size=4) * 0.005, jnp.float64)
                pn = gp.add_se3_plane_edge(pn, k, pid, z, info3)
        g, ell_rows3 = _sort_obs_edges(g)
        return g, pn, ell_rows3 + (4,)

    def test_matches_pcg_planes(self, plane_graph):
        g, pn, ell_rows = plane_graph
        ga, pa, sa = pcg_mod.lm_optimize_pcg_planes(
            g, pn, max_iterations=12, rel_tol=0.0, max_cg_iters=32,
        )
        gb, pb, sb = sd.lm_optimize_soa_planes(
            g, pn, use_tiled=False, ell_rows=ell_rows, **KWP
        )
        np.testing.assert_allclose(
            np.asarray(gb.poses), np.asarray(ga.poses), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(pb.planes), np.asarray(pa.planes), atol=1e-6
        )
        np.testing.assert_allclose(
            float(sb.chi2_final), float(sa.chi2_final), rtol=1e-6
        )

    def test_tiled_interpret_matches(self, plane_graph, force_small_blocks):
        g, pn, ell_rows = plane_graph
        ga, pa, _ = sd.lm_optimize_soa_planes(
            g, pn, use_tiled=False, ell_rows=ell_rows, **KWP
        )
        gb, pb, _ = sd.lm_optimize_soa_planes(
            g, pn, use_tiled=True, interpret=True, ell_rows=ell_rows, **KWP
        )
        np.testing.assert_allclose(
            np.asarray(gb.poses), np.asarray(ga.poses), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(pb.planes), np.asarray(pa.planes), atol=5e-4
        )

    def test_sharded_matches_single(self, plane_graph):
        g, pn, ell_rows = plane_graph
        mesh = make_mesh(4)
        ga, pa, sa = sd.lm_optimize_soa_planes(
            g, pn, use_tiled=False, ell_rows=ell_rows, **KWP
        )
        gb, pb, sb = sd.sharded_lm_optimize_soa_planes(
            g, pn, mesh, use_tiled=False, ell_rows=ell_rows, **KWP
        )
        np.testing.assert_allclose(
            np.asarray(gb.poses), np.asarray(ga.poses), atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(pb.planes), np.asarray(pa.planes), atol=1e-7
        )

    def test_with_marginals_matches_pcg(self, plane_graph):
        g, pn, ell_rows = plane_graph
        ga, pa, sa, ma = pcg_mod.lm_optimize_pcg_planes(
            g, pn, max_iterations=12, rel_tol=0.0, max_cg_iters=32,
            with_marginals=True,
        )
        gb, pb, sb, mb = sd.lm_optimize_soa_planes(
            g, pn, use_tiled=False, ell_rows=ell_rows,
            with_marginals=True, **KWP
        )
        np.testing.assert_allclose(np.asarray(mb), np.asarray(ma), atol=1e-5)

    def test_prior_matches_pcg(self, plane_graph):
        from semantic_slam_tpu.solver import fixed_lag as fl

        g, pn, ell_rows = plane_graph
        L = g.landmarks.shape[0]
        Pl = pn.planes.shape[0]
        g2, pn2, prior, _ = fl.marginalize_planes(
            g, pn, fl.empty_prior(L, Pl=Pl, dtype=g.poses.dtype), drop=2
        )
        g2, ell_rows3 = _sort_obs_edges(g2)
        ell_rows = ell_rows3 + (4,)
        ga, pa, sa = pcg_mod.lm_optimize_pcg_planes(
            g2, pn2, max_iterations=12, rel_tol=0.0, max_cg_iters=32,
            prior=prior,
        )
        gb, pb, sb = sd.lm_optimize_soa_planes(
            g2, pn2, use_tiled=False, ell_rows=ell_rows, prior=prior, **KWP
        )
        np.testing.assert_allclose(
            np.asarray(gb.poses), np.asarray(ga.poses), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(pb.planes), np.asarray(pa.planes), atol=1e-6
        )


class TestEnginePlanesDispatch:
    def test_engine_planes_soa_dispatch_matches_pcg(self, monkeypatch):
        """SLAM_SOLVER_IMPL=soa routes the engine's planar-patch ticks
        through lm_optimize_soa_planes (the TPU default from K>=1024); a
        full replay must match the pcg planes engine path."""
        import dataclasses

        import jax

        from semantic_slam_tpu.io import replay as replay_mod
        from semantic_slam_tpu.io import synthetic as synth_mod
        from semantic_slam_tpu.runtime.engine import SlamEngine
        from tests.test_scenarios import scenario_config

        log = synth_mod.make_synthetic_log(
            seed=21, n_steps=60, sensor_every=3, drift_noise=0.006,
            scene="lab",
        )
        cfg = scenario_config()
        cfg = cfg.replace(
            use_plane_landmarks=True,
            solver=dataclasses.replace(
                cfg.solver, linear_solver="pcg", dtype="float32"
            ),
        )

        def run(impl):
            monkeypatch.setenv("SLAM_SOLVER_IMPL", impl)
            jax.clear_caches()
            eng = SlamEngine(cfg)
            replay_mod.replay(log, eng)
            return eng

        try:
            e_pcg = run("pcg")
            e_soa = run("soa")
        finally:
            monkeypatch.delenv("SLAM_SOLVER_IMPL")
            jax.clear_caches()
        assert len(e_soa.keyframes) == len(e_pcg.keyframes) > 5
        assert int(e_soa.table.count) == int(e_pcg.table.count)
        n = e_pcg._n_poses
        np.testing.assert_allclose(
            np.asarray(e_soa.graph.poses[:n]),
            np.asarray(e_pcg.graph.poses[:n]),
            atol=5e-4,
        )


def test_planes_collective_sizes(rng):
    """Collective budget for the sharded planes path: plane tables add
    [9Pl]-class psums; nothing bigger than the [36K]-class linearize psum
    crosses the mesh."""
    from semantic_slam_tpu.graph import planes as gp
    from tests.test_graph_planes import observe_plane
    from tests.test_pcg import _walk_jaxpr

    g, gt_poses, _ = build_chain_graph(rng, noise=0.05)
    pn = gp.make_planes(8, 64, dtype=jnp.float64)
    pn, pid = gp.add_plane_node(pn, jnp.asarray([0.0, 0, 1, -1.2], jnp.float64))
    info3 = jnp.eye(3, dtype=jnp.float64) * 100.0
    for k in range(gt_poses.shape[0]):
        pn = gp.add_se3_plane_edge(
            pn, k, pid,
            observe_plane(gt_poses[k], jnp.asarray([0.0, 0, 1, -1.2])),
            info3,
        )
    g, r3 = _sort_obs_edges(g)
    K = g.poses.shape[0]
    L = g.landmarks.shape[0]
    mesh = make_mesh(4)

    def run(g, pn):
        return sd.sharded_lm_optimize_soa_planes(
            g, pn, mesh, ell_rows=r3 + (2,), use_tiled=False, **KWP
        )

    jaxpr = jax.make_jaxpr(run)(g, pn)
    eqns = _walk_jaxpr(jaxpr.jaxpr, [])
    psums = [e for e in eqns if "psum" in e.primitive.name]
    assert psums
    limit = max(K * 36, L * 9)
    for e in psums:
        for v in e.invars:
            size = int(np.prod(v.aval.shape)) if v.aval.shape else 1
            assert size <= limit, (e.primitive.name, v.aval.shape)
