"""Multi-device tests on the virtual 8-device CPU mesh: the sharded solver
must match the single-device solver."""

import jax
import numpy as np
import pytest

from semantic_slam_tpu.parallel import sharded as sh
from semantic_slam_tpu.solver import lm as lm_mod
from tests.test_solver import build_chain_graph


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual devices"
    return sh.make_mesh(8)


class TestShardedSolver:
    def test_matches_single_device(self, rng, mesh8):
        g, gt_poses, _ = build_chain_graph(rng, noise=0.05)
        g_single, s_single = lm_mod.lm_optimize(g)
        g_shard = sh.shard_graph_edges(g, mesh8)
        g_multi, s_multi = sh.sharded_lm_optimize(g_shard, mesh8)
        np.testing.assert_allclose(
            np.asarray(g_multi.poses), np.asarray(g_single.poses), atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(g_multi.landmarks), np.asarray(g_single.landmarks), atol=1e-8
        )
        assert int(s_multi.iterations) == int(s_single.iterations)
        np.testing.assert_allclose(
            float(s_multi.chi2_final), float(s_single.chi2_final), rtol=1e-9
        )

    def test_mesh2_also_matches(self, rng):
        mesh2 = sh.make_mesh(2)
        g, _, _ = build_chain_graph(rng, noise=0.03)
        g1, _ = lm_mod.lm_optimize(g)
        g2, _ = sh.sharded_lm_optimize(sh.shard_graph_edges(g, mesh2), mesh2)
        np.testing.assert_allclose(np.asarray(g2.poses), np.asarray(g1.poses), atol=1e-8)

    def test_min_edge_gate_respected(self, mesh8, rng):
        import jax.numpy as jnp

        from semantic_slam_tpu.core import geometry as geo
        from semantic_slam_tpu.graph import state as gs

        g = gs.make_graph(8, 8, 8, 8, dtype=jnp.float64)
        g, _ = gs.add_se3_node(g, geo.pose_identity(jnp.float64))
        g2, stats = sh.sharded_lm_optimize(sh.shard_graph_edges(g, mesh8), mesh8)
        assert int(stats.iterations) == 0
