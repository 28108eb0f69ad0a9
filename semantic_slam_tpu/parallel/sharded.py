"""Multi-chip distributed pose-graph optimization (shard_map + psum).

The reference has no distributed execution at all (SURVEY.md §2: its
"communication backend" is ROS pub/sub between OS processes). The TPU-native
scaling axis is the graph itself: EDGES are sharded across the device mesh,
node variables are replicated, and each LM iteration

  1. assembles partial Hessian blocks from the local edge shard
     (``linearize_arrays`` contributes exact zeros for masked slots),
  2. ``psum``s the dense blocks over ICI — the only collective per
     iteration: one [6K,6K] + [6K,3L] + small tensors,
  3. runs the identical (replicated, deterministic) Schur solve + damping
     update on every device.

This is the distributed Schur-complement BA of the north star
(BASELINE.json): the reduced camera system stays replicated (dense Cholesky
is cheap relative to assembly for K ≲ 1k); scaling of the wide work — edge
linearization and the W*Ainv*W^T products — rides the mesh.

Works identically on a real pod slice and on the virtual CPU mesh used in
tests (``xla_force_host_platform_device_count``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from semantic_slam_tpu.graph.state import GraphState
from semantic_slam_tpu.solver import lm as lm_mod


def make_mesh(n_devices: int | None = None, axis_name: str = "shard") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], (axis_name,))


def _psum_lin(lin: lm_mod.Linearization, axis: str) -> lm_mod.Linearization:
    return jax.tree.map(lambda x: jax.lax.psum(x, axis), lin)


@partial(
    jax.jit,
    static_argnames=("mesh", "axis_name", "max_iterations", "min_edges", "rel_tol"),
)
def sharded_lm_optimize(
    g: GraphState,
    mesh: Mesh,
    axis_name: str = "shard",
    max_iterations: int = 64,
    min_edges: int = 10,
    rel_tol: float = 1e-6,
) -> tuple[GraphState, lm_mod.LMStats]:
    """Distributed drop-in for ``lm_optimize``.

    Edge arrays are split along their leading axis over the mesh; global
    edge masks are computed BEFORE sharding (mask offsets are global). Node
    state and solve are replicated, so results are bitwise identical across
    devices and (up to reduction order) match the single-device path.
    """
    n = mesh.shape[axis_name]
    E1 = g.odom_i.shape[0]
    E2 = g.lme_k.shape[0]
    assert E1 % n == 0 and E2 % n == 0, "edge capacities must divide the mesh"

    pose_free, lm_free = lm_mod._free_masks(g)
    om = g.odom_mask()
    lmm = g.lme_mask()

    edge_in_specs = (
        P(axis_name),  # odom_i
        P(axis_name),  # odom_j
        P(axis_name),  # odom_meas
        P(axis_name),  # odom_info
        P(axis_name),  # odom_mask
        P(axis_name),  # lme_k
        P(axis_name),  # lme_l
        P(axis_name),  # lme_meas
        P(axis_name),  # lme_info
        P(axis_name),  # lme_mask
    )

    def body(poses, landmarks, pose_free, lm_free, *edges):
        def lin_fn(p, l):
            return _psum_lin(lm_mod.linearize_arrays(p, l, *edges), axis_name)

        p, l, stats, _ = lm_mod.run_lm_loop(
            poses, landmarks, lin_fn, pose_free, lm_free,
            max_iterations, rel_tol,
        )
        return p, l, stats

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()) + edge_in_specs,
        out_specs=(P(), P(), lm_mod.LMStats(P(), P(), P(), P())),
        check_vma=False,
    )
    poses, landmarks, stats = sharded(
        g.poses,
        g.landmarks,
        pose_free,
        lm_free,
        g.odom_i,
        g.odom_j,
        g.odom_meas,
        g.odom_info,
        om,
        g.lme_k,
        g.lme_l,
        g.lme_meas,
        g.lme_info,
        lmm,
    )

    run = g.num_edges() >= min_edges
    g = g._replace(
        poses=jnp.where(run, poses, g.poses),
        landmarks=jnp.where(run, landmarks, g.landmarks),
    )
    stats = lm_mod.LMStats(
        iterations=jnp.where(run, stats.iterations, 0),
        chi2_initial=stats.chi2_initial,
        chi2_final=jnp.where(run, stats.chi2_final, stats.chi2_initial),
        lambda_final=stats.lambda_final,
    )
    return g, stats


def shard_graph_edges(g: GraphState, mesh: Mesh, axis_name: str = "shard") -> GraphState:
    """Place edge arrays with a sharded layout (device_put) so the sharded
    optimizer consumes them without an initial all-to-all."""
    espec = NamedSharding(mesh, P(axis_name))
    rspec = NamedSharding(mesh, P())

    def put(x, spec):
        return jax.device_put(x, spec)

    return GraphState(
        poses=put(g.poses, rspec),
        num_poses=put(g.num_poses, rspec),
        landmarks=put(g.landmarks, rspec),
        num_landmarks=put(g.num_landmarks, rspec),
        odom_i=put(g.odom_i, espec),
        odom_j=put(g.odom_j, espec),
        odom_meas=put(g.odom_meas, espec),
        odom_info=put(g.odom_info, espec),
        num_odom=put(g.num_odom, rspec),
        lme_k=put(g.lme_k, espec),
        lme_l=put(g.lme_l, espec),
        lme_meas=put(g.lme_meas, espec),
        lme_info=put(g.lme_info, espec),
        num_lme=put(g.num_lme, rspec),
    )
