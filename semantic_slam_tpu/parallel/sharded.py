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


# ---------------------------------------------------------------------------
# Engine-level sharded window step (frontend data-parallel over the mesh)
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "axis_name", "samp_h", "samp_w", "max_planes",
        "num_hypotheses", "smoothing_size", "strict_frames",
        "use_rtabmap_offset", "max_iterations", "min_edges", "rel_tol",
        "max_cg_iters",
    ),
)
def sharded_window_step(
    graph: GraphState,
    table,
    odoms,          # [B,7] stacked keyframe odometry (prefix-valid rows)
    row_valid,      # [B] bool
    prev_odom7,
    has_prev,
    info6,
    points,         # [B,H,W,3]
    cloud_valid,    # [B,H,W]
    boxes,          # [B,D,4]
    class_ids,
    probs,
    robot_xyzrpy,   # [B,6]
    cam_angle,
    num_point_seg,
    norm_point_thres,
    planar_area,
    distance_thres,
    cos_angular_thres,
    use_maha,
    maha_thres,
    eq_thres,
    land_noise,
    use_plane_gate,
    plane_cos_thres,
    plane_offset_thres,
    lm_info3,
    mesh: Mesh,
    axis_name: str = "shard",
    samp_h: int = 32,
    samp_w: int = 32,
    max_planes: int = 1,
    num_hypotheses: int = 16,
    smoothing_size: int = 5,
    strict_frames: bool = True,
    use_rtabmap_offset: bool = False,
    max_iterations: int = 8,
    min_edges: int = 1,
    rel_tol: float = 1e-6,
    max_cg_iters: int = 32,
):
    """The FULL keyframe pipeline, distributed: the whole window tick —
    keyframe ingest, frontend, sequential association, landmark ingest,
    matrix-free LM solve — compiles and runs under the mesh.

    * frontend (backprojection-free xyz path): window rows are
      data-parallel — ``shard_map`` over the B axis, each device segmenting
      B/n keyframes' pixels (the wide work of SURVEY §2's parallelism
      inventory);
    * association + landmark ingest: the genuinely sequential tail, shares
      ``runtime.engine._window_assoc_scan`` with the single-chip window
      program (XLA all-gathers the B/n detection rows off the mesh — tiny
      [B,D,*] tensors);
    * solve: edge-sharded matrix-free PCG (``pcg.sharded_lm_optimize_pcg``
      body semantics) over the same mesh.

    Single-chip equivalence is pinned by
    tests/test_sharded_window.py; ``__graft_entry__.dryrun_multichip`` runs
    it as the fifth dryrun line.
    """
    from semantic_slam_tpu.frontend import segmentation as seg_mod
    from semantic_slam_tpu.runtime import engine as eng
    from semantic_slam_tpu.solver import pcg as pcg_mod

    n = mesh.shape[axis_name]
    B = odoms.shape[0]
    assert B % n == 0, "window rows must divide the mesh"

    base = graph.num_poses
    graph = eng._ingest_keyframes_batch(
        graph, odoms, row_valid, prev_odom7, has_prev, info6
    )
    kf_idx = base + jnp.cumsum(row_valid.astype(jnp.int32)) - 1

    def seg_body(pts, cv, bx, ci, pr, rxy):
        return jax.vmap(
            lambda p, c, b, i, q, r: seg_mod.segment_all(
                p, c, b, i, q, r, cam_angle, num_point_seg, norm_point_thres,
                planar_area, distance_thres, cos_angular_thres,
                samp_h=samp_h, samp_w=samp_w, max_planes=max_planes,
                num_hypotheses=num_hypotheses, smoothing_size=smoothing_size,
                strict_frames=strict_frames,
            )
        )(pts, cv, bx, ci, pr, rxy)

    dets_stack = jax.shard_map(
        seg_body,
        mesh=mesh,
        in_specs=(P(axis_name),) * 6,
        out_specs=P(axis_name),
        check_vma=False,
    )(points, cloud_valid, boxes, class_ids, probs, robot_xyzrpy)

    graph, table = eng._window_assoc_scan(
        graph, table, dets_stack, robot_xyzrpy, row_valid, kf_idx, cam_angle,
        use_maha, maha_thres, eq_thres, land_noise, use_plane_gate,
        plane_cos_thres, plane_offset_thres, lm_info3,
        strict_frames=strict_frames, use_rtabmap_offset=use_rtabmap_offset,
    )

    graph, stats = pcg_mod.sharded_lm_optimize_pcg(
        graph, mesh, axis_name=axis_name, max_iterations=max_iterations,
        min_edges=min_edges, rel_tol=rel_tol, max_cg_iters=max_cg_iters,
    )
    return graph, table, stats
