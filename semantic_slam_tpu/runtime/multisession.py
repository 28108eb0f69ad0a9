"""Multi-session map merging + joint (sharded) bundle adjustment.

BASELINE.json config #5: "Multi-session merged map: concatenated sequences
with pose-graph sharded across N>=2 hosts, distributed Schur-complement BA".
The reference has nothing like this (single process, state dies at
shutdown); here sessions are first-class: each session is an engine
checkpoint / graph, and merging

  1. concatenates pose nodes and odometry edges with index offsets (each
     session keeps its own gauge chain; session 0's first pose stays the
     global gauge anchor),
  2. cross-associates landmarks between sessions (same class + plane type +
     within the Euclidean merge radius -> unified landmark id), which is
    what ties the sessions into one frame,
  3. re-targets observation edges to the unified landmark ids,
  4. runs joint BA — single-chip or edge-sharded over a device mesh.

Sessions are assumed coarsely co-registered (shared world frame from their
VIO origin, like repeated runs from the same takeoff point); residual
inter-session drift is exactly what the shared landmarks + joint BA remove.
"""

from __future__ import annotations

import numpy as np

from semantic_slam_tpu.graph.state import GraphState


def merge_graphs(
    graphs: list[GraphState],
    tables: list,
    merge_radius: float = 1.0,
    dtype=None,
) -> tuple[GraphState, np.ndarray]:
    """Merge session graphs; returns (merged GraphState, landmark_owner).

    landmark_owner[i] = session index that contributed merged landmark i.
    Host-side (numpy) graph surgery — merging is a rare offline operation;
    the heavy part (joint BA) stays on device afterwards.
    """
    merged, owner, _, _, _ = _merge_core(graphs, tables, merge_radius, dtype)
    return merged, owner


def _merge_core(
    graphs: list[GraphState],
    tables: list,
    merge_radius: float = 1.0,
    dtype=None,
):
    """merge_graphs internals; additionally returns the per-session
    landmark remaps, owner local ids and pose offsets (what the
    planar-patch merge needs to unify plane nodes/edges)."""
    import jax.numpy as jnp

    from semantic_slam_tpu.graph import state as gs

    dtype = dtype or graphs[0].poses.dtype

    # --- gather host copies ----------------------------------------------
    sessions = []
    for g, t in zip(graphs, tables):
        K = int(g.num_poses)
        L = int(g.num_landmarks)
        sessions.append(
            {
                "poses": np.asarray(g.poses[:K], np.float64),
                "lms": np.asarray(g.landmarks[:L], np.float64),
                "lm_class": np.asarray(t.class_id[:L]),
                "lm_ptype": np.asarray(t.plane_type[:L]),
                "oi": np.asarray(g.odom_i[: int(g.num_odom)]),
                "oj": np.asarray(g.odom_j[: int(g.num_odom)]),
                "om": np.asarray(g.odom_meas[: int(g.num_odom)], np.float64),
                "oinfo": np.asarray(g.odom_info[: int(g.num_odom)], np.float64),
                "lk": np.asarray(g.lme_k[: int(g.num_lme)]),
                "ll": np.asarray(g.lme_l[: int(g.num_lme)]),
                "lmeas": np.asarray(g.lme_meas[: int(g.num_lme)], np.float64),
                "linfo": np.asarray(g.lme_info[: int(g.num_lme)], np.float64),
            }
        )

    # --- cross-session landmark unification ------------------------------
    uni_pos: list[np.ndarray] = []
    uni_class: list[int] = []
    uni_ptype: list[int] = []
    owner: list[int] = []
    owner_local: list[int] = []  # owner's LOCAL landmark id per unified id
    lm_map: list[np.ndarray] = []  # per session: local id -> unified id
    for si, s in enumerate(sessions):
        mapping = np.zeros(len(s["lms"]), np.int64)
        for li in range(len(s["lms"])):
            pos = s["lms"][li]
            cid = int(s["lm_class"][li])
            pt = int(s["lm_ptype"][li])
            best, bestd = -1, merge_radius
            for ui in range(len(uni_pos)):
                if uni_class[ui] == cid and uni_ptype[ui] == pt:
                    d = float(np.linalg.norm(uni_pos[ui] - pos))
                    if d < bestd:
                        best, bestd = ui, d
            if best < 0:
                best = len(uni_pos)
                uni_pos.append(pos.copy())
                uni_class.append(cid)
                uni_ptype.append(pt)
                owner.append(si)
                owner_local.append(li)
            mapping[li] = best
        lm_map.append(mapping)

    # --- concatenate with offsets ----------------------------------------
    pose_off = np.cumsum([0] + [len(s["poses"]) for s in sessions[:-1]])
    poses = np.concatenate([s["poses"] for s in sessions])
    lms = np.stack(uni_pos) if uni_pos else np.zeros((0, 3))

    oi = np.concatenate([s["oi"] + pose_off[i] for i, s in enumerate(sessions)])
    oj = np.concatenate([s["oj"] + pose_off[i] for i, s in enumerate(sessions)])
    om = np.concatenate([s["om"] for s in sessions])
    oinfo = np.concatenate([s["oinfo"] for s in sessions])
    lk = np.concatenate([s["lk"] + pose_off[i] for i, s in enumerate(sessions)])
    ll = np.concatenate([lm_map[i][s["ll"]] for i, s in enumerate(sessions)])
    lmeas = np.concatenate([s["lmeas"] for s in sessions])
    linfo = np.concatenate([s["linfo"] for s in sessions])

    def cap(n, lo=16):
        c = lo
        while c < n:
            c *= 2
        return c

    K, L = len(poses), max(len(lms), 1)
    E1, E2 = max(len(oi), 1), max(len(lk), 1)
    merged = gs.make_graph(cap(K), cap(L), cap(E1), cap(E2), dtype=dtype)
    merged = merged._replace(
        poses=merged.poses.at[:K].set(jnp.asarray(poses, dtype)),
        num_poses=jnp.asarray(K, jnp.int32),
        landmarks=merged.landmarks.at[: len(lms)].set(jnp.asarray(lms, dtype)),
        num_landmarks=jnp.asarray(len(lms), jnp.int32),
        odom_i=merged.odom_i.at[: len(oi)].set(jnp.asarray(oi, jnp.int32)),
        odom_j=merged.odom_j.at[: len(oj)].set(jnp.asarray(oj, jnp.int32)),
        odom_meas=merged.odom_meas.at[: len(om)].set(jnp.asarray(om, dtype)),
        odom_info=merged.odom_info.at[: len(oinfo)].set(jnp.asarray(oinfo, dtype)),
        num_odom=jnp.asarray(len(oi), jnp.int32),
        lme_k=merged.lme_k.at[: len(lk)].set(jnp.asarray(lk, jnp.int32)),
        lme_l=merged.lme_l.at[: len(ll)].set(jnp.asarray(ll, jnp.int32)),
        lme_meas=merged.lme_meas.at[: len(lmeas)].set(jnp.asarray(lmeas, dtype)),
        lme_info=merged.lme_info.at[: len(linfo)].set(jnp.asarray(linfo, dtype)),
        num_lme=jnp.asarray(len(lk), jnp.int32),
    )
    return (
        merged,
        np.asarray(owner, np.int64),
        lm_map,
        np.asarray(owner_local, np.int64),
        pose_off,
    )


def merge_graphs_planes(
    graphs: list[GraphState],
    tables: list,
    plane_nodes: list,
    merge_radius: float = 1.0,
    dtype=None,
):
    """Planar-patch multi-session merge: the point part is ``merge_graphs``
    verbatim; plane nodes ride the SAME landmark unification (plane node i
    is landmark i's patch by the engine invariant), taking the owner
    session's plane parameters for each unified landmark, and SE3-plane
    edges re-target through the pose offsets / landmark remaps.

    Returns (merged GraphState, merged PlaneNodes, landmark_owner).
    """
    import jax.numpy as jnp

    from semantic_slam_tpu.graph.planes import make_planes

    dtype = dtype or graphs[0].poses.dtype
    merged, owner, lm_map, owner_local, pose_off = _merge_core(
        graphs, tables, merge_radius, dtype
    )

    # unified plane parameters from each owner session
    uni_planes = np.stack(
        [
            np.asarray(plane_nodes[s].planes[li], np.float64)
            for s, li in zip(owner, owner_local)
        ]
    ) if len(owner) else np.zeros((0, 4))

    # concatenate + re-target SE3-plane edges
    pe_k, pe_p, pe_meas, pe_info = [], [], [], []
    for si, pn in enumerate(plane_nodes):
        n = int(pn.num_pe)
        pe_k.append(np.asarray(pn.pe_k[:n]) + pose_off[si])
        pe_p.append(lm_map[si][np.asarray(pn.pe_p[:n])])
        pe_meas.append(np.asarray(pn.pe_meas[:n], np.float64))
        pe_info.append(np.asarray(pn.pe_info[:n], np.float64))
    pe_k = np.concatenate(pe_k) if pe_k else np.zeros((0,), np.int64)
    pe_p = np.concatenate(pe_p) if pe_p else np.zeros((0,), np.int64)
    pe_meas = (
        np.concatenate(pe_meas) if pe_meas else np.zeros((0, 4))
    )
    pe_info = (
        np.concatenate(pe_info) if pe_info else np.zeros((0, 3, 3))
    )

    def cap(n, lo=16):
        c = lo
        while c < n:
            c *= 2
        return c

    Pl = len(uni_planes)
    pn_m = make_planes(
        merged.landmarks.shape[0], cap(max(len(pe_k), 1)), dtype=dtype
    )
    pn_m = pn_m._replace(
        planes=pn_m.planes.at[:Pl].set(jnp.asarray(uni_planes, dtype)),
        num_planes=jnp.asarray(Pl, jnp.int32),
        pe_k=pn_m.pe_k.at[: len(pe_k)].set(jnp.asarray(pe_k, jnp.int32)),
        pe_p=pn_m.pe_p.at[: len(pe_p)].set(jnp.asarray(pe_p, jnp.int32)),
        pe_meas=pn_m.pe_meas.at[: len(pe_meas)].set(jnp.asarray(pe_meas, dtype)),
        pe_info=pn_m.pe_info.at[: len(pe_info)].set(jnp.asarray(pe_info, dtype)),
        num_pe=jnp.asarray(len(pe_k), jnp.int32),
    )
    return merged, pn_m, owner


def joint_bundle_adjust_planes(
    merged: GraphState,
    pn,
    mesh=None,
    axis_name: str = "shard",
    max_iterations: int = 64,
):
    """Joint planar-patch BA over the merged graph — sharded when a mesh is
    given (edge capacities must divide the mesh; make_planes pads them)."""
    from semantic_slam_tpu.solver import pcg as pcg_mod

    if mesh is None:
        from semantic_slam_tpu.graph.planes import lm_optimize_with_planes

        return lm_optimize_with_planes(merged, pn, max_iterations=max_iterations)
    from semantic_slam_tpu.parallel.sharded import shard_graph_edges

    merged = shard_graph_edges(merged, mesh, axis_name)
    g, pn, stats = pcg_mod.sharded_lm_optimize_pcg_planes(
        merged, pn, mesh, axis_name, max_iterations=max_iterations
    )
    return (g, pn, stats)


def joint_bundle_adjust(
    merged: GraphState,
    mesh=None,
    axis_name: str = "shard",
    max_iterations: int = 64,
):
    """Joint BA over the merged graph — sharded when a mesh is given."""
    if mesh is None:
        from semantic_slam_tpu.solver.lm import lm_optimize

        return lm_optimize(merged, max_iterations=max_iterations)
    from semantic_slam_tpu.parallel.sharded import shard_graph_edges, sharded_lm_optimize

    merged = shard_graph_edges(merged, mesh, axis_name)
    return sharded_lm_optimize(
        merged, mesh, axis_name, max_iterations=max_iterations
    )
