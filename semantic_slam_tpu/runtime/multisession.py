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
    return merged, np.asarray(owner, np.int64)


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
