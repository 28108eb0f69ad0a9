"""Checkpoint / resume for the whole engine state.

The reference can only dump its graph at shutdown (``saveGraph``,
``graph_slam.cpp:236-239``) — a crashed node loses everything and there is
no load path (SURVEY.md §5). Here checkpointing is a real subsystem: the
complete solver + association + trajectory state round-trips through one
compressed npz, so long multi-session runs can stop/resume and multi-host
jobs can recover.

Keyframe clouds are NOT checkpointed (they are replay-log data, already on
disk); everything derived from them is.
"""

from __future__ import annotations

import collections
import json

import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.assoc.association import LandmarkTable
from semantic_slam_tpu.graph.planes import PlaneNodes
from semantic_slam_tpu.graph.state import GraphState
from semantic_slam_tpu.solver.fixed_lag import MarginalPrior

# Pre-plane-prior MarginalPrior layout (9 fields) — restore template for
# orbax checkpoints written before Hpl/pl_ref/gpl0 existed.
_LegacyMarginalPrior = collections.namedtuple(
    "_LegacyMarginalPrior",
    ["p_idx", "p_ref", "Hp", "gp0", "num_p", "Hl", "l_ref", "gl0", "c0"],
)


def save_checkpoint(path: str, engine) -> None:
    g = engine.graph
    t = engine.table
    kf_meta = [
        {
            "stamp": k.stamp,
            "odom": k.odom.tolist(),
            "robot_pose": k.robot_pose.tolist(),
            "accum_distance": k.accum_distance,
            "node_idx": k.node_idx,
        }
        for k in engine.keyframes
    ]
    gate = engine.gate
    meta = {
        "keyframes": kf_meta,
        "gate": {
            "is_first": gate.is_first,
            "accum_distance": gate.accum_distance,
            "prev_keypose": gate.prev_keypose.tolist(),
            "prev_time": gate.prev_time,
        },
        "first_key_added": engine.first_key_added,
        "dtype": str(np.dtype(engine.dtype)),
        "stats_history": engine.stats_history,
        "kf_base": engine._kf_base,
    }
    np.savez_compressed(
        path,
        meta=json.dumps(meta),
        robot_pose=engine.robot_pose,
        vio_pose=engine.vio_pose,
        prev_odom=engine.prev_odom,
        map2odom=engine.map2odom,
        marginals=np.asarray(engine.marginals),
        robot_traj_t=np.array([s for s, _ in engine.robot_traj]),
        robot_traj_p=np.array([p for _, p in engine.robot_traj]).reshape(-1, 7),
        vio_traj_t=np.array([s for s, _ in engine.vio_traj]),
        vio_traj_p=np.array([p for _, p in engine.vio_traj]).reshape(-1, 7),
        **{f"g_{k}": np.asarray(v) for k, v in g._asdict().items()},
        **{f"t_{k}": np.asarray(v) for k, v in t._asdict().items()},
        **{f"p_{k}": np.asarray(v) for k, v in engine.plane_nodes._asdict().items()},
        **{f"fl_{k}": np.asarray(v) for k, v in engine.prior._asdict().items()},
        fl_archived=np.asarray(engine.archived_poses, np.float64).reshape(-1, 7),
    )


def load_checkpoint(path: str, engine) -> None:
    """Restore in place into a freshly-constructed engine (same config)."""
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    dtype = engine.dtype

    engine.graph = GraphState(
        **{
            k: jnp.asarray(
                z[f"g_{k}"],
                dtype=(
                    jnp.int32
                    if z[f"g_{k}"].dtype.kind == "i"
                    else dtype
                ),
            )
            for k in GraphState._fields
        }
    )
    engine.table = LandmarkTable(
        **{
            k: jnp.asarray(
                z[f"t_{k}"],
                dtype=(jnp.int32 if z[f"t_{k}"].dtype.kind == "i" else dtype),
            )
            for k in LandmarkTable._fields
        }
    )
    if "p_planes" in z.files:
        engine.plane_nodes = PlaneNodes(
            **{
                k: jnp.asarray(
                    z[f"p_{k}"],
                    dtype=(jnp.int32 if z[f"p_{k}"].dtype.kind == "i" else dtype),
                )
                for k in PlaneNodes._fields
            }
        )
    if "fl_Hp" in z.files:
        from semantic_slam_tpu.solver.fixed_lag import empty_prior

        # pre-plane-prior checkpoints lack fl_Hpl/fl_pl_ref/fl_gpl0 — fall
        # back to empty plane blocks sized to the restored plane capacity
        fresh = empty_prior(
            z["fl_Hl"].shape[0],
            PB=z["fl_Hp"].shape[0] // 6,
            Pl=engine.plane_nodes.planes.shape[0],
            dtype=dtype,
        )
        engine.prior = MarginalPrior(
            **{
                k: (
                    jnp.asarray(
                        z[f"fl_{k}"],
                        dtype=(
                            jnp.int32
                            if z[f"fl_{k}"].dtype.kind == "i"
                            else dtype
                        ),
                    )
                    if f"fl_{k}" in z.files
                    else getattr(fresh, k)
                )
                for k in MarginalPrior._fields
            }
        )
        engine.archived_poses = [p.copy() for p in z["fl_archived"]]
    engine.marginals = jnp.asarray(z["marginals"], dtype)
    engine.robot_pose = z["robot_pose"].astype(np.float64)
    engine.vio_pose = z["vio_pose"].astype(np.float64)
    engine.prev_odom = z["prev_odom"].astype(np.float64)
    engine.map2odom = z["map2odom"].astype(np.float64)
    engine.robot_traj = [
        (float(s), p.copy()) for s, p in zip(z["robot_traj_t"], z["robot_traj_p"])
    ]
    engine.vio_traj = [
        (float(s), p.copy()) for s, p in zip(z["vio_traj_t"], z["vio_traj_p"])
    ]
    _restore_keyframes_and_gate(engine, meta)


def _restore_keyframes_and_gate(engine, meta: dict) -> None:
    """Shared host-state restore (keyframe metadata, gate, flags) — used by
    both the npz and orbax loaders so the two backends cannot drift."""
    from semantic_slam_tpu.runtime.engine import KeyframeMeta

    engine.first_key_added = bool(meta["first_key_added"])
    engine.stats_history = meta["stats_history"]
    engine.keyframes = [
        KeyframeMeta(
            stamp=k["stamp"],
            odom=np.asarray(k["odom"]),
            robot_pose=np.asarray(k["robot_pose"]),
            accum_distance=k["accum_distance"],
            cloud=None,
            boxes=None,
            class_ids=None,
            probs=None,
            node_idx=k["node_idx"],
        )
        for k in meta["keyframes"]
    ]
    engine._kf_base = int(meta.get("kf_base", 0))
    gate = meta["gate"]
    engine.gate.is_first = bool(gate["is_first"])
    engine.gate.accum_distance = float(gate["accum_distance"])
    engine.gate.prev_keypose = np.asarray(gate["prev_keypose"])
    engine.gate.prev_time = float(gate["prev_time"])
    _restore_count_mirrors(engine)


def _restore_count_mirrors(engine) -> None:
    """Host mirrors of the device counts must match the restored graph —
    get_keyframe_poses()/capacity checks consume them before the next tick's
    stats fetch would refresh them."""
    engine._n_poses = int(engine.graph.num_poses)
    engine._n_landmarks = int(engine.graph.num_landmarks)
    engine._n_odom = int(engine.graph.num_odom)
    engine._n_lme = int(engine.graph.num_lme)


# ---------------------------------------------------------------------------
# Orbax backend (multi-host / async-friendly)
# ---------------------------------------------------------------------------


def _engine_pytree(engine) -> dict:
    return {
        "graph": engine.graph,
        "table": engine.table,
        "planes": engine.plane_nodes,
        "marginals": engine.marginals,
        "prior": engine.prior,
    }


def _engine_host_meta(engine) -> dict:
    gate = engine.gate
    return {
        "keyframes": [
            {
                "stamp": k.stamp,
                "odom": k.odom.tolist(),
                "robot_pose": k.robot_pose.tolist(),
                "accum_distance": k.accum_distance,
                "node_idx": k.node_idx,
            }
            for k in engine.keyframes
        ],
        "gate": {
            "is_first": gate.is_first,
            "accum_distance": gate.accum_distance,
            "prev_keypose": gate.prev_keypose.tolist(),
            "prev_time": gate.prev_time,
        },
        "first_key_added": engine.first_key_added,
        "stats_history": engine.stats_history,
        "kf_base": engine._kf_base,
        "archived_poses": [p.tolist() for p in engine.archived_poses],
        "robot_pose": engine.robot_pose.tolist(),
        "vio_pose": engine.vio_pose.tolist(),
        "prev_odom": engine.prev_odom.tolist(),
        "map2odom": engine.map2odom.tolist(),
        "robot_traj": [[s, p.tolist()] for s, p in engine.robot_traj],
        "vio_traj": [[s, p.tolist()] for s, p in engine.vio_traj],
        # capacities at save time: the engine grows its arrays by doubling,
        # so a fresh engine's shapes need not match — the loader rebuilds a
        # template at these sizes before asking orbax to restore
        "capacities": {
            "K": engine.graph.poses.shape[0],
            "L": engine.graph.landmarks.shape[0],
            "E1": engine.graph.odom_i.shape[0],
            "E2": engine.graph.lme_k.shape[0],
            "Pl": engine.plane_nodes.planes.shape[0],
            "E3": engine.plane_nodes.pe_k.shape[0],
            "PB": engine.prior.max_poses,
            "PL": engine.prior.Hl.shape[0],
            "PPl": engine.prior.Hpl.shape[0],
        },
    }


def save_checkpoint_orbax(path: str, engine) -> None:
    """Orbax-backed checkpoint: device pytrees go through
    ``StandardCheckpointer`` (sharding-aware, the multi-host path — each host
    writes its shards, unlike the npz route which funnels through one
    process); small host state rides alongside as JSON."""
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "device_state"), _engine_pytree(engine))
    ckptr.wait_until_finished()
    with open(os.path.join(path, "host_state.json"), "w") as f:
        json.dump(_engine_host_meta(engine), f)


def load_checkpoint_orbax(path: str, engine) -> None:
    import os

    import orbax.checkpoint as ocp

    import jax.numpy as jnp

    from semantic_slam_tpu.assoc.association import make_table
    from semantic_slam_tpu.graph.planes import make_planes
    from semantic_slam_tpu.graph.state import make_graph

    path = os.path.abspath(path)
    with open(os.path.join(path, "host_state.json")) as f:
        meta = json.load(f)

    # template at SAVED capacities (the session may have outgrown a fresh
    # engine's initial shapes via grow_graph doubling)
    caps = meta["capacities"]
    dtype = engine.dtype
    from semantic_slam_tpu.solver.fixed_lag import empty_prior

    template = {
        "graph": make_graph(caps["K"], caps["L"], caps["E1"], caps["E2"], dtype=dtype),
        "table": make_table(caps["L"], dtype=dtype),
        "planes": make_planes(caps["Pl"], caps["E3"], dtype=dtype),
        "marginals": jnp.tile(jnp.eye(3, dtype=dtype), (caps["L"], 1, 1)),
    }
    # the template tree must match the saved structure exactly: pre-fixed-lag
    # checkpoints have no prior subtree (no PB/PL caps), and pre-plane-prior
    # ones (no PPl cap) saved the 9-field legacy MarginalPrior
    legacy_prior = "PB" in caps and "PPl" not in caps
    if "PB" in caps:
        full = empty_prior(
            caps.get("PL", caps["L"]), PB=caps["PB"],
            Pl=caps.get("PPl", 0), dtype=dtype,
        )
        template["prior"] = (
            _LegacyMarginalPrior(
                *(getattr(full, f) for f in _LegacyMarginalPrior._fields)
            )
            if legacy_prior
            else full
        )
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.join(path, "device_state"), template)
    engine.graph = restored["graph"]
    engine.table = restored["table"]
    engine.plane_nodes = restored["planes"]
    engine.marginals = restored["marginals"]
    if "prior" in restored:
        prior = restored["prior"]
        if legacy_prior:
            # upgrade: empty plane blocks sized to the restored plane capacity
            fresh = empty_prior(
                prior.Hl.shape[0], PB=prior.p_idx.shape[0],
                Pl=caps["Pl"], dtype=dtype,
            )
            prior = MarginalPrior(
                **prior._asdict(),
                Hpl=fresh.Hpl, pl_ref=fresh.pl_ref, gpl0=fresh.gpl0,
            )
        engine.prior = prior
    engine.archived_poses = [
        np.asarray(p, np.float64) for p in meta.get("archived_poses", [])
    ]
    engine.robot_pose = np.asarray(meta["robot_pose"], np.float64)
    engine.vio_pose = np.asarray(meta["vio_pose"], np.float64)
    engine.prev_odom = np.asarray(meta["prev_odom"], np.float64)
    engine.map2odom = np.asarray(meta["map2odom"], np.float64)
    engine.robot_traj = [
        (float(s), np.asarray(p, np.float64)) for s, p in meta["robot_traj"]
    ]
    engine.vio_traj = [
        (float(s), np.asarray(p, np.float64)) for s, p in meta["vio_traj"]
    ]
    _restore_keyframes_and_gate(engine, meta)
