"""Device-resident pose graph: fixed-capacity arrays + masks.

The reference grows a ``g2o::SparseOptimizer`` freely on the heap
(``/root/reference/src/ps_graph_slam/graph_slam.cpp:104-180``). XLA wants
static shapes, so the TPU design keeps the whole graph in pre-allocated
arrays: SE(3) keyframe nodes ``[K,7]``, point landmarks ``[L,3]``, SE3-SE3
odometry edges and SE3-point observation edges as index arrays. Active
entries are the prefix ``[:count]``; everything is masked by comparing an
iota against the counts, so all mutation ops are jit-safe scatter updates.

Vertex-id semantics match the reference: the first SE(3) node is gauge-fixed
(graph_slam.cpp:108-111).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from semantic_slam_tpu.core import geometry as geo


class GraphState(NamedTuple):
    # SE(3) keyframe nodes (pose7 = [t, q_wxyz])
    poses: jax.Array  # [K, 7]
    num_poses: jax.Array  # i32 scalar
    # point landmark nodes
    landmarks: jax.Array  # [L, 3]
    num_landmarks: jax.Array  # i32 scalar
    # SE3-SE3 odometry edges: pose_i -> pose_j with measured relative pose
    odom_i: jax.Array  # [E1] i32
    odom_j: jax.Array  # [E1] i32
    odom_meas: jax.Array  # [E1, 7]
    odom_info: jax.Array  # [E1, 6, 6]
    num_odom: jax.Array  # i32 scalar
    # SE3-point edges: pose_k observes landmark_l at meas (sensor frame)
    lme_k: jax.Array  # [E2] i32
    lme_l: jax.Array  # [E2] i32
    lme_meas: jax.Array  # [E2, 3]
    lme_info: jax.Array  # [E2, 3, 3]
    num_lme: jax.Array  # i32 scalar

    @property
    def max_poses(self) -> int:
        return self.poses.shape[0]

    @property
    def max_landmarks(self) -> int:
        return self.landmarks.shape[0]

    def pose_mask(self) -> jax.Array:
        return jnp.arange(self.poses.shape[0]) < self.num_poses

    def landmark_mask(self) -> jax.Array:
        return jnp.arange(self.landmarks.shape[0]) < self.num_landmarks

    def odom_mask(self) -> jax.Array:
        return jnp.arange(self.odom_i.shape[0]) < self.num_odom

    def lme_mask(self) -> jax.Array:
        return jnp.arange(self.lme_k.shape[0]) < self.num_lme

    def num_edges(self) -> jax.Array:
        """Total active edge count (the reference's optimize() gate operand,
        graph_slam.cpp:184)."""
        return self.num_odom + self.num_lme


def make_graph(
    max_poses: int = 512,
    max_landmarks: int = 128,
    max_odom_edges: int = 512,
    max_landmark_edges: int = 2048,
    dtype=jnp.float32,
) -> GraphState:
    ident = jnp.tile(geo.pose_identity(dtype), (max_poses, 1))
    return GraphState(
        poses=ident,
        num_poses=jnp.zeros((), jnp.int32),
        landmarks=jnp.zeros((max_landmarks, 3), dtype),
        num_landmarks=jnp.zeros((), jnp.int32),
        odom_i=jnp.zeros((max_odom_edges,), jnp.int32),
        odom_j=jnp.zeros((max_odom_edges,), jnp.int32),
        odom_meas=jnp.tile(geo.pose_identity(dtype), (max_odom_edges, 1)),
        odom_info=jnp.zeros((max_odom_edges, 6, 6), dtype),
        num_odom=jnp.zeros((), jnp.int32),
        lme_k=jnp.zeros((max_landmark_edges,), jnp.int32),
        lme_l=jnp.zeros((max_landmark_edges,), jnp.int32),
        lme_meas=jnp.zeros((max_landmark_edges, 3), dtype),
        lme_info=jnp.zeros((max_landmark_edges, 3, 3), dtype),
        num_lme=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# jit-safe mutation ops (functional; return new state + assigned index)
# ---------------------------------------------------------------------------


def add_se3_node(g: GraphState, pose7: jax.Array) -> tuple[GraphState, jax.Array]:
    """Append an SE(3) node (g2o add_se3_node, graph_slam.cpp:104-115).

    The first node is implicitly gauge-fixed by the solver.
    """
    idx = g.num_poses
    return g._replace(
        poses=g.poses.at[idx].set(pose7.astype(g.poses.dtype)),
        num_poses=idx + 1,
    ), idx


def add_point_node(g: GraphState, xyz: jax.Array) -> tuple[GraphState, jax.Array]:
    idx = g.num_landmarks
    return g._replace(
        landmarks=g.landmarks.at[idx].set(xyz.astype(g.landmarks.dtype)),
        num_landmarks=idx + 1,
    ), idx


def add_se3_edge(
    g: GraphState, i: jax.Array, j: jax.Array, meas7: jax.Array, info66: jax.Array
) -> GraphState:
    e = g.num_odom
    return g._replace(
        odom_i=g.odom_i.at[e].set(jnp.asarray(i, jnp.int32)),
        odom_j=g.odom_j.at[e].set(jnp.asarray(j, jnp.int32)),
        odom_meas=g.odom_meas.at[e].set(meas7.astype(g.odom_meas.dtype)),
        odom_info=g.odom_info.at[e].set(info66.astype(g.odom_info.dtype)),
        num_odom=e + 1,
    )


def add_se3_point_edge(
    g: GraphState, k: jax.Array, l: jax.Array, meas3: jax.Array, info33: jax.Array
) -> GraphState:
    e = g.num_lme
    return g._replace(
        lme_k=g.lme_k.at[e].set(jnp.asarray(k, jnp.int32)),
        lme_l=g.lme_l.at[e].set(jnp.asarray(l, jnp.int32)),
        lme_meas=g.lme_meas.at[e].set(meas3.astype(g.lme_meas.dtype)),
        lme_info=g.lme_info.at[e].set(info33.astype(g.lme_info.dtype)),
        num_lme=e + 1,
    )


def grow_graph(g: GraphState, factor: int = 2) -> GraphState:
    """Double capacities host-side (recompile point — see SURVEY.md §7
    'Static shapes vs. a growing graph'). Not jittable by design."""
    K, L, E1, E2 = (
        g.poses.shape[0] * factor,
        g.landmarks.shape[0] * factor,
        g.odom_i.shape[0] * factor,
        g.lme_k.shape[0] * factor,
    )
    big = make_graph(K, L, E1, E2, dtype=g.poses.dtype)

    def put(dst, src):
        return dst.at[: src.shape[0]].set(src)

    return GraphState(
        poses=put(big.poses, g.poses),
        num_poses=g.num_poses,
        landmarks=put(big.landmarks, g.landmarks),
        num_landmarks=g.num_landmarks,
        odom_i=put(big.odom_i, g.odom_i),
        odom_j=put(big.odom_j, g.odom_j),
        odom_meas=put(big.odom_meas, g.odom_meas),
        odom_info=put(big.odom_info, g.odom_info),
        num_odom=g.num_odom,
        lme_k=put(big.lme_k, g.lme_k),
        lme_l=put(big.lme_l, g.lme_l),
        lme_meas=put(big.lme_meas, g.lme_meas),
        lme_info=put(big.lme_info, g.lme_info),
        num_lme=g.num_lme,
    )
