"""Semantic landmark data association (vectorized Mahalanobis/Euclidean NN).

TPU re-design of ``class data_association``
(``/root/reference/include/ps_graph_slam/data_association.h``): a fixed-
capacity landmark table lives on device; for each detection the distance to
*every* landmark is computed in one shot (masked by class and plane-type
equality, ``data_association.h:122-124``), gated by either the Mahalanobis
distance ``z^T (Sigma + Q)^-1 z`` with Sigma the graph marginal
(``:167-186``) or the Euclidean distance (``:187-193``). Detections scan
sequentially (lax.scan) because the reference lets a detection match a
landmark created by an earlier detection of the same frame (the table grows
inside the loop, ``:237-276``).

Reference quirks handled:
  * ``distance_min`` not being reset per detection (SURVEY quirk 2) is a
    bug we FIX (each detection gets a fresh min); divergence documented.
  * For landmarks created in the current frame the reference dereferences an
    unassigned g2o node pointer (UB); we use the stored world pose instead.
  * First-frame semantics: when the table is empty at frame start, all
    detections map to new landmarks without any matching (``:79-85``) —
    including no intra-frame matching, unlike the associate path.
  * Matched detections do NOT update the stored landmark pose (the reference
    table is only refreshed by the optimizer via node estimates / marginals).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from semantic_slam_tpu.core import frames
from semantic_slam_tpu.frontend.segmentation import DetectedObjects
from semantic_slam_tpu.solver.lm import inv33


class LandmarkTable(NamedTuple):
    world: jax.Array  # [L, 3] current estimate (synced from graph)
    cov: jax.Array  # [L, 3, 3] marginal covariance (synced after optimize)
    class_id: jax.Array  # [L] i32
    plane_type: jax.Array  # [L] i32
    normal: jax.Array  # [L, 4] world-frame plane coeffs (viz/type only)
    count: jax.Array  # i32 scalar

    @property
    def capacity(self) -> int:
        return self.world.shape[0]

    def mask(self) -> jax.Array:
        return jnp.arange(self.world.shape[0]) < self.count


def make_table(capacity: int, dtype=jnp.float32) -> LandmarkTable:
    return LandmarkTable(
        world=jnp.zeros((capacity, 3), dtype),
        cov=jnp.tile(jnp.eye(3, dtype=dtype), (capacity, 1, 1)),
        class_id=jnp.full((capacity,), -1, jnp.int32),
        plane_type=jnp.full((capacity,), -1, jnp.int32),
        normal=jnp.zeros((capacity, 4), dtype),
        count=jnp.zeros((), jnp.int32),
    )


class AssocResult(NamedTuple):
    """Per-detection association outcome, aligned with DetectedObjects."""

    valid: jax.Array  # [M] bool
    lm_id: jax.Array  # [M] i32 landmark table / graph index
    is_new: jax.Array  # [M] bool
    local_pose: jax.Array  # [M, 3] measurement in robot frame (edge meas)
    world_pose: jax.Array  # [M, 3] world centroid (new-node init)


def associate(
    table: LandmarkTable,
    dets: DetectedObjects,
    robot_xyzrpy: jax.Array,
    cam_angle: jax.Array,
    use_maha: jax.Array,  # bool scalar
    maha_thres: jax.Array,
    eq_thres: jax.Array,
    land_noise: jax.Array,  # Q_ diagonal value (used as variance, :64-66)
    strict_frames: bool = True,
    rtabmap_y_offset: bool = False,
    use_plane_gate: jax.Array | bool = False,
    plane_cos_thres: jax.Array | float = 0.866,
    plane_offset_thres: jax.Array | float = 0.5,
) -> tuple[LandmarkTable, AssocResult]:
    """Vectorized association with exact sequential-table semantics.

    Instead of a lax.scan over detections (hostile per-step overhead on
    TPU), all distances are precomputed in two dense blocks:

      * ``d_exist [M,L]`` — every detection vs every existing landmark
        (Mahalanobis uses the per-landmark marginal + Q),
      * ``d_intra [M,M]`` — every detection vs every EARLIER detection
        treated as a freshly created landmark (whose covariance is Q, so
        Mahalanobis uses (Q+Q)^-1) — the reference's grow-inside-the-loop
        behavior (data_association.h:237-276).

    The only sequential part left is the boolean recurrence "did detection
    j become a new landmark" — an unrolled M-step loop over [M] vectors.
    Ties/ordering match the reference: candidate order is existing table
    first, then intra-frame news in detection order, first minimum wins.
    """
    dtype = table.world.dtype
    L = table.capacity
    M = dets.valid.shape[0]
    count0 = table.count
    first_frame = count0 == 0
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    # Pre-compute world/robot-frame measurements for all detections at once.
    w_all = frames.convert_pose_to_world(
        robot_xyzrpy, cam_angle, dets.pose_cam, strict=strict_frames,
        rtabmap_y_offset=rtabmap_y_offset,
    ).astype(dtype)
    n_all = frames.convert_normal_to_world(
        robot_xyzrpy, cam_angle, dets.normal_cam, strict=strict_frames
    ).astype(dtype)
    local_all = frames.convert_cam_to_robot(cam_angle, dets.pose_cam).astype(dtype)

    Q_meas = jnp.eye(3, dtype=dtype) * land_noise
    thres = jnp.where(use_maha, maha_thres, eq_thres).astype(dtype)

    # --- detections vs existing landmarks: [M, L] ------------------------
    active = table.mask()
    type_ok = (
        active[None, :]
        & (table.class_id[None, :] == dets.class_id[:, None])
        & (table.plane_type[None, :] == dets.plane_type[:, None])
    )

    # optional plane-aware gate (beyond the reference's h/v label): world
    # normals must agree within the angle threshold AND the plane offsets
    # within the offset threshold. The stored 4th coefficient is the raw
    # cam-frame d (rotation-only chain, data_association.h:345-359), which is
    # NOT viewpoint-invariant — so offsets are re-derived through the world
    # centroids as d = -n . c. (n,d) ~ (-n,-d) invariance via |dot| + sign
    # alignment.
    use_pg = jnp.asarray(use_plane_gate, bool)

    def _plane_gate(na, ca, nb, cb):
        """Normals na [A,3] @ centroids ca [A,3] vs nb/cb [B,..] -> ok [A,B]."""
        na_u = na / jnp.maximum(jnp.linalg.norm(na, axis=-1, keepdims=True), 1e-12)
        nb_u = nb / jnp.maximum(jnp.linalg.norm(nb, axis=-1, keepdims=True), 1e-12)
        da = -jnp.sum(na_u * ca, axis=-1)
        db = -jnp.sum(nb_u * cb, axis=-1)
        ndot = jnp.einsum("ad,bd->ab", na_u, nb_u)
        s = jnp.where(ndot < 0, -1.0, 1.0).astype(dtype)
        angle_ok = jnp.abs(ndot) >= plane_cos_thres
        off_ok = jnp.abs(da[:, None] - s * db[None, :]) <= plane_offset_thres
        return angle_ok & off_ok
    z = w_all[:, None, :] - table.world[None, :, :]  # [M, L, 3]
    d_eq = jnp.linalg.norm(z, axis=-1)
    Qm_inv = inv33(table.cov + Q_meas[None])  # [L, 3, 3]
    d_maha = jnp.einsum("mli,lij,mlj->ml", z, Qm_inv, z)
    pg_exist = _plane_gate(n_all[:, :3], w_all, table.normal[:, :3], table.world)
    type_ok = type_ok & (pg_exist | ~use_pg)
    d_exist = jnp.where(use_maha, d_maha, d_eq)
    d_exist = jnp.where(type_ok & (~first_frame), d_exist, big)

    # --- detections vs earlier in-frame detections-as-landmarks: [M, M] --
    dz = w_all[:, None, :] - w_all[None, :, :]
    d_eq2 = jnp.linalg.norm(dz, axis=-1)
    twoQ_inv = inv33(2.0 * Q_meas)
    d_maha2 = jnp.einsum("mni,ij,mnj->mn", dz, twoQ_inv, dz)
    d_intra_raw = jnp.where(use_maha, d_maha2, d_eq2)
    earlier = jnp.tril(jnp.ones((M, M), bool), k=-1)
    pg_intra = _plane_gate(n_all[:, :3], w_all, n_all[:, :3], w_all)
    pair_type_ok = (
        earlier
        & dets.valid[None, :]
        & (dets.class_id[None, :] == dets.class_id[:, None])
        & (dets.plane_type[None, :] == dets.plane_type[:, None])
        & (pg_intra | ~use_pg)
    ) & (~first_frame)

    # --- sequential recurrence: which detections become new landmarks ----
    # unrolled (M is small and static); each step is a few [M]/[L] vector ops
    is_new = jnp.zeros((M,), bool)
    min_exist = jnp.min(d_exist, axis=1)  # [M]
    any_exist = jnp.any(type_ok & (~first_frame), axis=1)  # [M]
    for i in range(M):
        cand_i = pair_type_ok[i] & is_new  # earlier dets that became new
        found = any_exist[i] | jnp.any(cand_i)
        dmin = jnp.minimum(
            min_exist[i], jnp.min(jnp.where(cand_i, d_intra_raw[i], big))
        )
        matched = found & (dmin <= thres)
        is_new = is_new.at[i].set(dets.valid[i] & jnp.logical_not(matched))

    # --- landmark ids ----------------------------------------------------
    new_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # [M]
    new_ids = count0 + new_rank
    # joint candidate row: [L existing..., M intra in detection order]
    d_intra = jnp.where(pair_type_ok & is_new[None, :], d_intra_raw, big)
    all_d = jnp.concatenate([d_exist, d_intra], axis=1)  # [M, L+M]
    best = jnp.argmin(all_d, axis=1)
    intra_best = best >= L
    matched_id = jnp.where(
        intra_best, count0 + new_rank[jnp.clip(best - L, 0, M - 1)], best
    ).astype(jnp.int32)
    lm_id = jnp.where(is_new, new_ids, matched_id)

    # --- vectorized table update (out-of-bounds scatter drops) -----------
    tgt = jnp.where(is_new, new_ids, L)  # L == drop slot
    table = LandmarkTable(
        world=table.world.at[tgt].set(w_all, mode="drop"),
        cov=table.cov.at[tgt].set(
            jnp.broadcast_to(Q_meas, (M, 3, 3)), mode="drop"
        ),
        class_id=table.class_id.at[tgt].set(dets.class_id, mode="drop"),
        plane_type=table.plane_type.at[tgt].set(dets.plane_type, mode="drop"),
        normal=table.normal.at[tgt].set(n_all, mode="drop"),
        count=count0 + jnp.sum(is_new.astype(jnp.int32)),
    )

    return table, AssocResult(
        valid=dets.valid,
        lm_id=lm_id,
        is_new=is_new,
        local_pose=local_all,
        world_pose=w_all,
    )


def sync_from_graph(
    table: LandmarkTable, graph_landmarks: jax.Array, marginals: jax.Array
) -> LandmarkTable:
    """Refresh table estimates/covariances from the optimizer.

    Equivalent of the reference reading ``node->estimate()`` during matching
    and ``setLandmarkCovs`` after ``computeLandmarkMarginals``
    (``semantic_graph_slam.cpp:181-205``). Landmark ids are graph indices by
    construction, so this is a masked copy.
    """
    m = table.mask()
    return table._replace(
        world=jnp.where(m[:, None], graph_landmarks[: table.capacity], table.world),
        cov=jnp.where(m[:, None, None], marginals[: table.capacity], table.cov),
    )
