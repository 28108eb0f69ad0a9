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
) -> tuple[LandmarkTable, AssocResult]:
    dtype = table.world.dtype
    L = table.capacity
    first_frame = table.count == 0

    # Pre-compute world/robot-frame measurements for all detections at once
    # (pure rotations + adds — vectorized over M).
    w_all = frames.convert_pose_to_world(
        robot_xyzrpy, cam_angle, dets.pose_cam, strict=strict_frames,
        rtabmap_y_offset=rtabmap_y_offset,
    )
    n_all = frames.convert_normal_to_world(
        robot_xyzrpy, cam_angle, dets.normal_cam, strict=strict_frames
    )
    local_all = frames.convert_cam_to_robot(cam_angle, dets.pose_cam)

    Q_meas = jnp.eye(3, dtype=dtype) * land_noise

    def step(tab: LandmarkTable, inp):
        det_valid, cid, ptype, w, n4 = inp

        active = tab.mask()
        type_ok = active & (tab.class_id == cid) & (tab.plane_type == ptype)

        z = w[None, :] - tab.world  # [L, 3]
        d_eq = jnp.linalg.norm(z, axis=-1)
        Qm = tab.cov + Q_meas[None]
        d_maha = jnp.einsum("li,lij,lj->l", z, inv33(Qm), z)
        d = jnp.where(use_maha, d_maha, d_eq)
        thres = jnp.where(use_maha, maha_thres, eq_thres)

        big = jnp.asarray(jnp.finfo(dtype).max, dtype)
        d = jnp.where(type_ok, d, big)
        nearest = jnp.argmin(d)
        dmin = d[nearest]
        found = jnp.any(type_ok) & (~first_frame)

        matched = found & (dmin <= thres)
        make_new = det_valid & (~matched)
        new_id = tab.count
        lm_id = jnp.where(matched, nearest.astype(jnp.int32), new_id)

        def write_new(t: LandmarkTable) -> LandmarkTable:
            return LandmarkTable(
                world=t.world.at[new_id].set(w.astype(dtype)),
                cov=t.cov.at[new_id].set(Q_meas),
                class_id=t.class_id.at[new_id].set(cid),
                plane_type=t.plane_type.at[new_id].set(ptype),
                normal=t.normal.at[new_id].set(n4.astype(dtype)),
                count=t.count + 1,
            )

        tab = jax.tree.map(
            lambda a, b: jnp.where(make_new, a, b), write_new(tab), tab
        )
        return tab, (lm_id, make_new)

    inputs = (dets.valid, dets.class_id, dets.plane_type, w_all, n_all)
    table, (lm_ids, news) = jax.lax.scan(step, table, inputs)

    return table, AssocResult(
        valid=dets.valid,
        lm_id=lm_ids,
        is_new=news,
        local_pose=local_all.astype(dtype),
        world_pose=w_all.astype(dtype),
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
