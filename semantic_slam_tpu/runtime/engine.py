"""The SLAM engine: keyframe queue, tick loop, graph growth, state sync.

TPU re-design of ``class semantic_graph_slam``
(``/root/reference/src/ps_graph_slam/semantic_graph_slam.cpp``). The host
drives a thin sequential loop (VIO gating, latest-wins sensor pairing,
queue bookkeeping — inherently serial, kept off the device), while all
wide work runs in a handful of jitted device programs:

  * ``segment_all``        — frontend planes for one keyframe's cloud
  * ``associate``          — landmark matching against the device table
  * ``_ingest_keyframe``   — SE3 node + odometry edge append
  * ``_ingest_landmarks``  — masked scan adding landmark nodes/edges
  * ``lm_optimize``        — full-batch Schur LM (the dominant cost)
  * ``landmark_marginals`` — covariance recovery for Mahalanobis gating

Reference behaviors reproduced (file:line cited inline): keyframe nodes are
initialised from raw VIO odometry, not the corrected pose (:121); odometry
edges measure ``prev_odom^-1 * odom`` with the constant information matrix
(:134-141, information_matrix_calculator.cpp:28-35 — identity DIVIDED by the
stddev, not the variance); dead-reckoning between keyframes (:242-249);
detection-triggered keyframes OR-ed with the gate (:239-250); latest-wins
cloud/detection pairing (:264-272); ``robot_pose``/``map2odom`` refresh from
the last keyframe's optimized estimate (:92-95); the synthetic first
pose+landmark seed (:289-332); <=10 keyframes ingested per tick (:18,112).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.assoc import association as assoc_mod
from semantic_slam_tpu.config import CLASS_TO_ID, PLANE_VERTICAL, SlamConfig
from semantic_slam_tpu.core import geometry as geo
from semantic_slam_tpu.frontend import segmentation as seg_mod
from semantic_slam_tpu.graph import state as gs
from semantic_slam_tpu.runtime.keyframe_gate import KeyframeGate
from semantic_slam_tpu.solver import lm as lm_mod


@dataclasses.dataclass
class KeyframeMeta:
    stamp: float
    odom: np.ndarray  # pose7
    robot_pose: np.ndarray  # pose7 snapshot at creation
    accum_distance: float
    cloud: tuple[jax.Array, jax.Array] | None  # (points [H,W,3], valid)
    boxes: np.ndarray | None  # [D,4]
    class_ids: np.ndarray | None
    probs: np.ndarray | None
    node_idx: int | None = None


def _np_pose_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.asarray(geo.pose_mul(jnp.asarray(a), jnp.asarray(b)))


def _np_pose_inv(a: np.ndarray) -> np.ndarray:
    return np.asarray(geo.pose_inv(jnp.asarray(a)))


@jax.jit
def _ingest_keyframe(graph: gs.GraphState, odom7, prev_odom7, has_prev, info6):
    graph, idx = gs.add_se3_node(graph, odom7)
    meas = geo.pose_mul(geo.pose_inv(prev_odom7), odom7)
    with_edge = gs.add_se3_edge(graph, idx - 1, idx, meas, info6)
    graph = jax.tree.map(lambda a, b: jnp.where(has_prev, a, b), with_edge, graph)
    return graph, idx


@jax.jit
def _ingest_landmarks(graph: gs.GraphState, valid, lm_id, is_new, local, world, kf_idx, info3):
    """Masked scan: add new landmark nodes + observation edges.

    Invariant: association assigns new landmark ids sequentially from the
    table count, which equals graph.num_landmarks — so node indices match
    table ids by construction (the analog of assignLandmarkNode,
    data_association.h:391-393).
    """

    def step(g, inp):
        v, lid, new, loc, wp = inp
        g_new, _ = gs.add_point_node(g, wp)
        g = jax.tree.map(lambda a, b: jnp.where(v & new, a, b), g_new, g)
        g_edge = gs.add_se3_point_edge(g, kf_idx, lid, loc, info3)
        g = jax.tree.map(lambda a, b: jnp.where(v, a, b), g_edge, g)
        return g, None

    graph, _ = jax.lax.scan(step, graph, (valid, lm_id, is_new, local, world))
    return graph


class SlamEngine:
    """Single-session engine; feed with ``vio_callback``/``set_*`` then ``run()``."""

    def __init__(self, config: SlamConfig):
        self.cfg = config
        self.dtype = jnp.float64 if config.solver.dtype == "float64" else jnp.float32
        cap = config.capacity
        self.graph = gs.make_graph(
            cap.max_keyframes, cap.max_landmarks, cap.max_odom_edges,
            cap.max_landmark_edges, dtype=self.dtype,
        )
        self.table = assoc_mod.make_table(cap.max_landmarks, dtype=self.dtype)
        self.gate = KeyframeGate(
            config.keyframe.delta_trans, config.keyframe.delta_angle, config.keyframe.delta_time
        )

        ident = np.array([0, 0, 0, 1, 0, 0, 0], np.float64)
        self.robot_pose = ident.copy()
        self.vio_pose = ident.copy()
        self.prev_odom = ident.copy()
        self.map2odom = ident.copy()
        self.first_key_added = False

        self._cloud: tuple[jax.Array, jax.Array] | None = None
        self._cloud_available = False
        self._dets: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None
        self._det_available = False

        self.keyframe_queue: list[KeyframeMeta] = []
        self.keyframes: list[KeyframeMeta] = []
        self.marginals = jnp.tile(
            jnp.eye(3, dtype=self.dtype), (cap.max_landmarks, 1, 1)
        )

        # trajectories for ATE (robot @ VIO rate + per-keyframe VIO pose),
        # mirroring robot_pose_vec_ / vio_key_pose_vec_ bookkeeping
        self.robot_traj: list[tuple[float, np.ndarray]] = []
        self.vio_traj: list[tuple[float, np.ndarray]] = []
        self.stats_history: list[dict[str, Any]] = []

        # constant information matrices
        inf = config.information
        self._info6 = jnp.diag(
            jnp.asarray(
                [1.0 / inf.const_stddev_x] * 3 + [1.0 / inf.const_stddev_q] * 3,
                self.dtype,
            )
        )
        self._lm_info3 = jnp.eye(3, dtype=self.dtype) / config.association.land_noise_low

        if config.add_first_lan:
            self.add_first_pose_and_landmark()

    # ------------------------------------------------------------------
    # sensor ingestion (latest-wins, semantic_graph_slam.cpp:342-364)
    # ------------------------------------------------------------------

    def set_point_cloud(self, points: jax.Array, valid: jax.Array) -> None:
        self._cloud = (points, valid)
        self._cloud_available = True

    def set_detections(self, boxes: np.ndarray, class_ids: np.ndarray, probs: np.ndarray) -> None:
        self._dets = (np.asarray(boxes), np.asarray(class_ids), np.asarray(probs))
        self._det_available = True

    def vio_callback(self, stamp: float, odom7: np.ndarray, odom_cov: np.ndarray | None = None) -> None:
        """Gated keyframe creation (semantic_graph_slam.cpp:234-287)."""
        odom7 = np.asarray(odom7, np.float64)
        gate_hit = self.gate.update(odom7, stamp)
        det_trigger = self.cfg.update_key_using_det and self._det_available
        if not gate_hit and not det_trigger:
            if self.first_key_added:
                inc = _np_pose_mul(_np_pose_inv(self.prev_odom), odom7)
                self.robot_pose = _np_pose_mul(self.robot_pose, inc)
            self.vio_pose = odom7
            self.prev_odom = odom7
            self._record_traj(stamp)
            return

        cloud = self._cloud  # latest-wins; kept even when stale (:264-265)
        self._cloud_available = False
        if self._det_available and self._dets is not None:
            boxes, cids, probs = self._dets
            self._det_available = False
        else:
            boxes = cids = probs = None

        self.keyframe_queue.append(
            KeyframeMeta(
                stamp=stamp,
                odom=odom7.copy(),
                robot_pose=self.robot_pose.copy(),
                accum_distance=self.gate.accum_distance,
                cloud=cloud,
                boxes=boxes,
                class_ids=cids,
                probs=probs,
            )
        )
        self.vio_pose = odom7
        self.prev_odom = odom7
        self._record_traj(stamp)

    def _record_traj(self, stamp: float) -> None:
        self.robot_traj.append((stamp, self.robot_pose.copy()))
        self.vio_traj.append((stamp, self.vio_pose.copy()))

    # ------------------------------------------------------------------
    # the tick (semantic_graph_slam.cpp:58-102)
    # ------------------------------------------------------------------

    def run(self) -> bool:
        if not self.keyframe_queue:
            return False
        n = min(len(self.keyframe_queue), self.cfg.capacity.max_keyframes_per_update)
        batch, self.keyframe_queue = self.keyframe_queue[:n], self.keyframe_queue[n:]

        self._ensure_capacity(batch)

        for kf in batch:
            has_prev = len(self.keyframes) > 0
            prev_odom = self.keyframes[-1].odom if has_prev else kf.odom
            self.graph, idx = _ingest_keyframe(
                self.graph,
                jnp.asarray(kf.odom, self.dtype),
                jnp.asarray(prev_odom, self.dtype),
                jnp.asarray(has_prev),
                self._info6,
            )
            kf.node_idx = int(idx)
            self.keyframes.append(kf)

            if kf.boxes is not None and kf.cloud is not None and len(kf.boxes) > 0:
                self._process_detections(kf)

        t0 = time.perf_counter()
        self.graph, stats = lm_mod.lm_optimize(
            self.graph,
            max_iterations=self.cfg.solver.max_iterations,
            min_edges=self.cfg.solver.min_edges_to_optimize,
            rel_tol=self.cfg.solver.rel_decrease_tol,
        )
        jax.block_until_ready(self.graph.poses)
        solve_s = time.perf_counter() - t0

        iters = int(stats.iterations)
        if iters > 0:
            if int(self.table.count) > 0:
                self.marginals = lm_mod.landmark_marginals(self.graph)
                self.table = assoc_mod.sync_from_graph(
                    self.table, self.graph.landmarks, self.marginals
                )
            last = self.keyframes[-1]
            est = np.asarray(self.graph.poses[last.node_idx], np.float64)
            self.robot_pose = est
            self.map2odom = _np_pose_mul(est, _np_pose_inv(last.odom))

        from semantic_slam_tpu.utils.profiling import log_optimize

        log_optimize(
            self.cfg.verbose, stats, solve_s,
            int(self.graph.num_poses) + int(self.graph.num_landmarks),
            int(self.graph.num_edges()),
        )
        self.stats_history.append(
            {
                "iterations": iters,
                "chi2_initial": float(stats.chi2_initial),
                "chi2_final": float(stats.chi2_final),
                "solve_seconds": solve_s,
                "num_poses": int(self.graph.num_poses),
                "num_landmarks": int(self.graph.num_landmarks),
                "num_edges": int(self.graph.num_edges()),
            }
        )
        self.first_key_added = True
        return True

    # ------------------------------------------------------------------

    def _process_detections(self, kf: KeyframeMeta) -> None:
        cfg = self.cfg
        seg = cfg.segmentation
        points, valid = kf.cloud
        D = cfg.capacity.max_detections_per_frame
        boxes = np.zeros((D, 4), np.float64)
        cids = np.full((D,), -1, np.int32)
        probs = np.zeros((D,), np.float64)
        nd = min(len(kf.boxes), D)
        boxes[:nd] = kf.boxes[:nd]
        cids[:nd] = kf.class_ids[:nd]
        probs[:nd] = kf.probs[:nd]

        robot_xyzrpy = np.asarray(
            geo.pose_to_xyzrpy(jnp.asarray(kf.robot_pose, self.dtype))
        )
        dets = seg_mod.segment_all(
            points.astype(self.dtype),
            valid,
            jnp.asarray(boxes, self.dtype),
            jnp.asarray(cids),
            jnp.asarray(probs, self.dtype),
            jnp.asarray(robot_xyzrpy, self.dtype),
            jnp.asarray(cfg.camera_angle_rad, self.dtype),
            num_point_seg=jnp.asarray(seg.num_point_seg, self.dtype),
            norm_point_thres=jnp.asarray(seg.norm_point_thres, self.dtype),
            planar_area=jnp.asarray(seg.planar_area, self.dtype),
            distance_thres=jnp.asarray(seg.distance_thres, self.dtype),
            cos_angular_thres=jnp.asarray(
                np.cos(np.deg2rad(seg.angular_thres_deg)), self.dtype
            ),
            samp_h=seg.crop_height,
            samp_w=seg.crop_width,
            max_planes=seg.max_planes_per_detection,
            num_hypotheses=seg.num_hypotheses,
            smoothing_size=seg.normal_smoothing_size,
            strict_frames=cfg.strict_reference_frames,
        )
        self.last_detected_objects = dets  # observability (seg_obj_vec_)

        a = cfg.association
        self.table, res = assoc_mod.associate(
            self.table,
            dets,
            jnp.asarray(robot_xyzrpy, self.dtype),
            jnp.asarray(cfg.camera_angle_rad, self.dtype),
            jnp.asarray(a.use_maha_dist),
            jnp.asarray(a.maha_dist_thres, self.dtype),
            jnp.asarray(a.eq_dist_thres, self.dtype),
            jnp.asarray(a.land_noise_low, self.dtype),
            strict_frames=cfg.strict_reference_frames,
            rtabmap_y_offset=a.use_rtab_map_odom,
        )
        self.graph = _ingest_landmarks(
            self.graph,
            res.valid,
            res.lm_id,
            res.is_new,
            res.local_pose,
            res.world_pose,
            jnp.asarray(kf.node_idx, jnp.int32),
            self._lm_info3,
        )

    def add_first_pose_and_landmark(self) -> None:
        """Synthetic seed (semantic_graph_slam.cpp:289-332): identity keyframe
        + fixed 'bucket'/vertical landmark with 0.1 covariance."""
        cfg = self.cfg
        pose = np.array([cfg.first_lan_x, cfg.first_lan_y, cfg.first_lan_z])
        lm = assoc_mod.LandmarkTable(
            world=self.table.world.at[0].set(jnp.asarray(pose, self.dtype)),
            cov=self.table.cov.at[0].set(jnp.eye(3, dtype=self.dtype) * 0.1),
            class_id=self.table.class_id.at[0].set(CLASS_TO_ID["bucket"]),
            plane_type=self.table.plane_type.at[0].set(PLANE_VERTICAL),
            normal=self.table.normal.at[0].set(
                jnp.asarray([-0.4, 0.86, 0.0, 0.0], self.dtype)
            ),
            count=jnp.asarray(1, jnp.int32),
        )
        self.table = lm
        ident = np.array([0, 0, 0, 1, 0, 0, 0], np.float64)
        self.graph, idx = _ingest_keyframe(
            self.graph,
            jnp.asarray(ident, self.dtype),
            jnp.asarray(ident, self.dtype),
            jnp.asarray(False),
            self._info6,
        )
        self.keyframes.append(
            KeyframeMeta(
                stamp=0.0, odom=ident, robot_pose=ident, accum_distance=0.0,
                cloud=None, boxes=None, class_ids=None, probs=None, node_idx=int(idx),
            )
        )
        info3 = jnp.eye(3, dtype=self.dtype) / 0.1
        self.graph = _ingest_landmarks(
            self.graph,
            jnp.asarray([True]),
            jnp.asarray([0], jnp.int32),
            jnp.asarray([True]),
            jnp.asarray(pose[None, :], self.dtype),
            jnp.asarray(pose[None, :], self.dtype),
            jnp.asarray(idx, jnp.int32),
            info3,
        )

    def _ensure_capacity(self, batch: list[KeyframeMeta]) -> None:
        """Host-side growth check; doubles capacities when the incoming batch
        could overflow (a recompile point, SURVEY.md §7 'hard parts')."""
        need_poses = int(self.graph.num_poses) + len(batch)
        mpd = self.cfg.capacity.max_detections_per_frame * self.cfg.segmentation.max_planes_per_detection
        need_lms = int(self.graph.num_landmarks) + mpd * len(batch)
        need_oe = int(self.graph.num_odom) + len(batch)
        need_le = int(self.graph.num_lme) + mpd * len(batch)
        while (
            need_poses > self.graph.max_poses
            or need_oe > self.graph.odom_i.shape[0]
            or need_le > self.graph.lme_k.shape[0]
            or need_lms > self.graph.max_landmarks
        ):
            self.graph = gs.grow_graph(self.graph)
            self.table = _grow_table(self.table)
            self.marginals = jnp.tile(
                jnp.eye(3, dtype=self.dtype), (self.graph.max_landmarks, 1, 1)
            )

    # ------------------------------------------------------------------
    # getters mirroring the reference API (semantic_graph_slam.h:27-113)
    # ------------------------------------------------------------------

    def get_robot_pose(self) -> np.ndarray:
        return self.robot_pose.copy()

    def get_map2odom(self) -> np.ndarray:
        return self.map2odom.copy()

    def get_vio_pose(self) -> np.ndarray:
        return self.vio_pose.copy()

    def get_keyframe_poses(self) -> np.ndarray:
        """Optimized keyframe trajectory [N,7]."""
        n = int(self.graph.num_poses)
        return np.asarray(self.graph.poses[:n], np.float64)

    def get_mapped_landmarks(self):
        n = int(self.table.count)
        return {
            "pose": np.asarray(self.table.world[:n], np.float64),
            "covariance": np.asarray(self.table.cov[:n], np.float64),
            "class_id": np.asarray(self.table.class_id[:n]),
            "plane_type": np.asarray(self.table.plane_type[:n]),
            "normal": np.asarray(self.table.normal[:n], np.float64),
        }


def _grow_table(t: assoc_mod.LandmarkTable, factor: int = 2) -> assoc_mod.LandmarkTable:
    cap = t.world.shape[0] * factor
    big = assoc_mod.make_table(cap, t.world.dtype)
    return assoc_mod.LandmarkTable(
        world=big.world.at[: t.world.shape[0]].set(t.world),
        cov=big.cov.at[: t.cov.shape[0]].set(t.cov),
        class_id=big.class_id.at[: t.class_id.shape[0]].set(t.class_id),
        plane_type=big.plane_type.at[: t.plane_type.shape[0]].set(t.plane_type),
        normal=big.normal.at[: t.normal.shape[0]].set(t.normal),
        count=t.count,
    )
