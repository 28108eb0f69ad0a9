"""Frontend orchestrator: organized cloud + 2-D detections -> plane objects.

TPU re-design of ``point_cloud_segmentation::segmentallPointCloudData``
(``/root/reference/include/planar_segmentation/point_cloud_segmentation.h:105-181``)
and the per-pixel bbox crop of ``plane_segmentation::segmentPointCloudData``
(``plane_segmentation.cpp:24-82``):

  * normals are computed ONCE on the full organized image (integral images),
  * each bounding box is resampled onto a fixed SAMPxSAMP grid with a
    strided gather (static shapes; count gates corrected by the sampling
    ratio), replacing the per-pixel memcpy crop,
  * plane extraction runs vmapped over all detections at once,
  * outputs are packed into flat fixed-capacity DetectedObjects arrays
    (the device-side analog of ``std::vector<detected_object>``,
    ``detected_object.h:14-24``).

Reference behaviors reproduced: the class whitelist (id < 0 means
non-whitelisted, point_cloud_segmentation.h:126-130), the "spurious"
out-of-frame bbox rejection (plane_segmentation.cpp:34-38 — including that
only the far edges are checked), the ``norm_point_thres`` gate on the bbox
pixel COUNT (the reference gates on the crop's ``points.size()``, which is
width*height including invalid pixels — plane_segmentation.cpp:39,93), and
the world-pose construction that adds the robot translation AFTER rotating
(point_cloud_segmentation.h:55-94).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from semantic_slam_tpu.core import frames
from semantic_slam_tpu.frontend import normals as nrm_mod
from semantic_slam_tpu.frontend import planes as planes_mod


class DetectedObjects(NamedTuple):
    """Flat [D*P] plane-landmark observations for one keyframe."""

    valid: jax.Array  # [M] bool
    class_id: jax.Array  # [M] i32 (index into config.SEMANTIC_CLASSES)
    prob: jax.Array  # [M]
    plane_type: jax.Array  # [M] i32: 0 horizontal / 1 vertical
    num_points: jax.Array  # [M]
    pose_cam: jax.Array  # [M, 3] plane centroid, camera frame
    normal_cam: jax.Array  # [M, 4] oriented plane coeffs, camera frame
    world_pose: jax.Array  # [M, 3] centroid in world (reference recipe)

    @property
    def capacity(self) -> int:
        return self.valid.shape[0]


def make_empty_detections(capacity: int, dtype=jnp.float32) -> DetectedObjects:
    return DetectedObjects(
        valid=jnp.zeros((capacity,), bool),
        class_id=jnp.full((capacity,), -1, jnp.int32),
        prob=jnp.zeros((capacity,), dtype),
        plane_type=jnp.zeros((capacity,), jnp.int32),
        num_points=jnp.zeros((capacity,), dtype),
        pose_cam=jnp.zeros((capacity, 3), dtype),
        normal_cam=jnp.zeros((capacity, 4), dtype),
        world_pose=jnp.zeros((capacity, 3), dtype),
    )


def _bbox_sample(points, valid, normal, normal_valid, box, samp_h, samp_w):
    """Strided gather of a bbox region onto a fixed [samp_h*samp_w] grid."""
    H, W = points.shape[:2]
    tlx, tly, bw, bh = box[0], box[1], box[2], box[3]
    jj = (jnp.arange(samp_w) + 0.5) * bw / samp_w + tlx
    ii = (jnp.arange(samp_h) + 0.5) * bh / samp_h + tly
    u = jnp.clip(jj.astype(jnp.int32), 0, W - 1)
    v = jnp.clip(ii.astype(jnp.int32), 0, H - 1)
    pts = points[v[:, None], u[None, :]].reshape(-1, 3)
    nr = normal[v[:, None], u[None, :]].reshape(-1, 3)
    ok = (valid & normal_valid)[v[:, None], u[None, :]].reshape(-1)
    return pts, nr, ok


@partial(
    jax.jit,
    static_argnames=(
        "samp_h",
        "samp_w",
        "max_planes",
        "num_hypotheses",
        "smoothing_size",
        "strict_frames",
        "adaptive_normals",
    ),
)
def segment_all(
    points: jax.Array,  # [H, W, 3] organized cloud, cam frame
    cloud_valid: jax.Array,  # [H, W] bool
    boxes: jax.Array,  # [D, 4] (tl_x, tl_y, w, h)
    class_ids: jax.Array,  # [D] i32, -1 = not whitelisted / absent
    probs: jax.Array,  # [D]
    robot_xyzrpy: jax.Array,  # [6]
    cam_angle: jax.Array,  # scalar (radians)
    num_point_seg: jax.Array,
    norm_point_thres: jax.Array,
    planar_area: jax.Array,
    distance_thres: jax.Array,
    cos_angular_thres: jax.Array,
    samp_h: int = 128,
    samp_w: int = 128,
    max_planes: int = 4,
    num_hypotheses: int = 128,
    smoothing_size: int = 20,
    strict_frames: bool = True,
    adaptive_normals: bool = False,
) -> DetectedObjects:
    H, W = points.shape[:2]
    D = boxes.shape[0]
    dtype = points.dtype
    N = samp_h * samp_w

    if adaptive_normals:
        normal, normal_valid = nrm_mod.compute_normals_adaptive(
            points, cloud_valid, smoothing_size=smoothing_size
        )
    else:
        normal, normal_valid = nrm_mod.compute_normals(
            points, cloud_valid, smoothing_size=smoothing_size
        )
    h_cam4 = frames.horizontal_plane_normal_in_cam(robot_xyzrpy, cam_angle, strict=strict_frames)
    h_cam = h_cam4[:3]
    T_cw = frames.t_cam_world(robot_xyzrpy, cam_angle, strict=strict_frames)

    def per_detection(box, cid, prob):
        pts, nr, ok = _bbox_sample(points, cloud_valid, normal, normal_valid, box, samp_h, samp_w)
        bw, bh = box[2], box[3]
        # spurious bbox rejection — exactly the reference's test
        # (plane_segmentation.cpp:34-38)
        spurious = (bh < 0) | (bw < 0) | (box[0] + bw > W) | (box[1] + bh > H)
        whitelisted = cid >= 0
        # norm_point_thres gates on the CROP SIZE w*h (reference quirk)
        enough = bw * bh >= norm_point_thres
        det_ok = jnp.logical_not(spurious) & whitelisted & enough

        count_scale = jnp.maximum(bw * bh, 0.0) / N
        ps = planes_mod.extract_planes(
            pts,
            nr,
            ok & det_ok,
            h_cam,
            count_scale.astype(dtype),
            num_point_seg,
            planar_area,
            distance_thres,
            cos_angular_thres,
            max_planes=max_planes,
            num_hypotheses=num_hypotheses,
        )
        return ps, det_ok

    ps, det_ok = jax.vmap(per_detection)(boxes, class_ids, probs)  # [D, P, ...]

    M = D * max_planes
    centroid = ps.centroid.reshape(M, 3)
    coeffs = ps.coeffs.reshape(M, 4)
    valid = (ps.valid & det_ok[:, None]).reshape(M)
    # world pose: rotate homogeneous centroid by the cam->world chain, then
    # add the robot translation (point_cloud_segmentation.h:55-94)
    ch = jnp.concatenate([centroid, jnp.ones((M, 1), dtype)], axis=-1)
    world = jnp.einsum("ij,mj->mi", T_cw, ch)[:, :3] + robot_xyzrpy[:3][None, :]

    return DetectedObjects(
        valid=valid,
        class_id=jnp.repeat(class_ids, max_planes),
        prob=jnp.repeat(probs, max_planes),
        plane_type=ps.hv_flag.reshape(M),
        num_points=ps.num_points.reshape(M),
        pose_cam=centroid,
        normal_cam=coeffs,
        world_pose=world,
    )
