"""On-device depth-image backprojection (u16 millimeters -> organized cloud).

The reference consumes organized XYZ clouds produced by the EXTERNAL
``depth_image_proc`` nodelet wired in its launch files
(``/root/reference/launch/ps_slam_with_snap_pose_bucket_det_lab_data_with_octomap.launch``);
the SLAM node itself never sees the raw depth image. The TPU build pulls that
stage on-device: the host ships the raw u16 depth frame (2 bytes/px — 6x
smaller than the f32 XYZ it replaces) and the pinhole backprojection runs
fused into the keyframe program, so the organized cloud never crosses the
host<->device link at all.

Convention matches the ROS camera model: z = depth * scale along the optical
axis, x right, y down, pixel (u, v) with intrinsics (fx, fy, cx, cy);
depth == 0 marks invalid (the standard RealSense/OpenNI encoding, which
``depth_image_proc`` maps to NaN points — here a validity mask instead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def backproject_depth(
    depth: jax.Array,  # [H, W] u16 (or float) raw depth
    intr4: jax.Array,  # [4] (fx, fy, cx, cy)
    depth_scale: jax.Array,  # scalar: meters per depth unit (u16 mm -> 1e-3)
) -> tuple[jax.Array, jax.Array]:
    """Pinhole backprojection: returns (points [H,W,3], valid [H,W]).

    Invalid pixels (depth == 0) become zero points with valid=False — the
    downstream bbox crop / normal / plane stages all consume the mask.
    """
    H, W = depth.shape
    dtype = intr4.dtype
    fx, fy, cx, cy = intr4[0], intr4[1], intr4[2], intr4[3]
    z = depth.astype(dtype) * depth_scale
    u = jnp.arange(W, dtype=dtype)[None, :]
    v = jnp.arange(H, dtype=dtype)[:, None]
    x = (u - cx) * z / fx
    y = (v - cy) * z / fy
    valid = depth > 0
    pts = jnp.stack([x, y, z], axis=-1)
    return jnp.where(valid[..., None], pts, 0.0), valid


def project_cloud_to_depth(points, valid, intr4, depth_scale) -> jax.Array:
    """Inverse helper (tests / synthetic logs): organized cam-frame cloud ->
    u16 depth image. Pixels with valid=False or non-positive z encode as 0."""
    z = points[..., 2]
    ok = valid & (z > 0)
    d = jnp.round(z / depth_scale)
    d = jnp.where(ok, jnp.clip(d, 1, 65535), 0)
    return d.astype(jnp.uint16)
