"""Reference-faithful frame-transform chains.

These reproduce the *exact* numeric conventions of the reference's
``semantic_tools`` (``/root/reference/include/tools.h``) and the per-odometry-
source fixups of ``ros_utils.hpp`` — including their numerically sloppy
constants (``1.5708`` for pi/2, ``3.14`` for pi) and one outright typo in the
robot->world rotation. Trajectory parity with the reference depends on these
quirks, so the defaults keep them; ``strict=False`` switches to the
mathematically clean forms (documented divergence).

Frames:
  cam:   RealSense optical frame (x right, y down, z forward)
  robot: body FLU (x fwd, y left, z up)
  world: gravity-aligned map frame
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semantic_slam_tpu.core import geometry as geo

# The reference uses these truncated constants everywhere; keep them bit-exact.
REF_HALF_PI = 1.5708  # tools.h:53 etc.
REF_PI = 3.14  # ros_utils.hpp:205 (NED->ENU)
REF_HALF_PI_SHORT = 1.57  # ros_utils.hpp:248 (RotPoseZ)


def _rot_x44(a, dtype=jnp.float32):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array(
        [[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]], dtype=dtype
    )


def _rot_z44(a, dtype=jnp.float32):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array(
        [[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], dtype=dtype
    )


def t_robot_world_reference(rpy: jax.Array, strict: bool = True) -> jax.Array:
    """Reference robot->world rotation (4x4, zero translation).

    Mirrors ``tools.h:76-92``. NOTE the reference has a typo in element
    (0,2): ``cy*sp*cr + sy*sp`` instead of the correct ZYX term
    ``cy*sp*cr + sy*sr``. ``strict=True`` (default) reproduces the typo for
    trajectory parity; ``strict=False`` uses the correct rotation.
    """
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    e02 = cy * sp * cr + (sy * sp if strict else sy * sr)
    z = jnp.zeros_like(r)
    o = jnp.ones_like(r)
    row0 = jnp.stack([cy * cp, cy * sp * sr - sy * cr, e02, z], axis=-1)
    row1 = jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr, z], axis=-1)
    row2 = jnp.stack([-sp, cp * sr, cp * cr, z], axis=-1)
    row3 = jnp.stack([z, z, z, o], axis=-1)
    return jnp.stack([row0, row1, row2, row3], axis=-2)


def t_cam_robot(cam_pitch: jax.Array | float, dtype=jnp.float32) -> jax.Array:
    """cam->robot chain: Rz(-90deg) @ Rx(-90deg) @ Rx(-cam_pitch).

    Mirrors ``semantic_tools::transformPoseFromCameraToRobot``
    (``tools.h:104-135``); rotation only, no translation.
    """
    cam_pitch = jnp.asarray(cam_pitch, dtype=dtype)
    return (
        _rot_z44(jnp.asarray(-REF_HALF_PI, dtype), dtype)
        @ _rot_x44(jnp.asarray(-REF_HALF_PI, dtype), dtype)
        @ _rot_x44(-cam_pitch, dtype)
    )


def t_cam_world(robot_xyzrpy: jax.Array, cam_pitch, strict: bool = True) -> jax.Array:
    """cam->world rotation chain: T_robot_world @ Rz(-90) @ Rx(-90) @ Rx(-pitch).

    Mirrors ``semantic_tools::transformNormalsToWorld`` (``tools.h:18-102``).
    The result has **zero translation** — the reference adds the robot
    translation separately, *after* rotating (see ``convert_pose_to_world``).
    """
    dtype = robot_xyzrpy.dtype
    Trw = t_robot_world_reference(robot_xyzrpy[..., 3:6], strict=strict)
    return Trw @ t_cam_robot(cam_pitch, dtype=dtype)


def convert_pose_to_world(
    robot_xyzrpy: jax.Array,
    cam_pitch,
    p_cam: jax.Array,
    strict: bool = True,
    rtabmap_y_offset: bool = False,
) -> jax.Array:
    """Detection centroid cam-frame -> world frame.

    Mirrors ``data_association::convertPoseToWorld``
    (``data_association.h:320-343``): rotate homogeneous [x,y,z,1] by the
    cam->world chain, then add the robot translation component-wise. The
    rtab-map profile subtracts 4 cm from y (``data_association.h:335-338``).
    """
    T = t_cam_world(robot_xyzrpy, cam_pitch, strict=strict)
    ph = jnp.concatenate([p_cam[..., :3], jnp.ones_like(p_cam[..., :1])], axis=-1)
    out = jnp.einsum("...ij,...j->...i", T, ph)[..., :3]
    t = robot_xyzrpy[..., :3]
    if rtabmap_y_offset:
        t = t - jnp.array([0.0, 0.04, 0.0], dtype=t.dtype)
    return out + t


def convert_normal_to_world(
    robot_xyzrpy: jax.Array, cam_pitch, n_cam4: jax.Array, strict: bool = True
) -> jax.Array:
    """Normal (4-vec, [nx,ny,nz,d]) cam->world; rotation only, keeps 4th comp.

    Mirrors ``data_association::convertNormalsToWorld``
    (``data_association.h:345-359``) — the full 4-vector is multiplied by the
    4x4 chain (which has no translation), so [nx,ny,nz] rotate and d passes
    through unchanged.
    """
    T = t_cam_world(robot_xyzrpy, cam_pitch, strict=strict)
    return jnp.einsum("...ij,...j->...i", T, n_cam4)


def convert_cam_to_robot(cam_pitch, p_cam: jax.Array) -> jax.Array:
    """Detection centroid cam -> robot frame (rotation-only chain).

    Mirrors ``data_association::convertCamToRobot`` (``data_association.h:361-373``).
    """
    p_cam = jnp.asarray(p_cam)
    T = t_cam_robot(cam_pitch, dtype=p_cam.dtype)
    ph = jnp.concatenate([p_cam[..., :3], jnp.ones_like(p_cam[..., :1])], axis=-1)
    return jnp.einsum("ij,...j->...i", T, ph)[..., :3]


def horizontal_plane_normal_in_cam(
    robot_xyzrpy: jax.Array, cam_pitch, strict: bool = True
) -> jax.Array:
    """World +z rotated into the camera frame via the transpose of the chain.

    Mirrors ``plane_segmentation::multiPlaneSegmentation``'s
    ``transformation_mat.transpose() * [0,0,1,0]``
    (``plane_segmentation.cpp:119-131``).
    """
    T = t_cam_world(robot_xyzrpy, cam_pitch, strict=strict)
    n_world = jnp.array([0.0, 0.0, 1.0, 0.0], dtype=T.dtype)
    return jnp.einsum("...ji,...j->...i", T, n_world)  # T^T @ n


# ---------------------------------------------------------------------------
# Per-odometry-source ingestion fixups (ros_utils.hpp)
# ---------------------------------------------------------------------------


def pose_ned_to_enu(pose7: jax.Array) -> jax.Array:
    """Snap-VIO NED->ENU fixup, mirroring ``ros_utils.hpp:192-231``.

    The reference converts to Euler, multiplies the *angle vector* and the
    translation by Rx(-3.14) (note: 3.14, not pi), and rebuilds the
    quaternion. This is not a similarity transform on SO(3) — it is an
    elementwise Euler-angle trick — reproduced verbatim.
    """
    dtype = pose7.dtype
    a = jnp.asarray(-REF_PI, dtype)
    c, s = jnp.cos(a), jnp.sin(a)
    # NOTE reference writes the matrix with BOTH off-diagonal terms = sin(-3.14)
    # (ros_utils.hpp:205: ``1,0,0, 0,cos,sin, 0,sin,cos``) — not a rotation
    # matrix transpose pattern. Reproduced exactly.
    M = jnp.array([[1, 0, 0], [0, c, s], [0, s, c]], dtype=dtype)
    rpy = geo.quat_to_rpy(pose7[..., 3:])
    rpy_enu = jnp.einsum("ij,...j->...i", M, rpy)
    t_enu = jnp.einsum("ij,...j->...i", M, pose7[..., :3])
    return geo.pose_make(t_enu, geo.rpy_to_quat(rpy_enu))


def pose_cam_to_robot_odom(pose7: jax.Array) -> jax.Array:
    """ORB-SLAM camera-frame odometry -> robot frame, ``ros_utils.hpp:143-190``.

    Rotates the Euler-angle vector and the translation by Rz(-90)Rx(-90)
    (the reference's sketchy-but-load-bearing Euler-vector rotation).
    """
    dtype = pose7.dtype
    a = jnp.asarray(-REF_HALF_PI, dtype)
    c, s = jnp.cos(a), jnp.sin(a)
    rot_x = jnp.array([[1, 0, 0], [0, c, -s], [0, s, c]], dtype=dtype)
    rot_z = jnp.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=dtype)
    M = rot_z @ rot_x
    rpy = geo.quat_to_rpy(pose7[..., 3:])
    rpy_r = jnp.einsum("ij,...j->...i", M, rpy)
    t_r = jnp.einsum("ij,...j->...i", M, pose7[..., :3])
    return geo.pose_make(t_r, geo.rpy_to_quat(rpy_r))


def rot_pose_z(pose7: jax.Array, first_yaw: jax.Array | float) -> jax.Array:
    """Jackal odometry yaw-rebase + 90deg yaw rotation, ``ros_utils.hpp:233-271``."""
    dtype = pose7.dtype
    a = jnp.asarray(REF_HALF_PI_SHORT, dtype)
    c, s = jnp.cos(a), jnp.sin(a)
    M = jnp.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=dtype)
    rpy = geo.quat_to_rpy(pose7[..., 3:])
    rpy = rpy.at[..., 2].add(-jnp.asarray(first_yaw, dtype))
    rpy_r = jnp.einsum("ij,...j->...i", M, rpy)
    t_r = jnp.einsum("ij,...j->...i", M, pose7[..., :3])
    return geo.pose_make(t_r, geo.rpy_to_quat(rpy_r))


def rebase_to_origin(pose7: jax.Array, origin_t: jax.Array) -> jax.Array:
    """Subtract the first-sample translation, ``ros_utils.hpp:273-286``."""
    return pose7.at[..., :3].add(-origin_t)
