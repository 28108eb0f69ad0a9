"""SO(3)/SE(3) primitives for the TPU-native semantic SLAM stack.

Everything here is pure `jax.numpy`, shape-static, vmap/jit friendly, and
dtype-polymorphic (float32 on TPU, float64 in CPU tests).

Conventions
-----------
* Quaternions are ``[w, x, y, z]`` (Hamilton, matching Eigen's internal
  storage order when printed as ``.w() .x() .y() .z()``).
* A pose ("pose7") is ``[tx, ty, tz, qw, qx, qy, qz]``.
* Euler angles are roll-pitch-yaw applied as ``R = Rz(yaw) @ Ry(pitch) @
  Rx(roll)`` (the ZYX / ``tf::Matrix3x3::getEulerYPR`` convention used
  throughout the reference, e.g. ``/root/reference/include/tools.h:299-335``).
* Tangent ("twist") vectors are ``[v(3), w(3)]`` with *right* perturbation:
  ``T <- T * exp(xi)`` — the same local parameterisation g2o's ``VertexSE3``
  uses, so solver updates match the reference backend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternions
# ---------------------------------------------------------------------------


def quat_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b, batched over leading dims."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by quaternion(s) q (R(q) @ v)."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """Branch-free (lax.select based) rotation-matrix -> quaternion.

    Uses the 4-candidate construction; numerically fine for proper rotations.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternions (up to scale); pick the best-conditioned one.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4(cand), 4(wxyz)]
    scores = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32).repeat(4, -1), axis=-2)[
        ..., 0, :
    ]
    q = quat_normalize(q)
    # canonicalize sign (w >= 0)
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


# ---------------------------------------------------------------------------
# so(3)/se(3) exp & log
# ---------------------------------------------------------------------------


def hat(w: jax.Array) -> jax.Array:
    """Skew-symmetric matrix [w]_x, batched."""
    wx, wy, wz = jnp.moveaxis(w, -1, 0)
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def so3_exp_quat(w: jax.Array) -> jax.Array:
    """exp: so(3) -> unit quaternion. Taylor-safe near 0."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta2 + 1e-32)
    half = 0.5 * theta
    small = theta2 < 1e-8
    sinc_half = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    cw = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([cw, sinc_half * w], axis=-1)


def quat_log(q: jax.Array) -> jax.Array:
    """log: unit quaternion -> so(3) (rotation vector)."""
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)  # shortest arc
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    vnorm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(vnorm, w)
    small = vnorm < 1e-8
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 1e-12), theta / jnp.maximum(vnorm, 1e-32))
    return scale * v


def so3_left_jacobian(w: jax.Array) -> jax.Array:
    """Left Jacobian J_l of SO(3); V matrix of the se(3) exp."""
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(theta2 + 1e-32)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    # cutoff sized for float32: the closed forms divide O(eps) cancellation
    # by theta^2/theta^3, garbage below theta ~ 5e-2 in f32; the 3-term
    # Taylor is accurate to ~1e-13 relative at theta = 0.063
    small = theta2 < 4e-3
    t4 = theta2 * theta2
    A = jnp.where(
        small,
        0.5 - theta2 / 24.0 + t4 / 720.0,
        (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-32),
    )
    B = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0 + t4 / 5040.0,
        (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, 1e-32),
    )
    return eye + A * W + B * W2


def so3_left_jacobian_inv(w: jax.Array) -> jax.Array:
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(theta2 + 1e-32)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    small = theta2 < 4e-3
    half_theta = 0.5 * theta
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0 + theta2 * theta2 / 30240.0,
        (1.0 - half_theta * jnp.cos(half_theta) / jnp.maximum(jnp.sin(half_theta), 1e-32))
        / jnp.maximum(theta2, 1e-32),
    )
    return eye - 0.5 * W + cot_term * W2


def se3_Q_matrix(xi: jax.Array) -> jax.Array:
    """Barfoot's Q(v, w) block of the SE(3) left Jacobian (State Estimation
    for Robotics eq. 7.86), batched. xi = [v, w], translation first."""
    v, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(theta2 + 1e-32)
    V = hat(v)
    W = hat(w)
    WV = W @ V
    VW = V @ W
    WW = W @ W
    # float32-safe cutoff: the closed forms divide O(eps) cancellation by
    # theta^4/theta^5 — catastrophic below theta ~ 5e-2 in f32 (and the
    # default solver dtype IS f32). 3-term Taylor covers the gap.
    small = theta2 < 4e-3
    t4 = theta2 * theta2
    s, c = jnp.sin(theta), jnp.cos(theta)
    c1 = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0 + t4 / 5040.0,
        (theta - s) / jnp.maximum(theta2 * theta, 1e-32),
    )
    c2 = jnp.where(
        small,
        1.0 / 24.0 - theta2 / 720.0 + t4 / 40320.0,
        (theta2 + 2.0 * c - 2.0) / jnp.maximum(2.0 * theta2 * theta2, 1e-32),
    )
    c3 = jnp.where(
        small,
        1.0 / 120.0 - theta2 / 2520.0 + t4 / 120960.0,
        (2.0 * theta - 3.0 * s + theta * c) / jnp.maximum(2.0 * theta2 * theta2 * theta, 1e-32),
    )
    return (
        0.5 * V
        + c1 * (WV + VW + W @ VW)
        + c2 * (WW @ V + V @ WW - 3.0 * (W @ VW))
        + c3 * ((W @ VW) @ W + WW @ VW)
    )


def se3_right_jacobian_inv(xi: jax.Array) -> jax.Array:
    """Inverse right Jacobian of SE(3) at twist xi = [v, w] (6x6, batched).

    Jr(xi) = Jl(-xi), so Jr^-1 = [[Jl^-1(-w), -Jl^-1(-w) Q(-xi) Jl^-1(-w)],
                                  [0,          Jl^-1(-w)]].
    This is the first-order map log(exp(r) exp(dxi)) ~= r + Jr^-1(r) dxi the
    SE3-SE3 edge Jacobians need.
    """
    Jinv = so3_left_jacobian_inv(-xi[..., 3:])
    Q = se3_Q_matrix(-xi)
    top_right = -(Jinv @ Q @ Jinv)
    zero = jnp.zeros_like(Jinv)
    top = jnp.concatenate([Jinv, top_right], axis=-1)
    bottom = jnp.concatenate([zero, Jinv], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def pose_adjoint(p: jax.Array) -> jax.Array:
    """Adjoint Ad(T) of a pose7 acting on [v, w] twists:
    Ad = [[R, hat(t) R], [0, R]]."""
    R = quat_to_rotmat(p[..., 3:])
    tR = hat(p[..., :3]) @ R
    zero = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bottom = jnp.concatenate([zero, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


# ---------------------------------------------------------------------------
# Pose7 = [t(3), q(4)]
# ---------------------------------------------------------------------------


def pose_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0], dtype=dtype)


def pose_make(t: jax.Array, q: jax.Array) -> jax.Array:
    return jnp.concatenate([t, q], axis=-1)


def pose_t(p: jax.Array) -> jax.Array:
    return p[..., :3]


def pose_q(p: jax.Array) -> jax.Array:
    return p[..., 3:]


def pose_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Compose: (a*b)(x) = a(b(x))."""
    ta, qa = a[..., :3], a[..., 3:]
    tb, qb = b[..., :3], b[..., 3:]
    return pose_make(ta + quat_rotate(qa, tb), quat_normalize(quat_mul(qa, qb)))


def pose_inv(p: jax.Array) -> jax.Array:
    t, q = p[..., :3], p[..., 3:]
    qi = quat_conj(q)
    return pose_make(-quat_rotate(qi, t), qi)


def pose_apply(p: jax.Array, x: jax.Array) -> jax.Array:
    return quat_rotate(p[..., 3:], x) + p[..., :3]


def pose_to_mat44(p: jax.Array) -> jax.Array:
    R = quat_to_rotmat(p[..., 3:])
    t = p[..., :3]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=p.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def mat44_to_pose(T: jax.Array) -> jax.Array:
    return pose_make(T[..., :3, 3], rotmat_to_quat(T[..., :3, :3]))


def se3_exp(xi: jax.Array) -> jax.Array:
    """exp: se(3) -> pose7. xi = [v, w]."""
    v, w = xi[..., :3], xi[..., 3:]
    q = so3_exp_quat(w)
    V = so3_left_jacobian(w)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return pose_make(t, q)


def se3_log(p: jax.Array) -> jax.Array:
    """log: pose7 -> se(3) twist [v, w]."""
    w = quat_log(p[..., 3:])
    Vinv = so3_left_jacobian_inv(w)
    v = jnp.einsum("...ij,...j->...i", Vinv, p[..., :3])
    return jnp.concatenate([v, w], axis=-1)


def pose_retract(p: jax.Array, xi: jax.Array) -> jax.Array:
    """Right-multiplicative retraction: p * exp(xi)."""
    return pose_mul(p, se3_exp(xi))


# ---------------------------------------------------------------------------
# Euler (ZYX, tf::getEulerYPR convention)
# ---------------------------------------------------------------------------


def rpy_to_rotmat(rpy: jax.Array) -> jax.Array:
    """R = Rz(yaw) Ry(pitch) Rx(roll); rpy = [roll, pitch, yaw]."""
    r, p, y = jnp.moveaxis(rpy, -1, 0)
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    row0 = jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1)
    row1 = jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1)
    row2 = jnp.stack([-sp, cp * sr, cp * cr], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotmat_to_rpy(R: jax.Array) -> jax.Array:
    """Inverse of rpy_to_rotmat (matches tf::Matrix3x3::getEulerYPR)."""
    sp = -R[..., 2, 0]
    pitch = jnp.arcsin(jnp.clip(sp, -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat_to_rpy(q: jax.Array) -> jax.Array:
    return rotmat_to_rpy(quat_to_rotmat(q))


def rpy_to_quat(rpy: jax.Array) -> jax.Array:
    return rotmat_to_quat(rpy_to_rotmat(rpy))


def pose_to_xyzrpy(p: jax.Array) -> jax.Array:
    """pose7 -> [x, y, z, roll, pitch, yaw].

    Equivalent of ``ps_graph_slam::matrix2vector``
    (``/root/reference/include/ps_graph_slam/ros_utils.hpp:90-106``).
    """
    return jnp.concatenate([p[..., :3], quat_to_rpy(p[..., 3:])], axis=-1)
