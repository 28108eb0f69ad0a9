"""Channelwise (K-last) SE3-SE3 chain linearization — kernel-shareable.

The r4 fused solve left the odometry-chain linearize as the AoS remainder:
``vmap(se3_edge_residual_jac)`` over [K, 7] rows followed by [K, 6, 6]
einsums — every op carries its 6/7-sized dims LAST, so the TPU tiles 6 of
128 lanes and the whole build runs at a few percent occupancy (the same
lane-geometry failure ``ellk_soa`` fixed for the observation edges, VERDICT
r4 "half the solve is still XLA prep"). This module re-expresses the SAME
math as channel arrays ``[C, ..., K]`` (big axis last, ops unrolled over
the 3/4/6-sized channel dims), in pure 2-D-friendly jnp so the identical
code runs (a) inside the XLA ``soa_linearize`` and (b) inside the Pallas
linearize/chi2 kernels (solver/pallas_cg.py).

Math is identical to ``graph/residuals.se3_edge_residual_jac`` (the
analytic Barfoot form: J_j = Jr^-1(r), J_i = -J_j Ad(T_ij^-1)) and
``core/geometry.py`` (same Taylor cutoffs, same float32-safe guards), up to
float summation order; pinned by tests/test_chain_soa.py. Both Jacobians
are block upper-triangular ``[[X, Y], [0, X]]``, which the product helpers
exploit (8 3x3 muls per 6x6 product instead of 36).

Reference semantics: g2o EdgeSE3 linearization consumed by the lm_var loop
(``/root/reference/src/ps_graph_slam/graph_slam.cpp:136-148,182-219``).
"""

from __future__ import annotations

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# channel helpers (shapes [3, ...], [4, ...], [3, 3, ...]; trailing dims are
# the big axes)
# ---------------------------------------------------------------------------


def m33_mul(A, B):
    """A @ B for [3,3,...] channel arrays."""
    return jnp.stack(
        [
            jnp.stack(
                [sum(A[i, k] * B[k, j] for k in range(3)) for j in range(3)],
                axis=0,
            )
            for i in range(3)
        ],
        axis=0,
    )


def m33T_mul(A, B):
    """A^T @ B for [3,3,...] channel arrays."""
    return jnp.stack(
        [
            jnp.stack(
                [sum(A[k, i] * B[k, j] for k in range(3)) for j in range(3)],
                axis=0,
            )
            for i in range(3)
        ],
        axis=0,
    )


def m33_vec(A, x):
    return jnp.stack(
        [sum(A[i, k] * x[k] for k in range(3)) for i in range(3)], axis=0
    )


def cross_ch(a, b):
    return jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ],
        axis=0,
    )


def hat_mul(v, M):
    """hat(v) @ M."""
    r0 = jnp.stack([-v[2] * M[1][j] + v[1] * M[2][j] for j in range(3)], 0)
    r1 = jnp.stack([v[2] * M[0][j] - v[0] * M[2][j] for j in range(3)], 0)
    r2 = jnp.stack([-v[1] * M[0][j] + v[0] * M[1][j] for j in range(3)], 0)
    return jnp.stack([r0, r1, r2], axis=0)


def hat_ch(w):
    """hat(w) as a [3,3,...] channel array."""
    z = jnp.zeros_like(w[0])
    return jnp.stack(
        [
            jnp.stack([z, -w[2], w[1]], axis=0),
            jnp.stack([w[2], z, -w[0]], axis=0),
            jnp.stack([-w[1], w[0], z], axis=0),
        ],
        axis=0,
    )


def quat_mul_ch(a, b):
    """Hamilton product for [4, ...] (w-first) channel arrays."""
    aw, ax, ay, az = a[0], a[1], a[2], a[3]
    bw, bx, by, bz = b[0], b[1], b[2], b[3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=0,
    )


def quat_conj_ch(q):
    return jnp.stack([q[0], -q[1], -q[2], -q[3]], axis=0)


def quat_normalize_ch(q):
    n = jnp.sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3])
    return q / n


def quat_rotate_ch(q, v):
    """R(q) @ v, cross-product form (same op sequence as geometry.quat_rotate)."""
    w = q[0:1]
    u = q[1:]
    uv = cross_ch(u, v)
    return v + 2.0 * (w * uv + cross_ch(u, uv))


def rotmat_ch(q):
    """R(q) as [3,3,...] channels (geometry.quat_to_rotmat entries)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], 0),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], 0),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], 0),
        ],
        axis=0,
    )


def _atan2_q1(s_in, c_in):
    """First-quadrant atan2(s, c) (s, c >= 0, not both 0) WITHOUT lax.atan2
    — Mosaic TPU has no inverse-trig lowering (only sin/cos/tan). Normalize
    to the unit circle, seed with y0 = (pi/2) s/(s+c) (exact at 0, pi/4,
    pi/2; max error ~0.021 rad), then two Newton steps on
    f(y) = sin(y - y*) whose update is y - tan(y - y*): cubic convergence,
    error 3e-6 -> ~1e-17 — below f32 AND f64 resolution of the result.
    Shared by the XLA and Pallas paths so both stay float-identical."""
    r = jnp.sqrt(s_in * s_in + c_in * c_in)
    s = s_in / r
    c = c_in / r
    y = (jnp.pi / 2.0) * s / (s + c)  # s + c >= 1 on the unit quarter-circle
    for _ in range(2):
        sy = jnp.sin(y)
        cy = jnp.cos(y)
        y = y - (sy * c - cy * s) / (cy * c + sy * s)
    return y


def quat_log_ch(q):
    """geometry.quat_log channelwise: [4, ...] -> rotation vector [3, ...].

    Same branches/cutoffs as geometry.quat_log; the atan2 is the Newton
    form above (kernel-lowerable), accurate past f64 resolution."""
    sign = jnp.where(q[0:1] < 0, -1.0, 1.0)
    q = q * sign
    w = jnp.clip(q[0], -1.0, 1.0)
    v = q[1:]
    vnorm = jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])
    theta = 2.0 * _atan2_q1(vnorm, jnp.maximum(w, 0.0))
    small = vnorm < 1e-8
    scale = jnp.where(
        small, 2.0 / jnp.maximum(w, 1e-12), theta / jnp.maximum(vnorm, 1e-32)
    )
    return scale * v


def _eye_ch(like):
    one = jnp.ones_like(like)
    zero = jnp.zeros_like(like)
    return jnp.stack(
        [
            jnp.stack([one, zero, zero], 0),
            jnp.stack([zero, one, zero], 0),
            jnp.stack([zero, zero, one], 0),
        ],
        axis=0,
    )


def so3_ljac_inv_ch(w):
    """geometry.so3_left_jacobian_inv channelwise (same cutoffs/Taylor)."""
    theta2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
    theta = jnp.sqrt(theta2 + 1e-32)
    W = hat_ch(w)
    W2 = m33_mul(W, W)
    small = theta2 < 4e-3
    half_theta = 0.5 * theta
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0 + theta2 * theta2 / 30240.0,
        (
            1.0
            - half_theta
            * jnp.cos(half_theta)
            / jnp.maximum(jnp.sin(half_theta), 1e-32)
        )
        / jnp.maximum(theta2, 1e-32),
    )
    return _eye_ch(theta2) - 0.5 * W + cot_term * W2


def so3_ljac_ch(w):
    """geometry.so3_left_jacobian channelwise (the V matrix of se3_exp)."""
    theta2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
    theta = jnp.sqrt(theta2 + 1e-32)
    W = hat_ch(w)
    W2 = m33_mul(W, W)
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
    return _eye_ch(theta2) + A * W + B * W2


def se3_Q_ch(v, w):
    """geometry.se3_Q_matrix channelwise (Barfoot eq. 7.86, same cutoffs)."""
    theta2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
    theta = jnp.sqrt(theta2 + 1e-32)
    V = hat_ch(v)
    W = hat_ch(w)
    WV = m33_mul(W, V)
    VW = m33_mul(V, W)
    WW = m33_mul(W, W)
    W_VW = m33_mul(W, VW)
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
        (2.0 * theta - 3.0 * s + theta * c)
        / jnp.maximum(2.0 * theta2 * theta2 * theta, 1e-32),
    )
    return (
        0.5 * V
        + c1 * (WV + VW + W_VW)
        + c2 * (m33_mul(WW, V) + m33_mul(V, WW) - 3.0 * W_VW)
        + c3 * (m33_mul(W_VW, W) + m33_mul(WW, VW))
    )


# ---------------------------------------------------------------------------
# chain residual / Jacobian blocks
# ---------------------------------------------------------------------------


def chain_residual_ch(t_i, q_i, t_j, q_j, m_t, m_q):
    """r = log(meas^-1 · pose_i^-1 · pose_j) channelwise.

    Inputs [3/4, K]; returns (rv [3,K], rw [3,K]) — translation first, the
    se3_edge_residual convention."""
    qi_c = quat_conj_ch(q_i)
    # rel = pose_inv(p_i) * p_j  (pose_mul op order: ta + R(qa) tb)
    rel_t = -quat_rotate_ch(qi_c, t_i) + quat_rotate_ch(qi_c, t_j)
    rel_q = quat_normalize_ch(quat_mul_ch(qi_c, q_j))
    # E = pose_inv(meas) * rel
    mq_c = quat_conj_ch(m_q)
    E_t = -quat_rotate_ch(mq_c, m_t) + quat_rotate_ch(mq_c, rel_t)
    E_q = quat_normalize_ch(quat_mul_ch(mq_c, rel_q))
    rw = quat_log_ch(E_q)
    Vinv = so3_ljac_inv_ch(rw)
    rv = m33_vec(Vinv, E_t)
    return rv, rw, rel_t, rel_q


def chain_jacobian_blocks_ch(rv, rw, rel_t, rel_q):
    """Analytic Jacobian blocks of the chain residual wrt right
    perturbations: J_j = Jr^-1(r), J_i = -J_j Ad(rel^-1), both
    [[X, Y], [0, X]] block upper-triangular. Returns (Xi, Yi, Xj, Yj),
    each [3,3,K]."""
    Xj = so3_ljac_inv_ch(-rw)
    Q = se3_Q_ch(-rv, -rw)
    Yj = -m33_mul(Xj, m33_mul(Q, Xj))
    # Ad(pose_inv(rel)) = [[Rir, hat(tir) Rir], [0, Rir]]
    q_ir = quat_conj_ch(rel_q)
    t_ir = -quat_rotate_ch(q_ir, rel_t)
    R_ir = rotmat_ch(q_ir)
    XjR = m33_mul(Xj, R_ir)
    Xi = -XjR
    Yi = -(m33_mul(Xj, hat_mul(t_ir, R_ir)) + m33_mul(Yj, R_ir))
    return Xi, Yi, Xj, Yj


def _jT_O(X, Y, O11, O12, O21, O22):
    """T = J^T O for J = [[X, Y], [0, X]]; returns T's quadrants."""
    T11 = m33T_mul(X, O11)
    T12 = m33T_mul(X, O12)
    T21 = m33T_mul(Y, O11) + m33T_mul(X, O21)
    T22 = m33T_mul(Y, O12) + m33T_mul(X, O22)
    return T11, T12, T21, T22


def _T_J(T11, T12, T21, T22, X, Y):
    """H = T J for J = [[X, Y], [0, X]] -> [6,6,K] channel array."""
    H11 = m33_mul(T11, X)
    H12 = m33_mul(T11, Y) + m33_mul(T12, X)
    H21 = m33_mul(T21, X)
    H22 = m33_mul(T21, Y) + m33_mul(T22, X)
    return jnp.concatenate(
        [
            jnp.concatenate([H11, H12], axis=1),
            jnp.concatenate([H21, H22], axis=1),
        ],
        axis=0,
    )


def chain_linearize_ch(t_i, q_i, t_j, q_j, m_t, m_q, O):
    """Full chain linearization, channelwise.

    O is the [6,6,K] information (zeroed on masked rows — masked rows must
    carry the identity measurement, as ``build_ell_edges`` guarantees).
    Returns (Hii, Hij, Hjj [6,6,K], g_i, g_j [6,K], chi [K])."""
    rv, rw, rel_t, rel_q = chain_residual_ch(t_i, q_i, t_j, q_j, m_t, m_q)
    Xi, Yi, Xj, Yj = chain_jacobian_blocks_ch(rv, rw, rel_t, rel_q)
    O11, O12, O21, O22 = O[:3, :3], O[:3, 3:], O[3:, :3], O[3:, 3:]
    Ti = _jT_O(Xi, Yi, O11, O12, O21, O22)
    Tj = _jT_O(Xj, Yj, O11, O12, O21, O22)
    Hii = _T_J(*Ti, Xi, Yi)
    Hij = _T_J(*Ti, Xj, Yj)
    Hjj = _T_J(*Tj, Xj, Yj)
    g_i = jnp.concatenate(
        [
            m33_vec(Ti[0], rv) + m33_vec(Ti[1], rw),
            m33_vec(Ti[2], rv) + m33_vec(Ti[3], rw),
        ],
        axis=0,
    )
    g_j = jnp.concatenate(
        [
            m33_vec(Tj[0], rv) + m33_vec(Tj[1], rw),
            m33_vec(Tj[2], rv) + m33_vec(Tj[3], rw),
        ],
        axis=0,
    )
    Orv = m33_vec(O11, rv) + m33_vec(O12, rw)
    Orw = m33_vec(O21, rv) + m33_vec(O22, rw)
    chi = sum(rv[i] * Orv[i] for i in range(3)) + sum(
        rw[i] * Orw[i] for i in range(3)
    )
    return Hii, Hij, Hjj, g_i, g_j, chi


def chain_chi2_ch(t_i, q_i, t_j, q_j, m_t, m_q, O):
    """Residual-only chain chi2 [K] (the LM trial-point evaluation)."""
    rv, rw, _, _ = chain_residual_ch(t_i, q_i, t_j, q_j, m_t, m_q)
    O11, O12, O21, O22 = O[:3, :3], O[:3, 3:], O[3:, :3], O[3:, 3:]
    Orv = m33_vec(O11, rv) + m33_vec(O12, rw)
    Orw = m33_vec(O21, rv) + m33_vec(O22, rw)
    return sum(rv[i] * Orv[i] for i in range(3)) + sum(
        rw[i] * Orw[i] for i in range(3)
    )


# ---------------------------------------------------------------------------
# retraction (pose update) channelwise
# ---------------------------------------------------------------------------


def retract_ch(t, q, dv, dw):
    """pose_retract channelwise: p' = p · exp([dv, dw]).

    t [3,K], q [4,K] (w-first), dv/dw [3,K]. Returns (t', q')."""
    theta2 = dw[0] * dw[0] + dw[1] * dw[1] + dw[2] * dw[2]
    theta = jnp.sqrt(theta2 + 1e-32)
    half = 0.5 * theta
    small = theta2 < 1e-8
    sinc_half = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    cw = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    q_e = jnp.concatenate([cw[None], sinc_half[None] * dw], axis=0)
    V = so3_ljac_ch(dw)
    t_e = m33_vec(V, dv)
    t_new = t + quat_rotate_ch(q, t_e)
    q_new = quat_normalize_ch(quat_mul_ch(q, q_e))
    return t_new, q_new


def roll_up_pose_ch(x):
    """Channel arrays [C, K]: lane k of result = lane k+1 of x, wrapping
    lane 0 to the end — the channel form of ``jnp.roll(poses, -1, axis=0)``
    (the wrapped row is chain-masked via o_info)."""
    return jnp.concatenate([x[..., 1:], x[..., :1]], axis=-1)
