"""Edge residuals and Jacobians for the pose graph.

Residual conventions match g2o's edge types used by the reference backend
(``graph_slam.cpp:136-166``):

* ``EdgeSE3`` between keyframes i, j with measurement Z:
  ``r = log( Z^{-1} · X_i^{-1} · X_j )`` in se(3) (translation first).
  (g2o uses the MQT vectorisation; both vanish at the same minimum and agree
  to first order, which is what the Gauss-Newton step consumes.)
* ``EdgeSE3PointXYZ`` with identity sensor offset (the reference registers an
  identity ``ParameterSE3Offset``, graph_slam.cpp:75-83):
  ``r = R_k^T (p_l - t_k) - z``.

Jacobians are w.r.t. *right* local perturbations ``X <- X·exp(xi)`` for poses
and additive updates for landmarks. SE3-point Jacobians are analytic
(closed-form, VPU-friendly); SE3-SE3 Jacobians use per-edge forward-mode AD
(12 tangents x 6 outputs per edge — cheap, exact, fusable), verified against
numeric differentiation in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semantic_slam_tpu.core import geometry as geo

# ---------------------------------------------------------------------------
# SE3 - SE3 (odometry) edges
# ---------------------------------------------------------------------------


def se3_edge_residual(pose_i: jax.Array, pose_j: jax.Array, meas: jax.Array) -> jax.Array:
    rel = geo.pose_mul(geo.pose_inv(pose_i), pose_j)
    return geo.se3_log(geo.pose_mul(geo.pose_inv(meas), rel))


def se3_edge_residual_jac(
    pose_i: jax.Array, pose_j: jax.Array, meas: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Residual [6] and Jacobians [6,6] wrt right-perturbations of i and j.

    Analytic (Barfoot Q-matrix) form: with E = Z^-1 X_i^-1 X_j and r = log E,
      X_j <- X_j exp(xi_j):  E' = E exp(xi_j)              => J_j = Jr^-1(r)
      X_i <- X_i exp(xi_i):  E' = E exp(-Ad(T_ij^-1) xi_i) => J_i = -J_j Ad(T_ij^-1)
    where T_ij = X_i^-1 X_j. Verified against forward-mode AD
    (``se3_edge_residual_jac_ad``) in tests.
    """
    rel = geo.pose_mul(geo.pose_inv(pose_i), pose_j)
    r = geo.se3_log(geo.pose_mul(geo.pose_inv(meas), rel))
    Jj = geo.se3_right_jacobian_inv(r)
    Ji = -(Jj @ geo.pose_adjoint(geo.pose_inv(rel)))
    return r, Ji, Jj


def se3_edge_residual_jac_ad(
    pose_i: jax.Array, pose_j: jax.Array, meas: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Forward-mode AD reference implementation (12 tangents) — kept as the
    ground truth the analytic path is tested against."""

    def f(xi: jax.Array) -> jax.Array:
        return se3_edge_residual(
            geo.pose_retract(pose_i, xi[:6]), geo.pose_retract(pose_j, xi[6:]), meas
        )

    zero = jnp.zeros(12, dtype=pose_i.dtype)
    r = f(zero)
    J = jax.jacfwd(f)(zero)  # [6, 12]
    return r, J[:, :6], J[:, 6:]


# ---------------------------------------------------------------------------
# SE3 - point (landmark observation) edges
# ---------------------------------------------------------------------------


def se3_point_residual(pose_k: jax.Array, lm: jax.Array, meas: jax.Array) -> jax.Array:
    v = geo.quat_rotate(geo.quat_conj(pose_k[..., 3:]), lm - pose_k[..., :3])
    return v - meas


def se3_point_residual_jac(
    pose_k: jax.Array, lm: jax.Array, meas: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Residual [3], J_pose [3,6], J_lm [3,3] (analytic).

    With right perturbation (R', t') = (R(I+[w]x), t + R d):
      r' ≈ r - d - [w]x v = r - d + [v]x w,  v = R^T (p - t)
    so J_pose = [-I3 | hat(v)] and J_lm = R^T.
    """
    q = pose_k[..., 3:]
    Rt = geo.quat_to_rotmat(geo.quat_conj(q))
    v = Rt @ (lm - pose_k[..., :3])
    r = v - meas
    J_pose = jnp.concatenate([-jnp.eye(3, dtype=r.dtype), geo.hat(v)], axis=-1)
    return r, J_pose, Rt


# ---------------------------------------------------------------------------
# SE3 - plane edges (the reference's disabled EdgeSE3Plane, component 16)
# ---------------------------------------------------------------------------


def se3_plane_residual(pose: jax.Array, plane4: jax.Array, meas4: jax.Array) -> jax.Array:
    """3-dof plane observation residual — the VPS-SLAM paper's plane-landmark
    formulation that the reference release downgraded to point landmarks
    (``include/g2o/edge_se3_plane.hpp:15-24``, registration commented out at
    ``graph_slam.cpp:30-33``). Provided as an available edge type for the
    full plane-adjustment upgrade path.

    plane4 = [n (unit), d] in world; meas4 = plane observed in the sensor
    frame. Prediction: world plane pulled into the sensor frame of ``pose``:
      n_pred = R^T n,  d_pred = d + n . t
    Error: tangent-plane rotation of the normal (cross-product small-angle
    form, the first-order equivalent of g2o's azimuth/elevation ominus) plus
    the offset difference.
    """
    n_w = plane4[..., :3]
    d_w = plane4[..., 3]
    R_t = geo.quat_to_rotmat(geo.quat_conj(pose[..., 3:]))
    n_pred = jnp.einsum("...ij,...j->...i", R_t, n_w)
    d_pred = d_w + jnp.einsum("...i,...i->...", n_w, pose[..., :3])
    # sign-invariance: (n, d) and (-n, -d) are the same plane, and the
    # frontend's h/v canonicalization (cam-frame sign rules) can flip a
    # plane's observed orientation between viewpoints — align the
    # measurement to the prediction's hemisphere before differencing
    sign = jnp.where(
        jnp.einsum("...i,...i->...", n_pred, meas4[..., :3]) < 0, -1.0, 1.0
    )
    meas4 = meas4 * sign[..., None]
    n_meas = meas4[..., :3]
    e_rot = jnp.cross(n_pred, n_meas)
    # project the rotation error onto two tangent directions of n_meas
    ref = jnp.where(
        jnp.abs(n_meas[..., 2:3]) < 0.9,
        jnp.array([0.0, 0.0, 1.0], dtype=pose.dtype),
        jnp.array([1.0, 0.0, 0.0], dtype=pose.dtype),
    )
    t1 = jnp.cross(n_meas, ref)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
    t2 = jnp.cross(n_meas, t1)
    return jnp.stack(
        [
            jnp.einsum("...i,...i->...", e_rot, t1),
            jnp.einsum("...i,...i->...", e_rot, t2),
            d_pred - meas4[..., 3],
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# chi2
# ---------------------------------------------------------------------------


def graph_chi2(g) -> jax.Array:
    """Total weighted squared error over active edges (g2o graph->chi2())."""
    r_o = jax.vmap(se3_edge_residual)(g.poses[g.odom_i], g.poses[g.odom_j], g.odom_meas)
    chi_o = jnp.einsum("ei,eij,ej->e", r_o, g.odom_info, r_o)
    r_l = jax.vmap(se3_point_residual)(g.poses[g.lme_k], g.landmarks[g.lme_l], g.lme_meas)
    chi_l = jnp.einsum("ei,eij,ej->e", r_l, g.lme_info, r_l)
    return jnp.sum(chi_o * g.odom_mask()) + jnp.sum(chi_l * g.lme_mask())
