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
    """Residual [6] and Jacobians [6,6] wrt right-perturbations of i and j."""

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
# chi2
# ---------------------------------------------------------------------------


def graph_chi2(g) -> jax.Array:
    """Total weighted squared error over active edges (g2o graph->chi2())."""
    r_o = jax.vmap(se3_edge_residual)(g.poses[g.odom_i], g.poses[g.odom_j], g.odom_meas)
    chi_o = jnp.einsum("ei,eij,ej->e", r_o, g.odom_info, r_o)
    r_l = jax.vmap(se3_point_residual)(g.poses[g.lme_k], g.landmarks[g.lme_l], g.lme_meas)
    chi_l = jnp.einsum("ei,eij,ej->e", r_l, g.lme_info, r_l)
    return jnp.sum(chi_o * g.odom_mask()) + jnp.sum(chi_l * g.lme_mask())
