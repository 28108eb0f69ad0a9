"""Experimental plane-landmark bundle adjustment.

The VPS-SLAM paper formulates landmarks as PLANES; the reference release
downgraded them to 3-D points and disabled its ``EdgeSE3Plane`` (component
16, ``graph_slam.cpp:30-33``). This module restores the full formulation as
a standalone adjuster over SE(3) poses + plane landmarks ``[n, d]``:

  * plane local parameterization: 2 normal-tangent + 1 offset dof
    (``n' = normalize(n + t1*u + t2*v)``, ``d' = d + dd``),
  * residuals: ``se3_plane_residual`` (tangent rotation + offset error)
    per observation + the standard SE3-SE3 odometry chain,
  * whole-problem forward-mode Jacobian + damped normal equations — sized
    for semantic maps (tens of planes, hundreds of keyframes), where
    ``6K + 3P`` stays small enough that Schur elimination is unnecessary.

Techniques cross-referenced from PAPERS.md (Efficient Planar Bundle
Adjustment; Eigen-Factors bilevel plane SLAM). Round-2 direction: fold
plane blocks into the Schur/PCG machinery of ``lm.py``/``pcg.py`` as a
second eliminated block type.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from semantic_slam_tpu.core import geometry as geo
from semantic_slam_tpu.frontend.hull import plane_basis
from semantic_slam_tpu.graph import residuals as res


class PlaneGraph(NamedTuple):
    poses: jax.Array  # [K, 7]
    planes: jax.Array  # [P, 4] (unit n, d)
    num_poses: jax.Array
    num_planes: jax.Array
    # odometry chain
    odom_i: jax.Array
    odom_j: jax.Array
    odom_meas: jax.Array  # [E1, 7]
    odom_info: jax.Array  # [E1, 6, 6]
    num_odom: jax.Array
    # plane observations: pose k sees plane p as meas4 in its sensor frame
    pe_k: jax.Array
    pe_p: jax.Array
    pe_meas: jax.Array  # [E2, 4]
    pe_info: jax.Array  # [E2, 3, 3]
    num_pe: jax.Array


def plane_retract(plane4: jax.Array, delta3: jax.Array) -> jax.Array:
    """[t1, t2, dd] tangent update keeping n unit."""
    n = plane4[..., :3]
    u, v = plane_basis(n)
    n2 = n + delta3[..., 0:1] * u + delta3[..., 1:2] * v
    n2 = n2 / jnp.maximum(jnp.linalg.norm(n2, axis=-1, keepdims=True), 1e-12)
    return jnp.concatenate([n2, plane4[..., 3:] + delta3[..., 2:3]], axis=-1)


def _residual_vector(g: PlaneGraph, dp: jax.Array, dpl: jax.Array) -> jax.Array:
    """All weighted residuals at retracted state; dp [K,6], dpl [P,3]."""
    poses = jax.vmap(geo.pose_retract)(g.poses, dp)
    planes = jax.vmap(plane_retract)(g.planes, dpl)

    om = (jnp.arange(g.odom_i.shape[0]) < g.num_odom).astype(poses.dtype)
    r_o = jax.vmap(res.se3_edge_residual)(poses[g.odom_i], poses[g.odom_j], g.odom_meas)
    Lo = jnp.linalg.cholesky(
        g.odom_info + 1e-9 * jnp.eye(6, dtype=poses.dtype)[None]
    )
    r_o = jnp.einsum("eji,ej->ei", Lo, r_o) * om[:, None]

    pm = (jnp.arange(g.pe_k.shape[0]) < g.num_pe).astype(poses.dtype)
    r_p = jax.vmap(res.se3_plane_residual)(poses[g.pe_k], planes[g.pe_p], g.pe_meas)
    Lp = jnp.linalg.cholesky(g.pe_info + 1e-9 * jnp.eye(3, dtype=poses.dtype)[None])
    r_p = jnp.einsum("eji,ej->ei", Lp, r_p) * pm[:, None]

    return jnp.concatenate([r_o.reshape(-1), r_p.reshape(-1)])


@partial(jax.jit, static_argnames=("max_iterations",))
def plane_bundle_adjust(
    g: PlaneGraph, max_iterations: int = 32, rel_tol: float = 1e-8
) -> tuple[PlaneGraph, jax.Array, jax.Array]:
    """Damped GN over poses+planes. Returns (graph, chi2_initial, chi2_final).

    Pose 0 is gauge-fixed; inactive capacity slots are frozen.
    """
    K = g.poses.shape[0]
    P = g.planes.shape[0]
    dtype = g.poses.dtype
    pidx = jnp.arange(K)
    pose_free = ((pidx < g.num_poses) & (pidx > 0)).astype(dtype)
    plane_free = (jnp.arange(P) < g.num_planes).astype(dtype)
    free = jnp.concatenate(
        [jnp.repeat(pose_free, 6), jnp.repeat(plane_free, 3)]
    )

    def r_of(x):
        dp = x[: 6 * K].reshape(K, 6)
        dpl = x[6 * K :].reshape(P, 3)
        return _residual_vector(g, dp, dpl)

    n_var = 6 * K + 3 * P

    def chi2_at(x):
        r = r_of(x)
        return jnp.sum(r * r)

    def body(carry):
        state, lam, nu, chi2, it, done = carry

        def r_state(x):
            dp = x[: 6 * K].reshape(K, 6)
            dpl = x[6 * K :].reshape(P, 3)
            poses = jax.vmap(geo.pose_retract)(state.poses, dp)
            planes = jax.vmap(plane_retract)(state.planes, dpl)
            return _residual_vector(state._replace(poses=poses, planes=planes), jnp.zeros((K, 6), dtype), jnp.zeros((P, 3), dtype))

        zero = jnp.zeros((n_var,), dtype)
        r0 = r_state(zero)
        J = jax.jacfwd(r_state)(zero)  # [R, n_var]
        J = J * free[None, :]
        H = J.T @ J + lam * jnp.eye(n_var, dtype=dtype)
        H = H + jnp.diag(1.0 - free)
        b = -(J.T @ r0) * free
        dx = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(H), b)

        trial = state._replace(
            poses=jax.vmap(geo.pose_retract)(state.poses, dx[: 6 * K].reshape(K, 6)),
            planes=jax.vmap(plane_retract)(state.planes, dx[6 * K :].reshape(P, 3)),
        )
        r_t = _residual_vector(trial, jnp.zeros((K, 6), dtype), jnp.zeros((P, 3), dtype))
        chi2_new = jnp.sum(r_t * r_t)
        pred = lam * jnp.dot(dx, dx) - jnp.dot(dx, -b)
        rho = (chi2 - chi2_new) / jnp.maximum(pred, 1e-12)
        accept = (rho > 0) & jnp.isfinite(chi2_new)

        state = jax.tree.map(lambda a, bb: jnp.where(accept, a, bb), trial, state)
        chi2_next = jnp.where(accept, chi2_new, chi2)
        lam = jnp.where(
            accept, lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3), lam * nu
        )
        nu = jnp.where(accept, 2.0, nu * 2.0)
        done = (accept & ((chi2 - chi2_new) <= rel_tol * jnp.maximum(chi2, 1e-12))) | (
            lam > 1e12
        )
        return state, lam, nu, chi2_next, it + 1, done

    def cond(carry):
        _, _, _, _, it, done = carry
        return (it < max_iterations) & jnp.logical_not(done)

    chi2_0 = chi2_at(jnp.zeros((n_var,), dtype))
    init = (g, jnp.asarray(1e-4, dtype), jnp.asarray(2.0, dtype), chi2_0,
            jnp.zeros((), jnp.int32), jnp.zeros((), bool))
    state, _, _, chi2_f, _, _ = jax.lax.while_loop(cond, body, init)
    return state, chi2_0, chi2_f


def observe_plane(pose7: jax.Array, plane4: jax.Array) -> jax.Array:
    """Ground-truth sensor-frame observation of a world plane (for tests /
    simulators): n_s = R^T n, d_s = d + n . t."""
    q = pose7[..., 3:]
    n = plane4[..., :3]
    n_s = geo.quat_rotate(geo.quat_conj(q), n)
    d_s = plane4[..., 3] + jnp.sum(n * pose7[..., :3], axis=-1)
    return jnp.concatenate([n_s, d_s[..., None]], axis=-1)
