"""Plane-landmark extension for the production Schur solver.

``solver/plane_ba.py`` proves out the paper's plane formulation with a
whole-problem Jacobian; this module folds plane landmarks into the MAIN
Schur-complement machinery instead: plane blocks are 3-dof (2 normal-tangent
+ offset) exactly like point blocks, so they append onto the block-diagonal
landmark system (``Hll``/``W``/``gl`` grow from ``L`` to ``L+Pl`` blocks) and
the reduced camera solve is unchanged. Capacity masks keep empty plane slots
inert, so a graph with ``num_planes == 0`` is bit-identical to the
point-only path.

This is the wired version of the reference's disabled ``EdgeSE3Plane``
(component 16, ``graph_slam.cpp:30-33``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from semantic_slam_tpu.core import geometry as geo
from semantic_slam_tpu.graph import residuals as res
from semantic_slam_tpu.graph.state import GraphState
from semantic_slam_tpu.solver import lm as lm_mod
from semantic_slam_tpu.solver.plane_ba import plane_retract
from semantic_slam_tpu.solver.robust import robust_rho, robust_weight


class PlaneNodes(NamedTuple):
    planes: jax.Array  # [Pl, 4] (unit n, d)
    num_planes: jax.Array
    pe_k: jax.Array  # [E3] pose index
    pe_p: jax.Array  # [E3] plane index
    pe_meas: jax.Array  # [E3, 4] sensor-frame plane observation
    pe_info: jax.Array  # [E3, 3, 3]
    num_pe: jax.Array

    def plane_mask(self) -> jax.Array:
        return jnp.arange(self.planes.shape[0]) < self.num_planes

    def pe_mask(self) -> jax.Array:
        return jnp.arange(self.pe_k.shape[0]) < self.num_pe


def make_planes(max_planes: int = 32, max_edges: int = 256, dtype=jnp.float32) -> PlaneNodes:
    base = jnp.tile(jnp.asarray([0.0, 0.0, 1.0, 0.0], dtype), (max_planes, 1))
    return PlaneNodes(
        planes=base,
        num_planes=jnp.zeros((), jnp.int32),
        pe_k=jnp.zeros((max_edges,), jnp.int32),
        pe_p=jnp.zeros((max_edges,), jnp.int32),
        pe_meas=jnp.tile(jnp.asarray([0.0, 0.0, 1.0, 0.0], dtype), (max_edges, 1)),
        pe_info=jnp.zeros((max_edges, 3, 3), dtype),
        num_pe=jnp.zeros((), jnp.int32),
    )


def add_plane_node(pn: PlaneNodes, plane4: jax.Array) -> tuple[PlaneNodes, jax.Array]:
    idx = pn.num_planes
    return pn._replace(
        planes=pn.planes.at[idx].set(plane4.astype(pn.planes.dtype)),
        num_planes=idx + 1,
    ), idx


def add_se3_plane_edge(
    pn: PlaneNodes, k: jax.Array, p: jax.Array, meas4: jax.Array, info33: jax.Array
) -> PlaneNodes:
    e = pn.num_pe
    return pn._replace(
        pe_k=pn.pe_k.at[e].set(jnp.asarray(k, jnp.int32)),
        pe_p=pn.pe_p.at[e].set(jnp.asarray(p, jnp.int32)),
        pe_meas=pn.pe_meas.at[e].set(meas4.astype(pn.pe_meas.dtype)),
        pe_info=pn.pe_info.at[e].set(info33.astype(pn.pe_info.dtype)),
        num_pe=e + 1,
    )


def _plane_edge_jac(pose_k, plane4, meas4):
    """Residual [3] + J_pose [3,6] + J_plane [3,3] via forward AD over the
    right pose perturbation and the plane tangent."""

    def f(t):
        return res.se3_plane_residual(
            geo.pose_retract(pose_k, t[:6]), plane_retract(plane4, t[6:]), meas4
        )

    zero = jnp.zeros(9, dtype=pose_k.dtype)
    r = f(zero)
    J = jax.jacfwd(f)(zero)
    return r, J[:, :6], J[:, 6:]


def linearize_with_planes(
    g: GraphState,
    pn: PlaneNodes,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    assembly: str = "auto",
) -> lm_mod.Linearization:
    """Point linearization + plane blocks appended onto the landmark system.

    ``robust_kind`` applies the same Huber/DCS IRLS reweighting to BOTH the
    point observation edges (via the base linearization) and the SE3-plane
    edges; odometry stays unweighted, matching the reference's robust-kernel
    placement (graph_slam.cpp:155-161 attaches kernels to landmark edges
    only). ``assembly`` as in ``lm.linearize_arrays`` (one-hot matmuls on
    TPU, scatters on CPU)."""
    from semantic_slam_tpu.solver import assembly as asm

    use_mm = asm.resolve_assembly(assembly) == "matmul"
    lin = lm_mod.linearize_arrays(
        g.poses, g.landmarks, *lm_mod._edge_args(g),
        robust_kind=robust_kind, robust_delta=robust_delta, assembly=assembly,
    )
    K = g.poses.shape[0]
    Pl = pn.planes.shape[0]
    dtype = g.poses.dtype

    pm = pn.pe_mask().astype(dtype)
    p_info = pn.pe_info * pm[:, None, None]
    r_p, Jk, Jp = jax.vmap(_plane_edge_jac)(
        g.poses[pn.pe_k], pn.planes[pn.pe_p], pn.pe_meas
    )
    chi_e = jnp.einsum("ea,eab,eb->e", r_p, p_info, r_p)
    chi_p_rho = jnp.sum(robust_rho(chi_e, robust_kind, robust_delta))
    if robust_kind != "none":
        w = robust_weight(chi_e, robust_kind, robust_delta).astype(dtype)
        p_info = p_info * w[:, None, None]
    JkT_O = jnp.einsum("eai,eab->eib", Jk, p_info)
    JpT_O = jnp.einsum("eai,eab->eib", Jp, p_info)
    H_kk = jnp.einsum("eia,eaj->eij", JkT_O, Jk)
    W_kp = jnp.einsum("eia,eaj->eij", JkT_O, Jp)
    H_pp = jnp.einsum("eia,eaj->eij", JpT_O, Jp)
    g_k = jnp.einsum("eia,ea->ei", JkT_O, r_p)
    g_p = jnp.einsum("eia,ea->ei", JpT_O, r_p)
    chi_p = chi_p_rho

    if use_mm:
        Ok = asm.onehot(pn.pe_k, K, dtype)
        Op = asm.onehot(pn.pe_p, Pl, dtype)
        Dp = jnp.einsum("ek,eij->kij", Ok, H_kk)
        Hpp2 = (
            lin.Hpp.reshape(K, 6, K, 6) + asm.diag_embed_blocks(Dp)
        ).reshape(6 * K, 6 * K)
        gp = (lin.gp.reshape(K, 6) + jnp.einsum("ek,ei->ki", Ok, g_k)).reshape(-1)
        Wp2 = asm.cross_block_mm(pn.pe_k, pn.pe_p, W_kp, K, Pl).reshape(
            6 * K, 3 * Pl
        )
        W = jnp.concatenate([lin.W, Wp2], axis=1)
        Hll = jnp.concatenate(
            [lin.Hll, jnp.einsum("ep,eij->pij", Op, H_pp)], axis=0
        )
        gl = jnp.concatenate(
            [lin.gl, jnp.einsum("ep,ei->pi", Op, g_p).reshape(-1)]
        )
    else:
        Hpp = lin.Hpp.reshape(K, 6, K, 6)
        Hpp = jnp.transpose(Hpp, (0, 2, 1, 3))  # [K, K, 6, 6]
        Hpp = Hpp.at[pn.pe_k, pn.pe_k].add(H_kk)
        Hpp2 = jnp.transpose(Hpp, (0, 2, 1, 3)).reshape(6 * K, 6 * K)

        gp = lin.gp.reshape(K, 6).at[pn.pe_k].add(g_k).reshape(-1)

        Wp = jnp.zeros((K, Pl, 6, 3), dtype).at[pn.pe_k, pn.pe_p].add(W_kp)
        Wp2 = jnp.transpose(Wp, (0, 2, 1, 3)).reshape(6 * K, 3 * Pl)
        W = jnp.concatenate([lin.W, Wp2], axis=1)  # [6K, 3(L+Pl)]

        Hll_p = jnp.zeros((Pl, 3, 3), dtype).at[pn.pe_p].add(H_pp)
        Hll = jnp.concatenate([lin.Hll, Hll_p], axis=0)

        gl_p = jnp.zeros((Pl, 3), dtype).at[pn.pe_p].add(g_p)
        gl = jnp.concatenate([lin.gl, gl_p.reshape(-1)])

    return lm_mod.Linearization(Hpp2, W, Hll, gp, gl, lin.chi2 + chi_p)


def chi2_with_planes(
    g: GraphState,
    pn: PlaneNodes,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
) -> jax.Array:
    base = lm_mod.chi2_arrays(
        g.poses, g.landmarks, *lm_mod._edge_args(g),
        robust_kind=robust_kind, robust_delta=robust_delta,
    )
    r_p = jax.vmap(res.se3_plane_residual)(
        g.poses[pn.pe_k], pn.planes[pn.pe_p], pn.pe_meas
    )
    chi_p = jnp.einsum("ei,eij,ej->e", r_p, pn.pe_info, r_p)
    chi_p = robust_rho(chi_p, robust_kind, robust_delta)
    return base + jnp.sum(chi_p * pn.pe_mask().astype(g.poses.dtype))


@partial(
    jax.jit,
    static_argnames=("max_iterations", "min_edges", "rel_tol", "robust_kind", "robust_delta"),
)
def lm_optimize_with_planes(
    g: GraphState,
    pn: PlaneNodes,
    max_iterations: int = 64,
    min_edges: int = 10,
    rel_tol: float = 1e-6,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    init_lambda=0.0,
    prior=None,
) -> tuple[GraphState, PlaneNodes, lm_mod.LMStats]:
    """Joint LM over poses + point landmarks + plane landmarks (Schur
    elimination of both block types). ``prior`` (fixed-lag MarginalPrior
    with plane part) is folded into every linearization."""
    K = g.poses.shape[0]
    L = g.landmarks.shape[0]
    Pl = pn.planes.shape[0]
    pose_free, lm_free = lm_mod._free_masks(g)
    block_free = jnp.concatenate([lm_free, pn.plane_mask()])

    def lin_fn(g_, pn_):
        lin = linearize_with_planes(g_, pn_, robust_kind, robust_delta)
        if prior is not None:
            from semantic_slam_tpu.solver import fixed_lag as fl

            lin = fl.apply_prior_planes(
                lin, prior, g_.poses, g_.landmarks, pn_.planes
            )
        return lin

    lin0 = lin_fn(g, pn)
    chi2_0 = lin0.chi2
    dtype = g.poses.dtype

    diag_max = jnp.maximum(
        jnp.max(jnp.abs(jnp.diagonal(lin0.Hpp))),
        jnp.max(jnp.abs(jnp.diagonal(lin0.Hll, axis1=-2, axis2=-1))),
    )
    init_lambda = jnp.asarray(init_lambda, dtype)
    lam0 = jnp.where(
        init_lambda > 0, init_lambda, 1e-5 * jnp.maximum(diag_max, 1.0)
    ).astype(dtype)

    def apply(g_, pn_, dp, db):
        poses = jax.vmap(geo.pose_retract)(g_.poses, dp)
        dl = db[:L]
        dpl = db[L:]
        landmarks = g_.landmarks + dl
        planes = jax.vmap(plane_retract)(pn_.planes, dpl)
        return g_._replace(poses=poses, landmarks=landmarks), pn_._replace(planes=planes)

    def cond(carry):
        *_, it, done = carry
        return (it < max_iterations) & jnp.logical_not(done)

    def body(carry):
        g_, pn_, lin, lam, nu, it, done = carry
        dp, db = lm_mod.schur_solve(lin, pose_free, block_free, lam)
        g_t, pn_t = apply(g_, pn_, dp, db)
        # speculative relinearization at the trial point (see run_lm_loop)
        lin_new = lin_fn(g_t, pn_t)
        chi2_new = lin_new.chi2

        delta = jnp.concatenate([dp.reshape(-1), db.reshape(-1)])
        gvec = jnp.concatenate([lin.gp, lin.gl])
        pred = lam * jnp.dot(delta, delta) - jnp.dot(delta, gvec)
        rho = (lin.chi2 - chi2_new) / jnp.maximum(pred, 1e-12)
        finite = jnp.isfinite(chi2_new) & jnp.all(jnp.isfinite(delta))
        accept = (rho > 0) & finite

        g_ = jax.tree.map(lambda a, b: jnp.where(accept, a, b), g_t, g_)
        pn_ = jax.tree.map(lambda a, b: jnp.where(accept, a, b), pn_t, pn_)
        lam_acc = lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam = jnp.where(accept, lam_acc, lam * nu)
        nu = jnp.where(accept, 2.0, nu * 2.0)
        converged = accept & ((lin.chi2 - chi2_new) <= rel_tol * jnp.maximum(lin.chi2, 1e-12))
        done = converged | (lam > 1e12)
        lin = jax.tree.map(lambda a, b: jnp.where(accept, a, b), lin_new, lin)
        return g_, pn_, lin, lam, nu, it + 1, done

    init = (g, pn, lin0, lam0, jnp.asarray(2.0, dtype), jnp.zeros((), jnp.int32), jnp.zeros((), bool))
    g_out, pn_out, lin_f, lam, _, it, _ = jax.lax.while_loop(cond, body, init)

    run = (g.num_edges() + pn.num_pe) >= min_edges
    g_out = jax.tree.map(lambda a, b: jnp.where(run, a, b), g_out, g)
    pn_out = jax.tree.map(lambda a, b: jnp.where(run, a, b), pn_out, pn)
    chi2_f = jnp.where(run, lin_f.chi2, chi2_0)
    stats = lm_mod.LMStats(
        iterations=jnp.where(run, it, 0),
        chi2_initial=chi2_0,
        chi2_final=chi2_f,
        lambda_final=lam,
    )
    return g_out, pn_out, stats
