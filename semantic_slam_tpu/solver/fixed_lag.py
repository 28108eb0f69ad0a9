"""Fixed-lag smoothing: Schur marginalization of old keyframes into a prior.

The reference has NO mitigation for graph growth: every tick re-optimizes the
FULL history (``/root/reference/src/ps_graph_slam/semantic_graph_slam.cpp:76-95``,
``graph_slam.cpp:199-205``), so cost/iter grows superlinearly with trajectory
length (SURVEY.md §5 "long-context"). This module bounds it: when the active
window exceeds a configured lag, the oldest ``drop`` keyframes are
marginalized out exactly (Schur complement over the pose chain) and the graph
arrays are compacted in place — per-tick solve cost becomes O(window), not
O(history).

Marginalization scheme (documented approximations):

* **Pose chain — exact.** All odometry edges touching a dropped pose (plus
  the previous prior's pose part, re-linearized at the current estimates) are
  assembled into a dense block system over dropped poses M and the boundary
  poses B; M is Schur-eliminated:  ``H' = H_BB - H_BM H_MM^-1 H_MB``. The
  result is a dense Gaussian prior over the (few) boundary poses in local
  SE(3) coordinates around their current estimates.
* **Landmark observations — cross-term sparsified.** An observation edge
  from a dropped pose splits into (a) a world-frame unary landmark prior
  (``H_l += J_l^T O J_l``) and (b) the pose-side diagonal block + gradient
  (``J_p^T O J_p``, ``J_p^T O r``), which joins the pose marginalization.
  Only the pose-landmark CROSS block ``J_p^T O J_l`` is dropped — keeping
  both marginal pieces leaves the eliminated gradient stationary at a
  converged estimate (the prior is unbiased there) and keeps the landmark
  part block-diagonal, exactly the shape the Schur landmark elimination
  consumes. Dropping the off-diagonal of a PSD block keeps PSD-ness; the
  cost is optimism in the joint covariance (standard sparsification).
  Landmarks are NEVER removed: ids == graph indices stays invariant and
  association keeps matching against the full table.

The prior is a quadratic in local coordinates: for boundary poses
``e_p = log(ref^-1 x)`` and landmarks ``e_l = l - l_ref``,

  chi2_prior(x) = c0 + 2 g0.e + e^T H e

whose gradient/Hessian (with the usual J ~= I first-order prior
approximation) drop straight into ``Linearization``; ``run_lm_loop`` is
reused untouched.
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
from semantic_slam_tpu.solver.lm import Linearization, LMStats


class MarginalPrior(NamedTuple):
    """Gaussian prior produced by marginalization.

    Pose part: dense information over up to PB boundary poses (local SE(3)
    coords around ``p_ref``). Landmark part: independent 3x3 blocks over the
    FULL landmark capacity (world-position coords around ``l_ref``) — zero
    blocks mean "no prior". Slots >= num_p are all-zero by invariant.
    """

    p_idx: jax.Array  # [PB] i32 — graph pose indices
    p_ref: jax.Array  # [PB, 7] linearization poses
    num_p: jax.Array  # i32 scalar
    Hp: jax.Array  # [6PB, 6PB] dense pose information
    gp0: jax.Array  # [6PB] gradient at p_ref
    Hl: jax.Array  # [L, 3, 3] per-landmark information
    l_ref: jax.Array  # [L, 3]
    gl0: jax.Array  # [L, 3]
    c0: jax.Array  # scalar chi2 offset
    # planar-patch mode: per-plane anchored priors in the plane tangent
    # space (2 normal-tangent + offset) around pl_ref — same shape as the
    # Schur plane blocks, zero when unused
    Hpl: jax.Array  # [Pl, 3, 3]
    pl_ref: jax.Array  # [Pl, 4]
    gpl0: jax.Array  # [Pl, 3]

    @property
    def max_poses(self) -> int:
        return self.p_idx.shape[0]

    def is_empty(self) -> jax.Array:
        return (self.num_p == 0) & (jnp.sum(jnp.abs(self.Hl)) == 0)


def empty_prior(L: int, PB: int = 8, Pl: int = 0, dtype=jnp.float32) -> MarginalPrior:
    return MarginalPrior(
        p_idx=jnp.zeros((PB,), jnp.int32),
        p_ref=jnp.tile(geo.pose_identity(dtype), (PB, 1)),
        num_p=jnp.zeros((), jnp.int32),
        Hp=jnp.zeros((6 * PB, 6 * PB), dtype),
        gp0=jnp.zeros((6 * PB,), dtype),
        Hl=jnp.zeros((L, 3, 3), dtype),
        l_ref=jnp.zeros((L, 3), dtype),
        gl0=jnp.zeros((L, 3), dtype),
        c0=jnp.zeros((), dtype),
        Hpl=jnp.zeros((Pl, 3, 3), dtype),
        pl_ref=jnp.tile(jnp.asarray([0.0, 0.0, 1.0, 0.0], dtype), (max(Pl, 1), 1))[:Pl],
        gpl0=jnp.zeros((Pl, 3), dtype),
    )


def _pose_local(x: jax.Array, ref: jax.Array) -> jax.Array:
    """e = log(ref^-1 x), the inverse of pose_retract(ref, e)."""
    return geo.se3_log(geo.pose_mul(geo.pose_inv(ref), x))


def plane_local(x4: jax.Array, ref4: jax.Array) -> jax.Array:
    """Tangent coords of plane x around ref: the exact inverse of
    ``plane_retract(ref, e)`` (for n_ref . n_x > 0): the pre-normalization
    tangent components recover as (u.n_x)/(n_ref.n_x)."""
    from semantic_slam_tpu.frontend.hull import plane_basis

    n_r = ref4[..., :3]
    u, v = plane_basis(n_r)
    n_x = x4[..., :3]
    c = jnp.maximum(jnp.sum(n_r * n_x, axis=-1), 1e-6)
    return jnp.stack(
        [
            jnp.sum(u * n_x, axis=-1) / c,
            jnp.sum(v * n_x, axis=-1) / c,
            x4[..., 3] - ref4[..., 3],
        ],
        axis=-1,
    )


def _plane_prior_terms(prior: MarginalPrior, planes):
    """(chi2, gradient [Pl,3]) of the plane part at ``planes``."""
    e = jax.vmap(plane_local)(planes, prior.pl_ref).astype(prior.Hpl.dtype)
    He = jnp.einsum("pij,pj->pi", prior.Hpl, e)
    chi = 2.0 * jnp.sum(prior.gpl0 * e) + jnp.sum(e * He)
    return chi, prior.gpl0 + He


def _prior_coords(prior: MarginalPrior, poses, landmarks):
    e_p = jax.vmap(_pose_local)(poses[prior.p_idx], prior.p_ref)  # [PB, 6]
    e_l = landmarks - prior.l_ref  # [L, 3]
    return e_p.reshape(-1), e_l


def prior_chi2(prior: MarginalPrior, poses, landmarks) -> jax.Array:
    """The prior factor's value at (poses, landmarks)."""
    ep, el = _prior_coords(prior, poses, landmarks)
    pose_part = 2.0 * jnp.dot(prior.gp0, ep) + ep @ (prior.Hp @ ep)
    Hl_el = jnp.einsum("lij,lj->li", prior.Hl, el)
    lm_part = 2.0 * jnp.sum(prior.gl0 * el) + jnp.sum(el * Hl_el)
    return prior.c0 + pose_part + lm_part


def prior_fold_terms(prior: MarginalPrior, poses, landmarks, dtype):
    """The pieces every prior fold needs, computed once: the prior gradient
    at the current estimate (``gp_add [6PB]``, ``gl_add [L,3]``) and the
    prior chi2. Shared by the dense (Linearization) and matrix-free
    (EdgeBlocks) paths so their math cannot diverge."""
    ep, el = _prior_coords(prior, poses, landmarks)
    gp_add = prior.gp0 + prior.Hp @ ep.astype(dtype)
    gl_add = prior.gl0 + jnp.einsum("lij,lj->li", prior.Hl, el.astype(dtype))
    return gp_add, gl_add, prior_chi2(prior, poses, landmarks)


def prior_pose_diag(prior: MarginalPrior) -> jax.Array:
    """[PB, 6, 6] diagonal blocks of the boundary-pose prior Hessian (what
    block-Jacobi preconditioners consume)."""
    PB = prior.max_poses
    Hp4 = prior.Hp.reshape(PB, 6, PB, 6).transpose(0, 2, 1, 3)
    return Hp4[jnp.arange(PB), jnp.arange(PB)]


def apply_prior(
    lin: Linearization, prior: MarginalPrior, poses, landmarks
) -> Linearization:
    """Add the prior's gradient/Hessian blocks into a dense Linearization."""
    dtype = lin.Hpp.dtype
    gp_add, gl_add, chi_pr = prior_fold_terms(prior, poses, landmarks, dtype)

    r6 = (6 * prior.p_idx[:, None] + jnp.arange(6)[None, :]).reshape(-1)  # [6PB]
    Hpp = lin.Hpp.at[r6[:, None], r6[None, :]].add(prior.Hp)
    gp = lin.gp.at[r6].add(gp_add)

    Hll = lin.Hll + prior.Hl
    gl = lin.gl + gl_add.reshape(-1)

    return Linearization(Hpp, lin.W, Hll, gp, gl, lin.chi2 + chi_pr)


def prior_chi2_planes(prior: MarginalPrior, poses, landmarks, planes) -> jax.Array:
    """Prior value including the plane part (planar-patch mode)."""
    chi_pl, _ = _plane_prior_terms(prior, planes)
    return prior_chi2(prior, poses, landmarks) + chi_pl


def apply_prior_planes(
    lin: Linearization, prior: MarginalPrior, poses, landmarks, planes
) -> Linearization:
    """``apply_prior`` for the plane-extended Linearization layout
    (graph/planes.linearize_with_planes): landmark blocks occupy Hll[:L] /
    gl[:3L], plane blocks the tail."""
    L = landmarks.shape[0]
    dtype = lin.Hpp.dtype
    gp_add, gl_add, chi_pr = prior_fold_terms(prior, poses, landmarks, dtype)

    r6 = (6 * prior.p_idx[:, None] + jnp.arange(6)[None, :]).reshape(-1)
    Hpp = lin.Hpp.at[r6[:, None], r6[None, :]].add(prior.Hp)
    gp = lin.gp.at[r6].add(gp_add)

    chi_pl, gpl = _plane_prior_terms(prior, planes)
    Hll = lin.Hll.at[:L].add(prior.Hl).at[L:].add(prior.Hpl)
    gl = lin.gl + jnp.concatenate([gl_add.reshape(-1), gpl.astype(dtype).reshape(-1)])

    return Linearization(Hpp, lin.W, Hll, gp, gl, lin.chi2 + chi_pr + chi_pl)


@partial(
    jax.jit,
    static_argnames=(
        "max_iterations", "min_edges", "rel_tol", "robust_kind",
        "robust_delta", "with_marginals",
    ),
)
def lm_optimize_prior(
    g: GraphState,
    prior: MarginalPrior,
    max_iterations: int = 64,
    min_edges: int = 10,
    rel_tol: float = 1e-6,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    init_lambda=0.0,
    with_marginals: bool = False,
):
    """Dense Schur LM over the active window + marginal prior
    (``lm_optimize`` with the prior factor folded into every linearization).
    ``with_marginals=True`` also returns landmark marginals from the loop's
    final accepted linearization (prior included — no re-linearization)."""
    pose_free, lm_free = lm_mod._free_masks(g)
    edges = lm_mod._edge_args(g)

    def lin_fn(p, l):
        lin = lm_mod.linearize_arrays(
            p, l, *edges, robust_kind=robust_kind, robust_delta=robust_delta
        )
        return apply_prior(lin, prior, p, l)

    poses, landmarks, stats, lin_f = lm_mod.run_lm_loop(
        g.poses, g.landmarks, lin_fn, pose_free, lm_free,
        max_iterations, rel_tol, init_lambda=init_lambda,
    )
    run = g.num_edges() >= min_edges
    g = g._replace(
        poses=jnp.where(run, poses, g.poses),
        landmarks=jnp.where(run, landmarks, g.landmarks),
    )
    stats = LMStats(
        iterations=jnp.where(run, stats.iterations, 0),
        chi2_initial=stats.chi2_initial,
        chi2_final=jnp.where(run, stats.chi2_final, stats.chi2_initial),
        lambda_final=stats.lambda_final,
    )
    if with_marginals:
        marg = lm_mod.marginals_from_lin(lin_f, pose_free, lm_free)
        return g, stats, marg
    return g, stats


@jax.jit
def landmark_marginals_prior(g: GraphState, prior: MarginalPrior) -> jax.Array:
    """``landmark_marginals`` with the prior information included (the
    Mahalanobis gate consumes these in fixed-lag mode). Standalone/on-demand
    variant; the hot tick reuses the LM loop's final linearization via
    ``lm_optimize_prior(with_marginals=True)``."""
    pose_free, lm_free = lm_mod._free_masks(g)
    lin = apply_prior(lm_mod.linearize(g), prior, g.poses, g.landmarks)
    return lm_mod.marginals_from_lin(lin, pose_free, lm_free)


# ---------------------------------------------------------------------------
# Marginalization + compaction
# ---------------------------------------------------------------------------


def _quad_min_dense(H: jax.Array, g: jax.Array, dtype) -> jax.Array:
    """min over e of  2 g.e + e^T H e  =  -g^T H^+ g  for PSD H (masked
    slots carry g=0). Zero diagonal blocks get identity so the solve is
    well-posed; a tiny ridge guards near-singular directions."""
    n = H.shape[0]
    d = jnp.diagonal(H)
    fix = (jnp.abs(d) < 1e-10).astype(dtype)
    Hr = H + jnp.diag(fix) + 1e-8 * jnp.maximum(jnp.max(d), 1.0) * jnp.eye(
        n, dtype=dtype
    )
    c, low = jax.scipy.linalg.cho_factor(Hr)
    return -jnp.dot(g, jax.scipy.linalg.cho_solve((c, low), g))


def _quad_min33(H: jax.Array, g: jax.Array) -> jax.Array:
    """_quad_min_dense for one 3x3 block (vmapped over landmarks/planes)."""
    dtype = H.dtype
    d = jnp.diagonal(H)
    fix = (jnp.abs(d) < 1e-10).astype(dtype)
    Hr = H + jnp.diag(fix) + 1e-8 * jnp.maximum(jnp.max(d), 1.0) * jnp.eye(
        3, dtype=dtype
    )
    return -jnp.dot(g, jnp.linalg.solve(Hr, g))


def _stable_partition(keep: jax.Array) -> jax.Array:
    """Permutation putting kept slots first, original order preserved."""
    n = keep.shape[0]
    idx = jnp.arange(n)
    keys = jnp.where(keep, idx, n + idx)
    return jnp.argsort(keys)


def _marginalize_impl(
    g: GraphState, prior: MarginalPrior, drop: int, pn=None
):
    """Marginalize the oldest ``drop`` keyframes; compact the graph.

    Returns ``(graph', prior', num_boundary)``. ``num_boundary`` is the
    number of boundary poses the new prior needed; the caller must verify
    ``num_boundary <= prior.max_poses`` (host-side; overflow would silently
    truncate — with chain odometry the boundary is 1-2 poses, so the default
    capacity of 8 is generous).

    The caller guarantees ``drop < num_poses``. All dropped poses' odometry
    edges (and the old prior's pose part, re-linearized at the current
    estimates) are Schur-eliminated into a dense boundary-pose prior; dropped
    poses' observation edges become anchored unary landmark priors; edge
    arrays are compacted in place (capacities unchanged — one compile per
    bucket, reused every marginalization).
    """
    K = g.poses.shape[0]
    L = g.landmarks.shape[0]
    PB = prior.max_poses
    dtype = g.poses.dtype
    poses, landmarks = g.poses, g.landmarks

    # ---- edge partitions -------------------------------------------------
    act_o = g.odom_mask()
    act_e = g.lme_mask()
    drop_o = act_o & ((g.odom_i < drop) | (g.odom_j < drop))
    drop_e = act_e & (g.lme_k < drop)

    # ---- anchored landmark priors from dropped observation edges ---------
    sel_e = drop_e.astype(dtype)
    e_info = g.lme_info * sel_e[:, None, None]
    r_l, Jp, Jl = jax.vmap(res.se3_point_residual_jac)(
        poses[g.lme_k], landmarks[g.lme_l], g.lme_meas
    )
    JlT_O = jnp.einsum("eai,eab->eib", Jl, e_info)
    Hl_add = jnp.zeros((L, 3, 3), dtype).at[g.lme_l].add(
        jnp.einsum("eia,eaj->eij", JlT_O, Jl)
    )
    gl_add = jnp.zeros((L, 3), dtype).at[g.lme_l].add(
        jnp.einsum("eia,ea->ei", JlT_O, r_l)
    )
    c_anchor = jnp.einsum("ea,eab,eb->", r_l, e_info, r_l)

    # ---- planar-patch mode: anchored plane priors + pose-side blocks -----
    if pn is not None:
        pe_drop = pn.pe_mask() & (pn.pe_k < drop)
        sel_p = pe_drop.astype(dtype)
        p_info = pn.pe_info * sel_p[:, None, None]
        from semantic_slam_tpu.graph.planes import _plane_edge_jac

        r_pe, Jk_pe, Jpl_pe = jax.vmap(_plane_edge_jac)(
            poses[pn.pe_k], pn.planes[pn.pe_p], pn.pe_meas
        )
        JplT_O = jnp.einsum("eai,eab->eib", Jpl_pe, p_info)
        Hpl_add = jnp.zeros_like(prior.Hpl).at[pn.pe_p].add(
            jnp.einsum("eia,eaj->eij", JplT_O, Jpl_pe)
        )
        gpl_add = jnp.zeros_like(prior.gpl0).at[pn.pe_p].add(
            jnp.einsum("eia,ea->ei", JplT_O, r_pe)
        )
        c_anchor_pl = jnp.einsum("ea,eab,eb->", r_pe, p_info, r_pe)
        # re-center the old plane part to the current plane estimates
        d_pl = jax.vmap(plane_local)(pn.planes, prior.pl_ref).astype(dtype)
        Hpl_dpl = jnp.einsum("pij,pj->pi", prior.Hpl, d_pl)
        plchi = 2.0 * jnp.sum(prior.gpl0 * d_pl) + jnp.sum(d_pl * Hpl_dpl)
        gpl0_new = prior.gpl0 + Hpl_dpl + gpl_add
        Hpl_new = prior.Hpl + Hpl_add
    else:
        c_anchor_pl = jnp.zeros((), dtype)
        plchi = jnp.zeros((), dtype)
        gpl0_new = prior.gpl0
        Hpl_new = prior.Hpl

    # ---- re-center the old prior's landmark part to current estimates ----
    d_l = (landmarks - prior.l_ref).astype(dtype)
    Hl_dl = jnp.einsum("lij,lj->li", prior.Hl, d_l)
    lchi = 2.0 * jnp.sum(prior.gl0 * d_l) + jnp.sum(d_l * Hl_dl)
    gl0_new = prior.gl0 + Hl_dl + gl_add
    Hl_new = prior.Hl + Hl_add

    # ---- dense pose-chain system from dropped odometry edges -------------
    sel_o = drop_o.astype(dtype)
    o_info = g.odom_info * sel_o[:, None, None]
    r_o, Ji, Jj = jax.vmap(res.se3_edge_residual_jac)(
        poses[g.odom_i], poses[g.odom_j], g.odom_meas
    )
    JiT_O = jnp.einsum("eai,eab->eib", Ji, o_info)
    JjT_O = jnp.einsum("eai,eab->eib", Jj, o_info)
    Hf = jnp.zeros((K, K, 6, 6), dtype)
    Hf = Hf.at[g.odom_i, g.odom_i].add(jnp.einsum("eia,eaj->eij", JiT_O, Ji))
    Hf = Hf.at[g.odom_i, g.odom_j].add(jnp.einsum("eia,eaj->eij", JiT_O, Jj))
    Hf = Hf.at[g.odom_j, g.odom_i].add(
        jnp.swapaxes(jnp.einsum("eia,eaj->eij", JiT_O, Jj), -1, -2)
    )
    Hf = Hf.at[g.odom_j, g.odom_j].add(jnp.einsum("eia,eaj->eij", JjT_O, Jj))
    gf = jnp.zeros((K, 6), dtype)
    gf = gf.at[g.odom_i].add(jnp.einsum("eia,ea->ei", JiT_O, r_o))
    gf = gf.at[g.odom_j].add(jnp.einsum("eia,ea->ei", JjT_O, r_o))
    c_odom = jnp.einsum("ea,eab,eb->", r_o, o_info, r_o)

    # pose-side blocks of the dropped observation edges (cross term to the
    # landmark dropped — see module docstring): without these the eliminated
    # gradient is non-stationary even at a converged estimate
    JpT_O = jnp.einsum("eai,eab->eib", Jp, e_info)
    Hf = Hf.at[g.lme_k, g.lme_k].add(jnp.einsum("eia,eaj->eij", JpT_O, Jp))
    gf = gf.at[g.lme_k].add(jnp.einsum("eia,ea->ei", JpT_O, r_l))
    if pn is not None:
        # pose-side blocks of dropped SE3-plane edges (cross to plane dropped)
        JkT_O = jnp.einsum("eai,eab->eib", Jk_pe, p_info)
        Hf = Hf.at[pn.pe_k, pn.pe_k].add(jnp.einsum("eia,eaj->eij", JkT_O, Jk_pe))
        gf = gf.at[pn.pe_k].add(jnp.einsum("eia,ea->ei", JkT_O, r_pe))

    # fold the old prior's pose part, linearized at the current poses
    ep_old = jax.vmap(_pose_local)(poses[prior.p_idx], prior.p_ref).reshape(-1)
    ep_old = ep_old.astype(dtype)
    pchi = 2.0 * jnp.dot(prior.gp0, ep_old) + ep_old @ (prior.Hp @ ep_old)
    gp_fold = (prior.gp0 + prior.Hp @ ep_old).reshape(PB, 6)
    Hp_fold = (
        prior.Hp.reshape(PB, 6, PB, 6).transpose(0, 2, 1, 3)
    )  # [PB, PB, 6, 6]
    Hf = Hf.at[prior.p_idx[:, None], prior.p_idx[None, :]].add(Hp_fold)
    gf = gf.at[prior.p_idx].add(gp_fold)

    # gauge: pose 0 is fixed — it is a constant, not a variable
    free = (jnp.arange(K) != 0).astype(dtype)
    Hf = Hf * free[:, None, None, None] * free[None, :, None, None]
    gf = gf * free[:, None]

    # ---- boundary selection ----------------------------------------------
    inv = jnp.zeros((K,), bool)
    inv = inv.at[g.odom_i].max(drop_o & (g.odom_i >= drop))
    inv = inv.at[g.odom_j].max(drop_o & (g.odom_j >= drop))
    inv = inv.at[prior.p_idx].max(
        (jnp.arange(PB) < prior.num_p) & (prior.p_idx >= drop)
    )
    num_b = jnp.sum(inv.astype(jnp.int32))
    order = jnp.argsort(jnp.where(inv, jnp.arange(K), K + jnp.arange(K)))
    b_idx = order[:PB]  # involved poses first, ascending index
    b_act = (jnp.arange(PB) < jnp.minimum(num_b, PB)).astype(dtype)

    # ---- Schur-eliminate the dropped poses -------------------------------
    def blocks_to_mat(B4):  # [m, n, 6, 6] -> [6m, 6n]
        m, n = B4.shape[0], B4.shape[1]
        return B4.transpose(0, 2, 1, 3).reshape(6 * m, 6 * n)

    H_MM = blocks_to_mat(Hf[:drop, :drop])
    H_MB = blocks_to_mat(Hf[:drop][:, b_idx])
    H_BB = blocks_to_mat(Hf[b_idx][:, b_idx])
    g_M = gf[:drop].reshape(-1)
    g_B = gf[b_idx].reshape(-1)

    # regularize: identity on empty diagonal blocks (pose 0 / disconnected),
    # tiny ridge elsewhere
    dvec = jnp.diagonal(H_MM)
    bnorm = jnp.sum(jnp.abs(dvec.reshape(drop, 6)), axis=1)
    fix = (bnorm < 1e-8).astype(dtype)
    H_MM = H_MM + jnp.diag(jnp.repeat(fix, 6))
    ridge = 1e-6 * jnp.maximum(jnp.max(dvec), 1.0)
    H_MM = H_MM + ridge * jnp.eye(6 * drop, dtype=dtype)

    c, low = jax.scipy.linalg.cho_factor(H_MM)
    X = jax.scipy.linalg.cho_solve((c, low), jnp.concatenate([H_MB, g_M[:, None]], axis=1))
    Hinv_HMB, Hinv_gM = X[:, :-1], X[:, -1]
    Hp_new = H_BB - H_MB.T @ Hinv_HMB
    gp_new = g_B - H_MB.T @ Hinv_gM
    c_pose = c_odom + prior.c0 + pchi - jnp.dot(g_M, Hinv_gM)

    bmask6 = jnp.repeat(b_act, 6)
    Hp_new = Hp_new * (bmask6[:, None] * bmask6[None, :])
    gp_new = gp_new * bmask6
    # symmetrize (cho_solve round-off)
    Hp_new = 0.5 * (Hp_new + Hp_new.T)

    c0_new = c_pose + lchi + c_anchor + plchi + c_anchor_pl
    # Non-negativity lift: the exact Schur constant is >= 0 for an exact
    # quadratic, but the cross-term sparsification (module docstring) and the
    # nonlinear SE(3)/plane re-centering make the carried quadratic's minimum
    # dip below zero — which then prints a negative total chi2 in health
    # output and defeats any chi2 >= 0 plausibility assert. The prior's
    # pose/landmark/plane parts are separable, so the minimum is cheap to
    # evaluate once here; lifting c0 by its negative part shifts every
    # chi2 report by a constant (LM gain ratios difference it away) and
    # guarantees chi2_prior >= 0 everywhere.
    qmin = (
        c0_new
        + _quad_min_dense(Hp_new, gp_new, dtype)
        + jnp.sum(jax.vmap(_quad_min33)(Hl_new, gl0_new))
        + (
            jnp.sum(jax.vmap(_quad_min33)(Hpl_new, gpl0_new))
            if Hpl_new.shape[0] > 0
            else jnp.zeros((), dtype)
        )
    )
    # the margin is relative: f32 cancellation in qmin scales with its size
    c0_new = c0_new - jnp.minimum(qmin, 0.0) + 1e-5 * (1.0 + jnp.abs(qmin))

    prior_new = MarginalPrior(
        p_idx=jnp.where(b_act.astype(bool), b_idx - drop, 0).astype(jnp.int32),
        p_ref=jnp.where(
            b_act[:, None].astype(bool),
            poses[b_idx],
            jnp.tile(geo.pose_identity(dtype), (PB, 1)),
        ),
        num_p=jnp.minimum(num_b, PB),
        Hp=Hp_new,
        gp0=gp_new,
        Hl=Hl_new,
        l_ref=landmarks,
        gl0=gl0_new,
        c0=c0_new,
        Hpl=Hpl_new,
        pl_ref=pn.planes if pn is not None else prior.pl_ref,
        gpl0=gpl0_new,
    )

    # ---- compaction ------------------------------------------------------
    ident = jnp.tile(geo.pose_identity(dtype), (drop, 1))
    poses2 = jnp.concatenate([poses[drop:], ident], axis=0)

    keep_o = act_o & ~drop_o
    po = _stable_partition(keep_o)
    sub = lambda a: jnp.clip(a - drop, 0, K - 1)
    g2 = g._replace(
        poses=poses2,
        num_poses=g.num_poses - drop,
        odom_i=sub(g.odom_i[po]),
        odom_j=sub(g.odom_j[po]),
        odom_meas=g.odom_meas[po],
        odom_info=g.odom_info[po],
        num_odom=jnp.sum(keep_o.astype(jnp.int32)),
    )
    keep_e = act_e & ~drop_e
    pe = _stable_partition(keep_e)
    g2 = g2._replace(
        lme_k=sub(g.lme_k[pe]),
        lme_l=g.lme_l[pe],
        lme_meas=g.lme_meas[pe],
        lme_info=g.lme_info[pe],
        num_lme=jnp.sum(keep_e.astype(jnp.int32)),
    )
    if pn is None:
        return g2, prior_new, num_b
    keep_pe = pn.pe_mask() & ~pe_drop
    pp = _stable_partition(keep_pe)
    pn2 = pn._replace(
        pe_k=sub(pn.pe_k[pp]),
        pe_p=pn.pe_p[pp],
        pe_meas=pn.pe_meas[pp],
        pe_info=pn.pe_info[pp],
        num_pe=jnp.sum(keep_pe.astype(jnp.int32)),
    )
    return g2, pn2, prior_new, num_b


@partial(jax.jit, static_argnames=("drop",))
def marginalize(
    g: GraphState, prior: MarginalPrior, drop: int
) -> tuple[GraphState, MarginalPrior, jax.Array]:
    return _marginalize_impl(g, prior, drop, pn=None)


@partial(jax.jit, static_argnames=("drop",))
def marginalize_planes(g: GraphState, pn, prior: MarginalPrior, drop: int):
    """Planar-patch-mode marginalization: additionally converts dropped
    SE3-plane edges into anchored plane-tangent priors (their pose-side
    blocks join the pose marginalization; the pose-plane cross term is
    sparsified like the point case) and compacts the plane edge arrays.
    Returns ``(graph', planes', prior', num_boundary)``."""
    return _marginalize_impl(g, prior, drop, pn=pn)
