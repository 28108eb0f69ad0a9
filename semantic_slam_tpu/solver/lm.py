"""Batched Levenberg-Marquardt with Schur-complement landmark elimination.

The TPU replacement for g2o's ``"lm_var"`` optimizer
(``/root/reference/src/ps_graph_slam/graph_slam.cpp:67-73,182-219``): instead
of a sparse CHOLMOD factorization on CPU, every LM iteration

  1. linearizes all edges in parallel (vmap; batched 6x6/3x6 GEMMs),
  2. scatter-accumulates the block Hessian: dense pose block ``Hpp [6K,6K]``,
     pose-landmark coupling ``W [6K,3L]``, block-diagonal landmark Hessian
     ``Hll [L,3,3]``,
  3. Schur-eliminates landmarks (batched closed-form 3x3 inverses; one big
     ``[6K,3L]x[3L,6K]`` MXU matmul),
  4. solves the reduced camera system with dense Cholesky on the MXU,
  5. back-substitutes landmarks and retracts on-manifold.

Damping follows the Nielsen/Marquardt gain-ratio schedule g2o's LM uses.
The landmark marginal covariances that the reference pulls out of g2o for
Mahalanobis gating (``semantic_graph_slam.cpp:181-205``) come from the same
Schur factors — see ``landmark_marginals``.

The LM loop itself (``run_lm_loop``) only touches node variables and is
parameterized over the linearize/chi2 callables, so the multi-chip path
(``semantic_slam_tpu.parallel.sharded``) reuses it verbatim with edge-sharded
assembly + psum inside shard_map.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from semantic_slam_tpu.core import geometry as geo
from semantic_slam_tpu.graph import residuals as res
from semantic_slam_tpu.graph.state import GraphState
from semantic_slam_tpu.solver.robust import robust_rho, robust_weight


class Linearization(NamedTuple):
    Hpp: jax.Array  # [6K, 6K]
    W: jax.Array  # [6K, 3L]
    Hll: jax.Array  # [L, 3, 3]
    gp: jax.Array  # [6K]   (J^T Omega r, pose part)
    gl: jax.Array  # [3L]
    chi2: jax.Array  # scalar


class LMStats(NamedTuple):
    iterations: jax.Array
    chi2_initial: jax.Array
    chi2_final: jax.Array
    lambda_final: jax.Array


def inv33(A: jax.Array) -> jax.Array:
    """Batched closed-form 3x3 inverse (adjugate/det) — cheaper than LU."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g_, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g_ - d * i
    A22 = a * i - c * g_
    A23 = c * d - a * f
    A31 = d * h - e * g_
    A32 = b * g_ - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    adj = jnp.stack(
        [
            jnp.stack([A11, A12, A13], axis=-1),
            jnp.stack([A21, A22, A23], axis=-1),
            jnp.stack([A31, A32, A33], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def inv66(M: jax.Array) -> jax.Array:
    """Batched closed-form 6x6 inverse via 2x2-of-3x3 block Schur.

    ``jnp.linalg.inv`` on a [K,6,6] batch lowers to per-matrix LU
    custom-calls on TPU — measured at ~half the K=4096 PCG solve's device
    time. This composes two analytic 3x3 inverses with batched matmuls
    (pure fusable XLA), needing only the leading 3x3 block and its Schur
    complement to be invertible — true for the damped SPD Hessian diagonals
    and the diagonally-dominant PCR elimination blocks this serves.
    """
    A = M[..., :3, :3]
    B = M[..., :3, 3:]
    C = M[..., 3:, :3]
    D = M[..., 3:, 3:]
    Ai = inv33(A)
    CAi = C @ Ai
    S = D - CAi @ B
    Si = inv33(S)
    AiB = Ai @ B
    TL = Ai + AiB @ Si @ CAi
    TR = -(AiB @ Si)
    BL = -(Si @ CAi)
    top = jnp.concatenate([TL, TR], axis=-1)
    bot = jnp.concatenate([BL, Si], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def linearize_arrays(
    poses: jax.Array,  # [K, 7]
    landmarks: jax.Array,  # [L, 3]
    odom_i: jax.Array,
    odom_j: jax.Array,
    odom_meas: jax.Array,
    odom_info: jax.Array,
    odom_mask: jax.Array,  # [E1] bool
    lme_k: jax.Array,
    lme_l: jax.Array,
    lme_meas: jax.Array,
    lme_info: jax.Array,
    lme_mask: jax.Array,  # [E2] bool
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    assembly: str = "auto",
) -> Linearization:
    """Edge-parallel linearization + block accumulation.

    Edge arrays may be any (sharded) slice of the graph; masked-out entries
    contribute exactly zero, so summing Linearizations across shards (psum)
    reconstructs the global system.

    ``assembly``: 'scatter' accumulates blocks with ``at[].add`` (fast on
    CPU); 'matmul' assembles via one-hot segment-sum matmuls on the MXU
    (solver/assembly.py — TPU scatters serialize per index and dominate the
    iteration otherwise); 'auto' picks per backend. Results are equal up to
    f32 summation order.
    """
    from semantic_slam_tpu.solver import assembly as asm

    K = poses.shape[0]
    L = landmarks.shape[0]
    dtype = poses.dtype
    use_mm = asm.resolve_assembly(assembly) == "matmul"

    # --- SE3-SE3 odometry edges ------------------------------------------
    om = odom_mask.astype(dtype)
    o_info = odom_info * om[:, None, None]
    r_o, Ji, Jj = jax.vmap(res.se3_edge_residual_jac)(
        poses[odom_i], poses[odom_j], odom_meas
    )
    JiT_O = jnp.einsum("eai,eab->eib", Ji, o_info)  # [E,6,6] = Ji^T Omega
    JjT_O = jnp.einsum("eai,eab->eib", Jj, o_info)
    H_ii = jnp.einsum("eia,eaj->eij", JiT_O, Ji)
    H_ij = jnp.einsum("eia,eaj->eij", JiT_O, Jj)
    H_jj = jnp.einsum("eia,eaj->eij", JjT_O, Jj)
    g_i = jnp.einsum("eia,ea->ei", JiT_O, r_o)
    g_j = jnp.einsum("eia,ea->ei", JjT_O, r_o)
    chi_o = jnp.einsum("ea,eab,eb->", r_o, o_info, r_o)

    if use_mm:
        # [K,6,K,6] block grid; off-diagonal via one-hot cross matmuls,
        # diagonal via segment-sum + eye embed (includes H_kk below)
        Hpp4_off = asm.cross_block_mm(odom_i, odom_j, H_ij, K, K)
        Hpp4_off = Hpp4_off + jnp.transpose(Hpp4_off, (2, 3, 0, 1))
        Dpp = asm.segment_sum_mm(odom_i, H_ii, K) + asm.segment_sum_mm(
            odom_j, H_jj, K
        )
        gp = asm.segment_sum_mm(odom_i, g_i, K) + asm.segment_sum_mm(
            odom_j, g_j, K
        )
    else:
        Hpp = jnp.zeros((K, K, 6, 6), dtype)
        Hpp = Hpp.at[odom_i, odom_i].add(H_ii)
        Hpp = Hpp.at[odom_i, odom_j].add(H_ij)
        Hpp = Hpp.at[odom_j, odom_i].add(jnp.swapaxes(H_ij, -1, -2))
        Hpp = Hpp.at[odom_j, odom_j].add(H_jj)
        gp = jnp.zeros((K, 6), dtype)
        gp = gp.at[odom_i].add(g_i)
        gp = gp.at[odom_j].add(g_j)

    # --- SE3-point landmark edges ----------------------------------------
    lmm = lme_mask.astype(dtype)
    l_info = lme_info * lmm[:, None, None]
    r_l, Jp, Jl = jax.vmap(res.se3_point_residual_jac)(
        poses[lme_k], landmarks[lme_l], lme_meas
    )
    chi_e = jnp.einsum("ea,eab,eb->e", r_l, l_info, r_l)
    # the reported objective must match chi2_arrays (robustified), while the
    # gradient/Hessian use IRLS reweighted information
    chi_l = jnp.sum(robust_rho(chi_e, robust_kind, robust_delta))
    if robust_kind != "none":
        # real DCS/Huber reweighting on observation edges — the reference
        # wires an UNINITIALIZED RobustKernelDCS here (PARITY quirk 1)
        w = robust_weight(chi_e, robust_kind, robust_delta).astype(dtype)
        l_info = l_info * w[:, None, None]
    JpT_O = jnp.einsum("eai,eab->eib", Jp, l_info)  # [E,6,3]
    JlT_O = jnp.einsum("eai,eab->eib", Jl, l_info)  # [E,3,3]
    H_kk = jnp.einsum("eia,eaj->eij", JpT_O, Jp)
    W_kl = jnp.einsum("eia,eaj->eij", JpT_O, Jl)
    H_ll = jnp.einsum("eia,eaj->eij", JlT_O, Jl)
    g_k = jnp.einsum("eia,ea->ei", JpT_O, r_l)
    g_l = jnp.einsum("eia,ea->ei", JlT_O, r_l)

    if use_mm:
        Dpp = Dpp + asm.segment_sum_mm(lme_k, H_kk, K)
        gp = gp + asm.segment_sum_mm(lme_k, g_k, K)
        Hpp2 = (Hpp4_off + asm.diag_embed_blocks(Dpp)).reshape(6 * K, 6 * K)
        W2 = asm.cross_block_mm(lme_k, lme_l, W_kl, K, L).reshape(6 * K, 3 * L)
        Hll = asm.segment_sum_mm(lme_l, H_ll, L)
        gl = asm.segment_sum_mm(lme_l, g_l, L)
    else:
        Hpp = Hpp.at[lme_k, lme_k].add(H_kk)
        gp = gp.at[lme_k].add(g_k)
        W = jnp.zeros((K, L, 6, 3), dtype)
        W = W.at[lme_k, lme_l].add(W_kl)
        Hll = jnp.zeros((L, 3, 3), dtype)
        Hll = Hll.at[lme_l].add(H_ll)
        gl = jnp.zeros((L, 3), dtype)
        gl = gl.at[lme_l].add(g_l)

        Hpp2 = jnp.transpose(Hpp, (0, 2, 1, 3)).reshape(6 * K, 6 * K)
        W2 = jnp.transpose(W, (0, 2, 1, 3)).reshape(6 * K, 3 * L)
    return Linearization(Hpp2, W2, Hll, gp.reshape(-1), gl.reshape(-1), chi_o + chi_l)


def chi2_arrays(
    poses,
    landmarks,
    odom_i,
    odom_j,
    odom_meas,
    odom_info,
    odom_mask,
    lme_k,
    lme_l,
    lme_meas,
    lme_info,
    lme_mask,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
) -> jax.Array:
    r_o = jax.vmap(res.se3_edge_residual)(poses[odom_i], poses[odom_j], odom_meas)
    chi_o = jnp.einsum("ei,eij,ej->e", r_o, odom_info, r_o)
    r_l = jax.vmap(res.se3_point_residual)(poses[lme_k], landmarks[lme_l], lme_meas)
    chi_l = jnp.einsum("ei,eij,ej->e", r_l, lme_info, r_l)
    chi_l = robust_rho(chi_l, robust_kind, robust_delta)
    return jnp.sum(chi_o * odom_mask.astype(poses.dtype)) + jnp.sum(
        chi_l * lme_mask.astype(poses.dtype)
    )


def _edge_args(g: GraphState):
    return (
        g.odom_i,
        g.odom_j,
        g.odom_meas,
        g.odom_info,
        g.odom_mask(),
        g.lme_k,
        g.lme_l,
        g.lme_meas,
        g.lme_info,
        g.lme_mask(),
    )


def linearize(g: GraphState) -> Linearization:
    return linearize_arrays(g.poses, g.landmarks, *_edge_args(g))


def _free_masks_arrays(num_poses, K, num_landmarks, L):
    pidx = jnp.arange(K)
    pose_free = (pidx < num_poses) & (pidx > 0)
    lm_free = jnp.arange(L) < num_landmarks
    return pose_free, lm_free


def _free_masks(g: GraphState):
    """Pose 0 is gauge-fixed (graph_slam.cpp:108); inactive slots frozen."""
    return _free_masks_arrays(
        g.num_poses, g.poses.shape[0], g.num_landmarks, g.landmarks.shape[0]
    )


def schur_solve(
    lin: Linearization,
    pose_free: jax.Array,
    lm_free: jax.Array,
    lam: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Solve the damped normal equations via landmark Schur elimination.

    Returns (delta_pose [K,6], delta_lm [L,3]) solving
      [Hpp+lam*I   W    ] [dp]   [-gp]
      [W^T    Hll+lam*I ] [dl] = [-gl]
    with fixed/inactive parameters pinned to zero update.
    """
    K6 = lin.Hpp.shape[0]
    L = lin.Hll.shape[0]
    dtype = lin.Hpp.dtype

    pm = jnp.repeat(pose_free.astype(dtype), 6)  # [6K]
    lmm = lm_free.astype(dtype)  # [L]

    eye3 = jnp.eye(3, dtype=dtype)
    A = lin.Hll + lam * eye3[None]
    A = A * lmm[:, None, None] + eye3[None] * (1.0 - lmm)[:, None, None]
    Ainv = inv33(A)
    gl = (lin.gl.reshape(L, 3) * lmm[:, None]).reshape(-1)

    W = lin.W * pm[:, None]
    W = (W.reshape(K6, L, 3) * lmm[None, :, None]).reshape(K6, 3 * L)

    WA = jnp.einsum("kld,lde->kle", W.reshape(K6, L, 3), Ainv).reshape(K6, 3 * L)
    Hred = lin.Hpp + lam * jnp.eye(K6, dtype=dtype) - WA @ W.T
    Hred = Hred * (pm[:, None] * pm[None, :]) + jnp.diag(1.0 - pm)
    gp = lin.gp * pm
    b_red = -(gp - WA @ gl)

    c, low = jax.scipy.linalg.cho_factor(Hred)
    dp = jax.scipy.linalg.cho_solve((c, low), b_red)

    rhs_l = (-gl - W.T @ dp).reshape(L, 3)
    dl = jnp.einsum("lde,le->ld", Ainv, rhs_l) * lmm[:, None]
    return dp.reshape(-1, 6), dl


def retract(poses: jax.Array, landmarks: jax.Array, dp: jax.Array, dl: jax.Array):
    return (
        jax.vmap(geo.pose_retract)(poses, dp.astype(poses.dtype)),
        landmarks + dl.astype(landmarks.dtype),
    )


def run_lm_loop(
    poses: jax.Array,
    landmarks: jax.Array,
    linearize_fn: Callable[[jax.Array, jax.Array], Linearization],
    pose_free: jax.Array,
    lm_free: jax.Array,
    max_iterations: int,
    rel_tol: float,
    init_lambda_tau: float = 1e-5,
    init_lambda=0.0,
):
    """The damped LM iteration over node variables only (edges are fixed
    during optimization, so they live inside the linearize closure — locally
    or sharded+psum'd).

    Each iteration relinearizes SPECULATIVELY at the trial point: the new
    linearization's ``chi2`` is the trial objective, so an accepted step pays
    one linearize total (instead of a residual-only pass plus a second full
    relinearization at the same point), and the carried linearization always
    matches the carried estimate — its chi2 doubles as the final statistic.
    A rejected step wastes the trial Jacobians and retries the carried linear
    system with a larger lambda (what g2o's LM does); with gain-ratio damping
    and warm-started lambda, rejections are rare, so the trade wins.

    ``init_lambda > 0`` (traced) overrides the tau*diag heuristic — the
    warm-start hook: feeding back the previous tick's final lambda skips the
    damping search a fresh solve would repeat.
    """
    lin0 = linearize_fn(poses, landmarks)
    chi2_0 = lin0.chi2
    dtype = poses.dtype

    diag_max = jnp.maximum(
        jnp.max(jnp.abs(jnp.diagonal(lin0.Hpp))),
        jnp.max(jnp.abs(jnp.diagonal(lin0.Hll, axis1=-2, axis2=-1))),
    )
    init_lambda = jnp.asarray(init_lambda, dtype)
    lam0 = jnp.where(
        init_lambda > 0,
        init_lambda,
        init_lambda_tau * jnp.maximum(diag_max, 1.0),
    ).astype(dtype)

    def cond(carry):
        _, _, _, _, _, it, done = carry
        return (it < max_iterations) & jnp.logical_not(done)

    def body(carry):
        p, l, lin, lam, nu, it, done = carry
        dp, dl = schur_solve(lin, pose_free, lm_free, lam)
        p_new, l_new = retract(p, l, dp, dl)
        lin_new = linearize_fn(p_new, l_new)
        chi2_new = lin_new.chi2

        delta = jnp.concatenate([dp.reshape(-1), dl.reshape(-1)])
        gvec = jnp.concatenate([lin.gp, lin.gl])
        pred = lam * jnp.dot(delta, delta) - jnp.dot(delta, gvec)
        rho = (lin.chi2 - chi2_new) / jnp.maximum(pred, 1e-12)

        finite = jnp.isfinite(chi2_new) & jnp.all(jnp.isfinite(delta))
        accept = (rho > 0) & finite

        p = jnp.where(accept, p_new, p)
        l = jnp.where(accept, l_new, l)
        lam_acc = lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam = jnp.where(accept, lam_acc, lam * nu)
        nu = jnp.where(accept, 2.0, nu * 2.0)

        converged = accept & (
            (lin.chi2 - chi2_new) <= rel_tol * jnp.maximum(lin.chi2, 1e-12)
        )
        done = converged | (lam > 1e12)
        lin = jax.tree.map(lambda a, b: jnp.where(accept, a, b), lin_new, lin)
        return p, l, lin, lam, nu, it + 1, done

    init = (
        poses,
        landmarks,
        lin0,
        lam0,
        jnp.asarray(2.0, dtype),
        jnp.zeros((), jnp.int32),
        jnp.zeros((), bool),
    )
    p, l, lin_f, lam, _, it, _ = jax.lax.while_loop(cond, body, init)
    # lin_f always matches the carried (p, l): both are where(accept, ...)'d
    # in lockstep, so callers can reuse it (e.g. marginal recovery) without
    # paying a second linearization
    return p, l, LMStats(it, chi2_0, lin_f.chi2, lam), lin_f


@partial(
    jax.jit,
    static_argnames=(
        "max_iterations", "min_edges", "rel_tol", "robust_kind",
        "robust_delta", "with_marginals",
    ),
)
def lm_optimize(
    g: GraphState,
    max_iterations: int = 64,
    min_edges: int = 10,
    rel_tol: float = 1e-6,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    init_lambda=0.0,
    with_marginals: bool = False,
):
    """Full-batch LM over the active graph (g2o GraphSLAM::optimize analog).

    Skips entirely when fewer than ``min_edges`` edges exist
    (graph_slam.cpp:184-186). ``init_lambda > 0`` warm-starts the damping.

    ``with_marginals=True`` additionally returns the landmark marginal 3x3
    blocks computed from the loop's FINAL accepted linearization — the same
    Schur factors, no re-linearization (the reference reads marginals from
    the optimizer's own Hessian, graph_slam.cpp:221-234, which includes any
    robust reweighting — so does this).
    """
    pose_free, lm_free = _free_masks(g)
    edges = _edge_args(g)

    def lin_fn(p, l):
        return linearize_arrays(p, l, *edges, robust_kind=robust_kind, robust_delta=robust_delta)

    poses, landmarks, stats, lin_f = run_lm_loop(
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
        marg = marginals_from_lin(lin_f, pose_free, lm_free)
        return g, stats, marg
    return g, stats


def marginals_from_lin(
    lin: Linearization, pose_free: jax.Array, lm_free: jax.Array
) -> jax.Array:
    """Landmark marginal 3x3 blocks from an existing linearization.

    For H = [[Hpp, W], [W^T, Hll]],
      Sigma_ll = Hll^-1 + Hll^-1 W^T Hred^-1 W Hll^-1,
    returning only the [3,3] diagonal blocks (what Mahalanobis gating
    consumes, data_association.h:167-186). Inactive slots get identity.
    """
    K6 = lin.Hpp.shape[0]
    L = lin.Hll.shape[0]
    dtype = lin.Hpp.dtype

    pm = jnp.repeat(pose_free.astype(dtype), 6)
    lmm = lm_free.astype(dtype)
    eye3 = jnp.eye(3, dtype=dtype)

    A = lin.Hll * lmm[:, None, None] + eye3[None] * (1.0 - lmm)[:, None, None]
    Ainv = inv33(A + 1e-8 * eye3[None])

    W = lin.W * pm[:, None]
    W = (W.reshape(K6, L, 3) * lmm[None, :, None]).reshape(K6, 3 * L)
    WA = jnp.einsum("kld,lde->kle", W.reshape(K6, L, 3), Ainv).reshape(K6, 3 * L)
    Hred = lin.Hpp - WA @ W.T
    Hred = Hred * (pm[:, None] * pm[None, :]) + jnp.diag(1.0 - pm)

    c, low = jax.scipy.linalg.cho_factor(Hred)
    Y = jax.scipy.linalg.cho_solve((c, low), WA)
    WAr = WA.reshape(K6, L, 3)
    Yr = Y.reshape(K6, L, 3)
    corr = jnp.einsum("kld,kle->lde", WAr, Yr)
    sigma = Ainv + corr
    return sigma * lmm[:, None, None] + eye3[None] * (1.0 - lmm)[:, None, None]


@jax.jit
def landmark_marginals(g: GraphState) -> jax.Array:
    """Marginal covariances at the CURRENT graph estimate (fresh
    linearization) — ``GraphSLAM::computeLandmarkMarginals`` analog
    (graph_slam.cpp:221-234). The hot path reuses the LM loop's final
    linearization instead (``lm_optimize(with_marginals=True)``); this
    standalone version serves on-demand recovery (e.g. exporting
    covariances on eq-gating profiles)."""
    pose_free, lm_free = _free_masks(g)
    return marginals_from_lin(linearize(g), pose_free, lm_free)
