"""Matrix-free Schur-complement LM with block-Jacobi preconditioned CG.

The scalable solver path (SolverConfig.linear_solver='pcg'). The dense path
(``lm.py``) assembles ``Hpp [6K,6K]`` and psums it across the mesh — O(K^2)
bytes of collective traffic per iteration, which caps scaling. Here the
reduced camera system is never materialized:

  * linearization keeps PER-EDGE Hessian blocks (``H_ii/H_ij/H_jj`` for
    odometry edges, ``H_kk/W_kl`` for observation edges) local to the shard
    that owns the edge,
  * the reduced-system operator  ``x -> (Hpp + lam I) x - W A^-1 W^T x``
    is applied edge-wise with two collectives per matvec: a [3L] psum for
    the landmark gather ``W^T x`` and a [6K] psum for the pose scatter —
    ~13 KB of ICI traffic per CG step at K=512 instead of 37 MB,
  * CG is preconditioned with the block-Jacobi inverse of the damped pose
    diagonal (psum'd once per linearization),
  * the same Nielsen gain-ratio LM loop as the dense path wraps it.

Works single-chip (collective = identity) and under shard_map (collective =
psum over the mesh axis).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from semantic_slam_tpu.core import geometry as geo
from semantic_slam_tpu.graph import residuals as res
from semantic_slam_tpu.graph.state import GraphState
from semantic_slam_tpu.solver.lm import LMStats, _free_masks, inv33
from semantic_slam_tpu.solver.lm import inv66 as lm_inv66
from semantic_slam_tpu.solver.robust import robust_rho, robust_weight


class EdgeBlocks(NamedTuple):
    """Per-shard edge-local Hessian blocks + psum'd small globals."""

    # odometry edges (local shard)
    oi: jax.Array
    oj: jax.Array
    H_ii: jax.Array  # [E1, 6, 6]
    H_ij: jax.Array
    H_jj: jax.Array
    # observation edges (local shard)
    lk: jax.Array
    ll: jax.Array
    H_kk: jax.Array  # [E2, 6, 6]
    W_kl: jax.Array  # [E2, 6, 3]
    # globals (already reduced across shards)
    Hll: jax.Array  # [L, 3, 3]
    gp: jax.Array  # [K, 6]
    gl: jax.Array  # [L, 3]
    diag: jax.Array  # [K, 6, 6]  pose diagonal blocks
    chi2: jax.Array


class OneHots(NamedTuple):
    """Per-shard 0/1 selection matrices for matmul-form gather/scatter.

    TPU scatters serialize per index; with these, every segment-sum in the
    CG matvec becomes an MXU dot (solver/assembly.py rationale). Built once
    per LM solve — the edge indices never change inside the loop.
    """

    Oi: jax.Array  # [E1, K]
    Oj: jax.Array  # [E1, K]
    Ok: jax.Array  # [E2, K]
    Ol: jax.Array  # [E2, L]


def build_edge_blocks(
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
    allreduce: Callable,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    oh: OneHots | None = None,
) -> EdgeBlocks:
    K = poses.shape[0]
    L = landmarks.shape[0]
    dtype = poses.dtype

    om = odom_mask.astype(dtype)
    o_info = odom_info * om[:, None, None]
    r_o, Ji, Jj = jax.vmap(res.se3_edge_residual_jac)(
        poses[odom_i], poses[odom_j], odom_meas
    )
    JiT_O = jnp.einsum("eai,eab->eib", Ji, o_info)
    JjT_O = jnp.einsum("eai,eab->eib", Jj, o_info)
    H_ii = jnp.einsum("eia,eaj->eij", JiT_O, Ji)
    H_ij = jnp.einsum("eia,eaj->eij", JiT_O, Jj)
    H_jj = jnp.einsum("eia,eaj->eij", JjT_O, Jj)
    g_i = jnp.einsum("eia,ea->ei", JiT_O, r_o)
    g_j = jnp.einsum("eia,ea->ei", JjT_O, r_o)
    chi_o = jnp.einsum("ea,eab,eb->", r_o, o_info, r_o)

    lmm = lme_mask.astype(dtype)
    l_info = lme_info * lmm[:, None, None]
    r_l, Jp, Jl = jax.vmap(res.se3_point_residual_jac)(
        poses[lme_k], landmarks[lme_l], lme_meas
    )
    chi_e = jnp.einsum("ea,eab,eb->e", r_l, l_info, r_l)
    chi_l_rho = jnp.sum(robust_rho(chi_e, robust_kind, robust_delta))
    if robust_kind != "none":
        w = robust_weight(chi_e, robust_kind, robust_delta).astype(dtype)
        l_info = l_info * w[:, None, None]
    JpT_O = jnp.einsum("eai,eab->eib", Jp, l_info)
    JlT_O = jnp.einsum("eai,eab->eib", Jl, l_info)
    H_kk = jnp.einsum("eia,eaj->eij", JpT_O, Jp)
    W_kl = jnp.einsum("eia,eaj->eij", JpT_O, Jl)
    H_ll_e = jnp.einsum("eia,eaj->eij", JlT_O, Jl)
    g_k = jnp.einsum("eia,ea->ei", JpT_O, r_l)
    g_l = jnp.einsum("eia,ea->ei", JlT_O, r_l)
    chi_l = chi_l_rho

    if oh is not None:
        # segment sums as MXU matmuls (solver/assembly.py rationale); the
        # one-hot slices cover exactly this function's point edges
        Oi, Oj = oh.Oi, oh.Oj
        Ok, Ol = oh.Ok[: lme_k.shape[0]], oh.Ol[: lme_k.shape[0], :L]
        gp = jnp.einsum("ek,ei->ki", Oi, g_i) + jnp.einsum("ek,ei->ki", Oj, g_j)
        gp = gp + jnp.einsum("ek,ei->ki", Ok, g_k)
        gl = jnp.einsum("el,ei->li", Ol, g_l)
        Hll = jnp.einsum("el,eij->lij", Ol, H_ll_e)
        diag = (
            jnp.einsum("ek,eij->kij", Oi, H_ii)
            + jnp.einsum("ek,eij->kij", Oj, H_jj)
            + jnp.einsum("ek,eij->kij", Ok, H_kk)
        )
    else:
        gp = jnp.zeros((K, 6), dtype).at[odom_i].add(g_i).at[odom_j].add(g_j)
        gp = gp.at[lme_k].add(g_k)
        gl = jnp.zeros((L, 3), dtype).at[lme_l].add(g_l)
        Hll = jnp.zeros((L, 3, 3), dtype).at[lme_l].add(H_ll_e)
        diag = (
            jnp.zeros((K, 6, 6), dtype)
            .at[odom_i].add(H_ii)
            .at[odom_j].add(H_jj)
            .at[lme_k].add(H_kk)
        )

    return EdgeBlocks(
        oi=odom_i,
        oj=odom_j,
        H_ii=H_ii,
        H_ij=H_ij,
        H_jj=H_jj,
        lk=lme_k,
        ll=lme_l,
        H_kk=H_kk,
        W_kl=W_kl,
        Hll=allreduce(Hll),
        gp=allreduce(gp),
        gl=allreduce(gl),
        diag=allreduce(diag),
        chi2=allreduce(chi_o + chi_l),
    )


def apply_prior_blocks(eb: EdgeBlocks, prior, poses, landmarks) -> EdgeBlocks:
    """Fold a fixed-lag ``MarginalPrior`` (solver/fixed_lag.py) into edge
    blocks. All additions land on the POST-allreduce (replicated) fields, so
    this is shard_map-safe when applied on every shard."""
    from semantic_slam_tpu.solver import fixed_lag as fl

    dtype = eb.gp.dtype
    PB = prior.p_idx.shape[0]
    gp_add, gl_add, chi_pr = fl.prior_fold_terms(prior, poses, landmarks, dtype)
    return eb._replace(
        Hll=eb.Hll + prior.Hl,
        gp=eb.gp.at[prior.p_idx].add(gp_add.reshape(PB, 6)),
        gl=eb.gl + gl_add,
        diag=eb.diag.at[prior.p_idx].add(fl.prior_pose_diag(prior)),
        chi2=eb.chi2 + chi_pr,
    )


def apply_prior_blocks_planes(
    eb: EdgeBlocks, prior, poses, landmarks, planes
) -> EdgeBlocks:
    """``apply_prior_blocks`` for plane-extended edge blocks
    (build_edge_blocks_with_planes): the prior's plane part lands on the
    appended plane rows ``Hll[L:]`` / ``gl[L:]``; pose and point parts are
    identical to the point path. Replicated/post-psum like the point case."""
    from semantic_slam_tpu.solver import fixed_lag as fl

    dtype = eb.gp.dtype
    L = landmarks.shape[0]
    PB = prior.p_idx.shape[0]
    gp_add, gl_add, chi_pr = fl.prior_fold_terms(prior, poses, landmarks, dtype)
    chi_pl, gpl = fl._plane_prior_terms(prior, planes)
    return eb._replace(
        Hll=eb.Hll.at[:L].add(prior.Hl).at[L:].add(prior.Hpl),
        gp=eb.gp.at[prior.p_idx].add(gp_add.reshape(PB, 6)),
        gl=eb.gl.at[:L].add(gl_add).at[L:].add(gpl.astype(dtype)),
        diag=eb.diag.at[prior.p_idx].add(fl.prior_pose_diag(prior)),
        chi2=eb.chi2 + chi_pr + chi_pl,
    )


def reduced_matvec(
    eb: EdgeBlocks, Ainv: jax.Array, lam, pose_free, x: jax.Array,
    allreduce: Callable, prior=None, oh: OneHots | None = None,
) -> jax.Array:
    """Apply the damped reduced operator to x [K,6] (free rows only).

    With ``oh``, everything runs as MXU one-hot matmuls (O(E*K) work, but
    no serialized TPU scatters); without, native gathers/scatters (the CPU
    path). The TPU fast path lives in the per-pose layout (``ell_matvec``),
    not here."""
    K = x.shape[0]
    L = Ainv.shape[0]
    dtype = x.dtype
    x = x * pose_free[:, None]

    if oh is not None:
        xi, xj, xk = oh.Oi @ x, oh.Oj @ x, oh.Ok @ x
        t = allreduce(
            jnp.einsum("el,ej->lj", oh.Ol, jnp.einsum("eij,ei->ej", eb.W_kl, xk))
        )
        z = jnp.einsum("lij,lj->li", Ainv, t)  # replicated
        vi = jnp.einsum("eij,ej->ei", eb.H_ii, xi) + jnp.einsum(
            "eij,ej->ei", eb.H_ij, xj
        )
        vj = jnp.einsum("eji,ej->ei", eb.H_ij, xi) + jnp.einsum(
            "eij,ej->ei", eb.H_jj, xj
        )
        vk = jnp.einsum("eij,ej->ei", eb.H_kk, xk) - jnp.einsum(
            "eij,ej->ei", eb.W_kl, oh.Ol @ z
        )
        u = allreduce(
            jnp.einsum("ek,ei->ki", oh.Oi, vi)
            + jnp.einsum("ek,ei->ki", oh.Oj, vj)
            + jnp.einsum("ek,ei->ki", oh.Ok, vk)
        )
    else:
        # landmark gather: t = W^T x  (needs global reduction over shards)
        t_loc = jnp.zeros((L, 3), dtype).at[eb.ll].add(
            jnp.einsum("eij,ei->ej", eb.W_kl, x[eb.lk])
        )
        t = allreduce(t_loc)
        z = jnp.einsum("lij,lj->li", Ainv, t)  # replicated

        # pose scatter: edge-local contributions
        u = jnp.zeros((K, 6), dtype)
        xi, xj = x[eb.oi], x[eb.oj]
        u = u.at[eb.oi].add(
            jnp.einsum("eij,ej->ei", eb.H_ii, xi) + jnp.einsum("eij,ej->ei", eb.H_ij, xj)
        )
        u = u.at[eb.oj].add(
            jnp.einsum("eji,ej->ei", eb.H_ij, xi) + jnp.einsum("eij,ej->ei", eb.H_jj, xj)
        )
        u = u.at[eb.lk].add(jnp.einsum("eij,ej->ei", eb.H_kk, x[eb.lk]))
        u = u.at[eb.lk].add(-jnp.einsum("eij,ej->ei", eb.W_kl, z[eb.ll]))
        u = allreduce(u)
    if prior is not None:
        # dense boundary-pose prior block (replicated — added after psum).
        # NOTE: the prior's landmark part is inside eb.Hll, hence inside
        # Ainv, so it needs no term here.
        PB = prior.p_idx.shape[0]
        xp = x[prior.p_idx].reshape(-1)
        u = u.at[prior.p_idx].add((prior.Hp @ xp).reshape(PB, 6))
    u = u + lam * x
    return u * pose_free[:, None]


def pcg_solve(
    eb: EdgeBlocks,
    Ainv: jax.Array,
    lam,
    pose_free: jax.Array,
    b: jax.Array,  # [K, 6]
    allreduce: Callable,
    max_cg_iters: int = 128,
    tol: float = 1e-8,
    precond: Callable | None = None,
    prior=None,
    oh: OneHots | None = None,
) -> jax.Array:
    """Preconditioned CG on the reduced camera system (block-Jacobi by
    default; pass ``precond`` for the block-tridiagonal chain variant)."""
    dtype = b.dtype
    pf = pose_free.astype(dtype)
    if precond is None:
        eye6 = jnp.eye(6, dtype=dtype)
        Mdiag = eb.diag + lam * eye6[None]
        Mdiag = Mdiag * pf[:, None, None] + eye6[None] * (1.0 - pf)[:, None, None]
        Minv = lm_inv66(Mdiag)  # analytic block inverse: LU custom-calls
        # were ~half the K=4096 device time (see lm.inv66 docstring)

        def precond(r):
            return jnp.einsum("kij,kj->ki", Minv, r) * pf[:, None]

    b = b * pf[:, None]
    x = jnp.zeros_like(b)
    r = b
    z = precond(r)
    p = z
    rz = jnp.sum(r * z)
    b2 = jnp.maximum(jnp.sum(b * b), 1e-30)

    def cond(carry):
        _, r, _, _, it = carry
        return (jnp.sum(r * r) > tol * b2) & (it < max_cg_iters)

    def body(carry):
        x, r, p, rz, it = carry
        Ap = reduced_matvec(
            eb, Ainv, lam, pf, p, allreduce, prior=prior, oh=oh
        )
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return x, r, p, rz_new, it + 1

    x, _, _, _, _ = jax.lax.while_loop(cond, body, (x, r, p, rz, jnp.zeros((), jnp.int32)))
    return x


def schur_pcg_step(
    eb: EdgeBlocks,
    lam,
    pose_free,
    block_free,
    allreduce: Callable,
    max_cg_iters: int,
    precond_kind: str = "jacobi",
    prior=None,
    oh: OneHots | None = None,
    cg_tol: float = 1e-8,
):
    """One damped Schur-eliminated solve on (possibly plane-extended) edge
    blocks: returns (dp [K,6], db [B,3]) where B = number of 3-dof landmark
    blocks (points, or points+planes).

    ``precond_kind='tridiag'`` preconditions CG with the damped odometry-chain
    block tridiagonal solved by parallel cyclic reduction
    (``solver/tridiag.py``) — it captures the chain coupling block-Jacobi
    ignores, cutting CG iterations on long trajectories."""
    dtype = eb.gp.dtype
    pf = pose_free.astype(dtype)
    lmf = block_free.astype(dtype)
    eye3 = jnp.eye(3, dtype=dtype)

    precond = None
    if precond_kind == "tridiag":
        from semantic_slam_tpu.solver import tridiag as td

        eye6 = jnp.eye(6, dtype=dtype)
        D = eb.diag + lam * eye6[None]
        D = D * pf[:, None, None] + eye6[None] * (1.0 - pf)[:, None, None]
        D, upper_loc = td.chain_blocks_from_edges(
            D, eb.oi, eb.oj, eb.H_ij, pose_free
        )
        fac = td.pcr_factor(D, allreduce(upper_loc))

        def precond(r):
            return td.pcr_solve(fac, r) * pf[:, None]

    A = eb.Hll + lam * eye3[None]
    A = A * lmf[:, None, None] + eye3[None] * (1.0 - lmf)[:, None, None]
    Ainv = inv33(A)
    gl = eb.gl * lmf[:, None]
    # b = -(gp - W A^-1 gl)
    y = jnp.einsum("lij,lj->li", Ainv, gl)
    if oh is not None:
        c_loc = jnp.einsum(
            "ek,ei->ki", oh.Ok, jnp.einsum("eij,ej->ei", eb.W_kl, oh.Ol @ y)
        )
    else:
        c_loc = jnp.zeros_like(eb.gp).at[eb.lk].add(
            jnp.einsum("eij,ej->ei", eb.W_kl, y[eb.ll])
        )
    b = -(eb.gp - allreduce(c_loc)) * pf[:, None]
    dp = pcg_solve(
        eb, Ainv, lam, pose_free, b, allreduce, max_cg_iters, tol=cg_tol,
        precond=precond, prior=prior, oh=oh,
    )
    # back-substitute: db = Ainv(-gl - W^T dp)
    dpk = (dp * pf[:, None])
    if oh is not None:
        t_loc = jnp.einsum(
            "el,ej->lj", oh.Ol, jnp.einsum("eij,ei->ej", eb.W_kl, oh.Ok @ dpk)
        )
    else:
        t_loc = jnp.zeros_like(gl).at[eb.ll].add(
            jnp.einsum("eij,ei->ej", eb.W_kl, dpk[eb.lk])
        )
    t = allreduce(t_loc)
    db = jnp.einsum("lij,lj->li", Ainv, (-gl - t)) * lmf[:, None]
    return dp, db


def run_lm_loop_pcg(
    poses,
    landmarks,
    edge_args: tuple,
    pose_free,
    lm_free,
    allreduce: Callable,
    max_iterations: int,
    rel_tol: float,
    max_cg_iters: int = 128,
    init_lambda_tau: float = 1e-5,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    init_lambda=0.0,
    precond_kind: str = "jacobi",
    prior=None,
    assembly: str = "auto",
    cg_tol: float = 1e-8,
):
    """Nielsen-damped LM with the matrix-free PCG inner solver.
    ``init_lambda > 0`` (traced) warm-starts the damping. ``prior`` is a
    fixed-lag MarginalPrior folded into every linearization (replicated).
    ``assembly`` picks the segment-sum strategy ('matmul' one-hots or
    'scatter'; 'ell' resolves to the backend default here — the per-pose
    ELL fast path has its own loop, run_lm_loop_pcg_ellk). Layouts are
    built once per solve — edge indices never change inside the loop."""
    from semantic_slam_tpu.solver.assembly import onehot, resolve_assembly

    dtype = poses.dtype
    K = poses.shape[0]
    L = landmarks.shape[0]
    oh = None
    kind = resolve_assembly(assembly, ell_ok=False)
    if kind == "matmul":
        oh = OneHots(
            Oi=onehot(edge_args[0], K, dtype),
            Oj=onehot(edge_args[1], K, dtype),
            Ok=onehot(edge_args[5], K, dtype),
            Ol=onehot(edge_args[6], L, dtype),
        )

    def build(p, l):
        eb = build_edge_blocks(
            p, l, *edge_args, allreduce, robust_kind=robust_kind,
            robust_delta=robust_delta, oh=oh,
        )
        if prior is not None:
            eb = apply_prior_blocks(eb, prior, p, l)
        return eb

    eb0 = build(poses, landmarks)
    chi2_0 = eb0.chi2
    diag_max = jnp.maximum(
        jnp.max(jnp.abs(jnp.diagonal(eb0.diag, axis1=-2, axis2=-1))),
        jnp.max(jnp.abs(jnp.diagonal(eb0.Hll, axis1=-2, axis2=-1))),
    )
    init_lambda = jnp.asarray(init_lambda, dtype)
    lam0 = jnp.where(
        init_lambda > 0, init_lambda, init_lambda_tau * jnp.maximum(diag_max, 1.0)
    ).astype(dtype)

    def solve(eb, lam):
        return schur_pcg_step(
            eb, lam, pose_free, lm_free, allreduce, max_cg_iters,
            precond_kind=precond_kind, prior=prior, oh=oh,
            cg_tol=cg_tol,
        )

    def cond(carry):
        _, _, _, _, _, it, done = carry
        return (it < max_iterations) & jnp.logical_not(done)

    def body(carry):
        p, l, eb, lam, nu, it, done = carry
        dp, dl = solve(eb, lam)
        p_new = jax.vmap(geo.pose_retract)(p, dp.astype(p.dtype))
        l_new = l + dl.astype(l.dtype)
        # speculative relinearization at the trial point: eb_new.chi2 is the
        # trial objective, so an accepted step pays one build total; a
        # rejected step retries the carried blocks with a larger lambda
        eb_new = build(p_new, l_new)
        chi2_new = eb_new.chi2

        delta = jnp.concatenate([dp.reshape(-1), dl.reshape(-1)])
        gvec = jnp.concatenate([eb.gp.reshape(-1), eb.gl.reshape(-1)])
        pred = lam * jnp.dot(delta, delta) - jnp.dot(delta, gvec)
        rho = (eb.chi2 - chi2_new) / jnp.maximum(pred, 1e-12)
        finite = jnp.isfinite(chi2_new) & jnp.all(jnp.isfinite(delta))
        accept = (rho > 0) & finite

        p = jnp.where(accept, p_new, p)
        l = jnp.where(accept, l_new, l)
        lam_acc = lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam = jnp.where(accept, lam_acc, lam * nu)
        nu = jnp.where(accept, 2.0, nu * 2.0)
        converged = accept & (
            (eb.chi2 - chi2_new) <= rel_tol * jnp.maximum(eb.chi2, 1e-12)
        )
        done = converged | (lam > 1e12)
        eb = jax.tree.map(lambda a, b: jnp.where(accept, a, b), eb_new, eb)
        return p, l, eb, lam, nu, it + 1, done

    init = (poses, landmarks, eb0, lam0, jnp.asarray(2.0, dtype), jnp.zeros((), jnp.int32), jnp.zeros((), bool))
    p, l, eb_f, lam, _, it, _ = jax.lax.while_loop(cond, body, init)
    # eb_f always matches the carried (p, l) — reusable for marginal
    # recovery without re-linearizing (see landmark_marginals_mf)
    return p, l, LMStats(it, chi2_0, eb_f.chi2, lam), eb_f


def landmark_marginals_mf(
    eb: EdgeBlocks,
    pose_free: jax.Array,
    block_free: jax.Array,
    allreduce: Callable = lambda x: x,
    prior=None,
) -> jax.Array:
    """Matrix-free landmark marginal recovery — the PCG-path analog of
    ``lm.marginals_from_lin`` (graph_slam.cpp:221-234), with NO [6K,6K]
    matrix anywhere.

    Instead of eliminating landmarks and factoring the dense reduced CAMERA
    system (the dense path: O(K^3) flops, a ~2.4 GB [6K,6K] factor at
    K=4096), eliminate the POSES. The engine's pose graph is a pure
    odometry chain (semantic_graph_slam.cpp:104-150 — every SE3-SE3 edge
    joins consecutive keyframes), so the pose block Hpp is EXACTLY block
    tridiagonal and parallel cyclic reduction (solver/tridiag.py) applies
    Hpp^-1 in O(K log K) batched 6x6/6x3B MXU matmuls. The landmark-reduced
    information

        S = Hll - W^T Hpp^-1 W            ([3B, 3B])

    is then inverted densely: B counts SEMANTIC OBJECTS (bounded by the
    landmark table), while K is the axis that grows with trajectory length
    — so no dense factor scales with the trajectory. ``Sigma_ll`` = the
    diagonal 3x3 blocks of S^-1. EXACT (up to float summation) for chain
    graphs; non-chain SE3-SE3 edges (never produced by the engine) would be
    dropped from Hpp. Pinned against the dense recovery in tests/test_pcg.py.

    The fixed-lag prior's pose part is a dense block over <=PB boundary
    poses (fixed_lag.MarginalPrior.Hp). Its DIAGONAL already sits in
    eb.diag (``apply_prior_blocks`` — eb MUST be prior-folded when
    ``prior`` is passed); the off-diagonal coupling is folded exactly via a
    PB-sized Woodbury correction.

    Under shard_map, edge terms stay shard-local; the [K,6,3B] column
    blocks and the [K,6,6] chain couplings are psum'd ONCE per recovery.
    ``block_free`` masks the 3-dof landmark blocks (points, or points +
    planes for the plane-extended system); inactive blocks get identity.
    """
    from semantic_slam_tpu.solver import tridiag as td
    from semantic_slam_tpu.solver.assembly import cross_block_mm

    K = eb.gp.shape[0]
    B = eb.Hll.shape[0]
    dtype = eb.gp.dtype
    pf = pose_free.astype(dtype)
    lmf = block_free.astype(dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    eye6 = jnp.eye(6, dtype=dtype)

    # pose-block tridiagonal T: masked diagonal + odometry-chain couplings
    Dm = eb.diag * pf[:, None, None] + eye6[None] * (1.0 - pf)[:, None, None]
    Dm, upper_loc = td.chain_blocks_from_edges(
        Dm, eb.oi, eb.oj, eb.H_ij, pose_free
    )
    fac = td.pcr_factor(Dm, allreduce(upper_loc))

    # W columns in [K,6,3B] layout (same bytes as the dense path's W — the
    # saving is the missing [6K,6K] factor, not this)
    w_e = pf[eb.lk] * lmf[eb.ll]
    W_e = eb.W_kl * w_e[:, None, None]  # [E,6,3]
    U = allreduce(cross_block_mm(eb.lk, eb.ll, W_e, K, B)).reshape(K, 6, 3 * B)
    return _sigma_from_chain_parts(
        fac, U, eb.Hll, pose_free, block_free, prior, dtype
    )


def _sigma_from_chain_parts(fac, U, Hll, pose_free, block_free, prior, dtype):
    """Shared tail of the matrix-free marginal recovery: given the factored
    pose-chain tridiagonal ``fac`` and the W columns ``U`` [K,6,3B], fold
    the optional boundary prior (Woodbury) and invert the landmark-reduced
    information S = Hll - W^T Hpp^-1 W. Used by both edge layouts."""
    from semantic_slam_tpu.solver import tridiag as td

    K = U.shape[0]
    B = Hll.shape[0]
    pf = pose_free.astype(dtype)
    lmf = block_free.astype(dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    X = td.pcr_solve_cols(fac, U)  # T^-1 W

    if prior is not None:
        # Woodbury fold of the boundary prior's off-diagonal pose coupling:
        # Hpp = T + Sel (Hp - blockdiag Hp) Sel^T  with Sel selecting the
        # p_idx rows (the blockdiag part is already inside eb.diag).
        PB = prior.p_idx.shape[0]
        bidx = jnp.arange(PB)
        Hp4 = prior.Hp.reshape(PB, 6, PB, 6)
        bd = Hp4[bidx, :, bidx, :]  # [PB,6,6]
        bd_embed = (
            bd[:, :, None, :] * jnp.eye(PB, dtype=dtype)[:, None, :, None]
        ).reshape(6 * PB, 6 * PB)
        Delta = prior.Hp.astype(dtype) - bd_embed
        sel_ok = pf[prior.p_idx]  # boundary poses outside the mask drop out
        E = jnp.zeros((K, 6, PB, 6), dtype)
        E = E.at[prior.p_idx, :, bidx, :].set(
            jnp.eye(6, dtype=dtype)[None] * sel_ok[:, None, None]
        )
        TiS = td.pcr_solve_cols(fac, E.reshape(K, 6, 6 * PB))  # T^-1 Sel
        M = TiS[prior.p_idx].reshape(6 * PB, 6 * PB)  # Sel^T T^-1 Sel
        SX = X[prior.p_idx].reshape(6 * PB, 3 * B)  # Sel^T X
        inner = jnp.eye(6 * PB, dtype=dtype) + Delta @ M
        G = jnp.linalg.solve(inner, Delta @ SX)
        X = X - jnp.einsum("kac,cd->kad", TiS, G)

    # landmark-reduced information S = Hll - W^T Hpp^-1 W  ([3B,3B]) —
    # dense in the BOUNDED landmark axis only
    UtX = jnp.einsum("kac,kad->cd", U, X)
    A = Hll * lmf[:, None, None] + eye3[None] * (1.0 - lmf)[:, None, None]
    bidx3 = jnp.arange(B)
    S = (-UtX).reshape(B, 3, B, 3)
    S = S.at[bidx3, :, bidx3, :].add(A)
    m2 = lmf[:, None] * lmf[None, :]
    S = S * m2[:, None, :, None]
    S = S.at[bidx3, :, bidx3, :].add(
        eye3[None] * (1.0 - lmf)[:, None, None]
    )
    S = S.reshape(3 * B, 3 * B)
    S = 0.5 * (S + S.T) + 1e-8 * jnp.eye(3 * B, dtype=dtype)

    c, low = jax.scipy.linalg.cho_factor(S)
    Sigma = jax.scipy.linalg.cho_solve((c, low), jnp.eye(3 * B, dtype=dtype))
    sigma = Sigma.reshape(B, 3, B, 3)[bidx3, :, bidx3, :]
    sigma = 0.5 * (sigma + jnp.swapaxes(sigma, -1, -2))
    return sigma * lmf[:, None, None] + eye3[None] * (1.0 - lmf)[:, None, None]


# ---------------------------------------------------------------------------
# Per-pose ELL layout: the TPU fast path (single-chip AND pose-row-sharded)
# ---------------------------------------------------------------------------
#
# Device-lane profiling of the generic assemblies (device_time_bench):
# the one-hot matmuls do O(E*K) work (dominates from K~2048 up), while a
# slot-GATHER form (r3's EllLayout, removed in r4 once every caller moved
# here) replaced them with row gathers that are latency-bound on TPU (2x
# SLOWER at K<=2048). The resolution is a layout that needs neither
# pose-side gathers nor one-hots: store landmark
# edges in a dense per-pose grid [K, R] (R = the static per-keyframe bound,
# empty slots info-masked) and odometry as the chain it is ([K] rows, edge
# k -> k+1). Then
#
#   * the pose-side GATHER  x[lme_k]  is a broadcast  x[:, None, :],
#   * the pose-side SEGMENT SUM is  .sum(axis=1)  over the R slots,
#   * the odometry gathers/sums are one roll/shift,
#
# i.e. every trajectory-sized indexed op vanishes into elementwise/batched
# arithmetic; only the LANDMARK side keeps an inline one-hot ([K*R, L],
# bounded by the object table, not the trajectory). Measured per CG step at
# K=4096: 69 us vs 65 us one-hot — but the one-hot LINEARIZATION'S O(E*K)
# diag/gp reductions (~3.5 ms/iter at K=4096) collapse to sums as well.
#
# Conversion from the graph's [E] edge arrays happens once per solve (a
# [K,R]-row gather through assembly.build_slots; indices never change inside
# the LM loop). Contract: same as build_slots (sorted real-prefix, per-pose
# bound R) plus CHAIN odometry (odom edge e joins poses (i, i+1)); a
# non-chain odometry edge is dropped from the system (guarded exactly, not
# corrupted) — the engine never builds one (semantic_graph_slam.cpp:104-150).
# The SHARDED paths (sharded_lm_optimize_pcg[_planes] with ell_rows) run
# this same grid sharded by POSE ROWS: each shard owns a contiguous [K/n, R]
# slice, CG state is replicated, shard-local row contributions embed at
# their offset (_dus_rows) and merge in [6K]/[3L]-class psums — incl. the
# with_marginals recovery and the merged point+plane grid (r4).


class EllEdges(NamedTuple):
    """Static per-solve edge data in per-pose layout (see block comment)."""

    ll: jax.Array  # [K, R] landmark index per slot (0 where empty)
    meas: jax.Array  # [K, R, 3]
    info: jax.Array  # [K, R, 3, 3], zeroed on empty slots
    o_meas: jax.Array  # [K, 7] odometry measurement of edge k -> k+1
    o_info: jax.Array  # [K, 6, 6], zeroed where no chain edge leaves k
    o_w: jax.Array  # [K] chain-edge mask (float)


class EllBlocks(NamedTuple):
    """Per-pose-layout Hessian blocks (field names shared with EdgeBlocks
    where apply_prior_blocks touches them: Hll/gp/gl/diag/chi2)."""

    ll: jax.Array  # [K, R]
    H_ii: jax.Array  # [K, 6, 6] chain edge k->k+1, i-side
    H_ij: jax.Array  # [K, 6, 6]
    H_jj: jax.Array  # [K, 6, 6]
    H_kk: jax.Array  # [K, R, 6, 6]
    W_kl: jax.Array  # [K, R, 6, 3]
    Hll: jax.Array  # [L, 3, 3]
    gp: jax.Array  # [K, 6]
    gl: jax.Array  # [L, 3]
    diag: jax.Array  # [K, 6, 6]
    chi2: jax.Array


def _shift_down(v):
    """Row k of the result = row k-1 of v (row 0 = 0): the j-side
    contribution of chain edge k-1 landing on pose k."""
    return jnp.concatenate([jnp.zeros_like(v[:1]), v[:-1]], axis=0)


def _onehot_l(ll_flat, L, dtype):
    # inline; XLA fuses the compare into the consuming contraction
    return (
        ll_flat[:, None] == jnp.arange(L, dtype=ll_flat.dtype)[None, :]
    ).astype(dtype)


def _factor_l(L: int) -> tuple[int, int]:
    """L ~ hi * lo with lo a power of two near sqrt(L) — the digit split
    for the two-level landmark one-hots below."""
    lo = 1
    while lo * lo < L:
        lo *= 2
    return -(-L // lo), lo


def _seg_sum_l(ll_flat, vals, L):
    """Landmark-side segment sum [E, D] -> [L, D] via a TWO-LEVEL one-hot.

    A flat inline one-hot costs E*L fused compares on the VPU —
    the dominant CG-step cost once the pose side is free (measured 46
    us/step at K=4096/L=1024). Splitting l = hi*lo_w + lo factors it into
    E*lo_w compares (the low digit, multiplied into vals) plus a [hi, E] x
    [E, lo_w*D] contraction (the high digit) that is wide enough for the
    MXU: O(E*sqrt(L)) compare work instead of O(E*L)."""
    E, D = vals.shape
    hi, lo_w = _factor_l(L)
    dtype = vals.dtype
    lo_e = ll_flat % lo_w
    hi_e = ll_flat // lo_w
    oh_lo = (
        lo_e[:, None] == jnp.arange(lo_w, dtype=ll_flat.dtype)[None, :]
    ).astype(dtype)
    P = oh_lo[:, :, None] * vals[:, None, :]  # [E, lo_w, D]
    oh_hi = (
        hi_e[:, None] == jnp.arange(hi, dtype=ll_flat.dtype)[None, :]
    ).astype(dtype)
    T = jnp.einsum("eh,eld->hld", oh_hi, P)
    return T.reshape(hi * lo_w, D)[:L]


def _gather_l(ll_flat, table, L):
    """Landmark-side gather [L, D] -> [E, D], two-level (see _seg_sum_l)."""
    E = ll_flat.shape[0]
    D = table.shape[1]
    hi, lo_w = _factor_l(L)
    dtype = table.dtype
    pad = hi * lo_w - L
    Tt = jnp.concatenate(
        [table, jnp.zeros((pad, D), dtype)]
    ).reshape(hi, lo_w * D)
    lo_e = ll_flat % lo_w
    hi_e = ll_flat // lo_w
    oh_hi = (
        hi_e[:, None] == jnp.arange(hi, dtype=ll_flat.dtype)[None, :]
    ).astype(dtype)
    w = (oh_hi @ Tt).reshape(E, lo_w, D)
    oh_lo = (
        lo_e[:, None] == jnp.arange(lo_w, dtype=ll_flat.dtype)[None, :]
    ).astype(dtype)
    return jnp.einsum("el,eld->ed", oh_lo, w)


def build_ell_edges(edge_args: tuple, K: int, R: int) -> EllEdges:
    """[E]-layout edge arrays -> per-pose layout, once per solve."""
    from semantic_slam_tpu.solver.assembly import build_slots

    (oi, oj, o_meas, o_info, o_mask, lk, ll, l_meas, l_info, l_mask) = edge_args
    E1, E2 = oi.shape[0], lk.shape[0]
    dtype = l_meas.dtype

    slots = build_slots(lk, l_mask, K, R)  # [K, R], -1 empty
    valid = (slots >= 0).astype(dtype)

    def gat(a, e):
        ap = jnp.concatenate([a, jnp.zeros((1,) + a.shape[1:], a.dtype)])
        return ap[jnp.where(e >= 0, e, a.shape[0])]

    ll_e = gat(ll, slots)  # pad rows read index 0; their info is zeroed
    meas_e = gat(l_meas, slots)
    info_e = gat(l_info, slots) * valid[:, :, None, None]

    so = build_slots(oi, o_mask, K, 1)[:, 0]  # [K]
    oj_e = gat(oj, so)
    # chain guard: a slot whose edge does NOT go k -> k+1 is dropped
    # exactly (never mis-attributed to the chain)
    o_w = ((so >= 0) & (oj_e == jnp.arange(K, dtype=oj.dtype) + 1)).astype(dtype)
    # empty/dropped rows carry the identity measurement: a zero quaternion
    # would NaN the (masked) jacobian rows, and NaN * 0 stays NaN
    ident = jnp.zeros((7,), dtype).at[3].set(1.0)
    o_meas_e = jnp.where(o_w[:, None] > 0, gat(o_meas, so), ident[None, :])
    o_info_e = gat(o_info, so) * o_w[:, None, None]
    return EllEdges(
        ll=ll_e, meas=meas_e, info=info_e,
        o_meas=o_meas_e, o_info=o_info_e, o_w=o_w,
    )


def _dus_rows(block, offset, K):
    """Embed a shard's [Kb(+1), ...] row block at ``offset`` of a zeroed
    global [K, ...] array (the +1 row carries a chain contribution that
    spills into the next shard; overlaps merge in the caller's psum)."""
    out = jnp.zeros((K + 1,) + block.shape[1:], block.dtype)
    off = jnp.asarray(offset, jnp.int32)
    zeros = (jnp.zeros((), jnp.int32),) * (block.ndim - 1)
    out = jax.lax.dynamic_update_slice(out, block, (off,) + zeros)
    return out[:K]


def ell_linearize(
    poses,
    landmarks,
    ee: EllEdges,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    allreduce: Callable = lambda x: x,
    shard: tuple | None = None,
) -> EllBlocks:
    """build_edge_blocks in per-pose layout: no pose-side indexed ops.

    With ``shard=(offset, K_global)`` (a traced offset, under shard_map),
    ``ee`` holds this shard's CONTIGUOUS row slice [Kb, ...] of the global
    per-pose grid and ``poses``/``landmarks`` are replicated; the returned
    Hll/gp/gl/diag/chi2 are GLOBAL (allreduce'd — chain j-contributions
    that spill one row past the shard merge in the psum), while the
    per-edge blocks (H_**, W_kl, ll) stay shard-local.
    """
    Kfull = poses.shape[0]
    L = landmarks.shape[0]
    R = ee.ll.shape[1]
    dtype = poses.dtype
    Kb = ee.ll.shape[0]
    if shard is not None:
        offset, _ = shard
        poses_all = poses
        # rows [offset, offset+Kb+1): local poses plus the chain successor
        pp = jnp.concatenate([poses_all, poses_all[-1:]], axis=0)
        p_ext = jax.lax.dynamic_slice_in_dim(pp, offset, Kb + 1, axis=0)
        poses = p_ext[:-1]
        pj = p_ext[1:]
    else:
        # chain odometry: edge k joins (k, k+1); roll brings pose k+1 to
        # row k (the wrapped last row is zero-masked via o_info/o_w)
        pj = jnp.roll(poses, -1, axis=0)
    K = Kb
    r_o, Ji, Jj = jax.vmap(res.se3_edge_residual_jac)(poses, pj, ee.o_meas)
    JiT_O = jnp.einsum("kai,kab->kib", Ji, ee.o_info)
    JjT_O = jnp.einsum("kai,kab->kib", Jj, ee.o_info)
    H_ii = jnp.einsum("kia,kaj->kij", JiT_O, Ji)
    H_ij = jnp.einsum("kia,kaj->kij", JiT_O, Jj)
    H_jj = jnp.einsum("kia,kaj->kij", JjT_O, Jj)
    g_i = jnp.einsum("kia,ka->ki", JiT_O, r_o)
    g_j = jnp.einsum("kia,ka->ki", JjT_O, r_o)
    chi_o = jnp.einsum("ka,kab,kb->", r_o, ee.o_info, r_o)

    # landmark edges: pose broadcast over the R slots; landmark values via
    # the two-level one-hot (TPU row gathers are latency-bound, flat
    # one-hots cost O(E*L) VPU compares — see _seg_sum_l)
    ll_flat = ee.ll.reshape(-1)
    p_b = jnp.broadcast_to(poses[:, None, :], (K, R, poses.shape[1]))
    lw = _gather_l(ll_flat, landmarks, L).reshape(K, R, 3)
    r_l, Jp, Jl = jax.vmap(jax.vmap(res.se3_point_residual_jac))(
        p_b, lw, ee.meas
    )
    l_info = ee.info
    chi_e = jnp.einsum("kra,krab,krb->kr", r_l, l_info, r_l)
    chi_l = jnp.sum(robust_rho(chi_e.reshape(-1), robust_kind, robust_delta))
    if robust_kind != "none":
        w = robust_weight(
            chi_e.reshape(-1), robust_kind, robust_delta
        ).astype(dtype).reshape(K, R)
        l_info = l_info * w[:, :, None, None]
    JpT_O = jnp.einsum("krai,krab->krib", Jp, l_info)
    JlT_O = jnp.einsum("krai,krab->krib", Jl, l_info)
    H_kk = jnp.einsum("kria,kraj->krij", JpT_O, Jp)
    W_kl = jnp.einsum("kria,kraj->krij", JpT_O, Jl)
    H_ll_e = jnp.einsum("kria,kraj->krij", JlT_O, Jl)
    g_k = jnp.einsum("kria,kra->kri", JpT_O, r_l)
    g_l = jnp.einsum("kria,kra->kri", JlT_O, r_l)

    Hll = allreduce(
        _seg_sum_l(ll_flat, H_ll_e.reshape(K * R, 9), L).reshape(L, 3, 3)
    )
    gl = allreduce(_seg_sum_l(ll_flat, g_l.reshape(K * R, 3), L))
    if shard is not None:
        offset, Kg = shard
        pad1 = lambda a: jnp.concatenate(
            [a, jnp.zeros((1,) + a.shape[1:], a.dtype)], axis=0
        )
        pad0 = lambda a: jnp.concatenate(
            [jnp.zeros((1,) + a.shape[1:], a.dtype), a], axis=0
        )
        gp = allreduce(
            _dus_rows(pad1(g_i + g_k.sum(axis=1)) + pad0(g_j), offset, Kg)
        )
        diag = allreduce(
            _dus_rows(pad1(H_ii + H_kk.sum(axis=1)) + pad0(H_jj), offset, Kg)
        )
    else:
        gp = g_i + _shift_down(g_j) + g_k.sum(axis=1)
        diag = H_ii + _shift_down(H_jj) + H_kk.sum(axis=1)
    return EllBlocks(
        ll=ee.ll, H_ii=H_ii, H_ij=H_ij, H_jj=H_jj, H_kk=H_kk, W_kl=W_kl,
        Hll=Hll, gp=gp, gl=gl, diag=diag, chi2=allreduce(chi_o + chi_l),
    )


def ell_matvec(
    eb: EllBlocks, Ainv, lam, pf, x, prior=None,
    allreduce: Callable = lambda a: a, shard: tuple | None = None,
):
    """Damped reduced-operator application, all pose ops elementwise.

    With ``shard=(offset, K_global)``: eb holds this shard's row slice,
    ``x``/``pf`` are replicated [K_global, ...]; the result is the GLOBAL
    damped matvec (one [L,3] + one [6K] allreduce per application)."""
    Kb, R = eb.ll.shape
    L = Ainv.shape[0]
    dtype = x.dtype
    x = x * pf[:, None]
    ll_flat = eb.ll.reshape(-1)

    if shard is not None:
        offset, Kg = shard
        xp_ = jnp.concatenate([x, jnp.zeros((1, 6), dtype)], axis=0)
        x_ext = jax.lax.dynamic_slice_in_dim(xp_, offset, Kb + 1, axis=0)
        x_loc, xj = x_ext[:-1], x_ext[1:]
    else:
        x_loc = x
        xj = jnp.roll(x, -1, axis=0)  # pose k+1 at row k (masked blocks)

    wx = jnp.einsum("krij,ki->krj", eb.W_kl, x_loc)  # W^T x per slot
    t = allreduce(_seg_sum_l(ll_flat, wx.reshape(Kb * R, 3), L))
    z = jnp.einsum("lij,lj->li", Ainv, t)
    zb = _gather_l(ll_flat, z, L).reshape(Kb, R, 3)
    vk = jnp.einsum("krij,kj->kri", eb.H_kk, x_loc) - jnp.einsum(
        "krij,krj->kri", eb.W_kl, zb
    )
    vi = jnp.einsum("kij,kj->ki", eb.H_ii, x_loc) + jnp.einsum(
        "kij,kj->ki", eb.H_ij, xj
    )
    vj = jnp.einsum("kji,kj->ki", eb.H_ij, x_loc) + jnp.einsum(
        "kij,kj->ki", eb.H_jj, xj
    )
    own = vk.sum(axis=1) + vi
    if shard is not None:
        pad1 = jnp.concatenate([own, jnp.zeros((1, 6), dtype)], axis=0)
        pad0 = jnp.concatenate([jnp.zeros((1, 6), dtype), vj], axis=0)
        u = allreduce(_dus_rows(pad1 + pad0, offset, Kg))
    else:
        u = own + _shift_down(vj)

    if prior is not None:
        PB = prior.p_idx.shape[0]
        xp = x[prior.p_idx].reshape(-1)
        u = u.at[prior.p_idx].add((prior.Hp @ xp).reshape(PB, 6))
    return (u + lam * x) * pf[:, None]


def _ell_chain_upper(eb: EllBlocks, pose_free):
    """Chain coupling blocks for the tridiagonal preconditioner/marginals:
    upper[k] joins poses (k, k+1); couplings touching fixed poses zeroed."""
    pf = pose_free.astype(eb.H_ij.dtype)
    pf_next = jnp.concatenate([pf[1:], jnp.zeros_like(pf[:1])])
    return eb.H_ij * (pf * pf_next)[:, None, None]


def _ell_chain_upper_g(eb: EllBlocks, pose_free, allreduce, shard):
    """GLOBAL [K,6,6] chain upper blocks from (possibly pose-row-sharded)
    per-pose blocks: shard-local couplings embed at their row offset and
    merge in one psum. ``pose_free`` is always the replicated global mask."""
    if shard is None:
        return _ell_chain_upper(eb, pose_free)
    offset, Kg = shard
    dtype = eb.H_ij.dtype
    pf = pose_free.astype(dtype)
    Kb = eb.H_ij.shape[0]
    pf_loc = jax.lax.dynamic_slice_in_dim(pf, offset, Kb, axis=0)
    pfn = jax.lax.dynamic_slice_in_dim(
        jnp.concatenate([pf[1:], jnp.zeros((1,), dtype)]), offset, Kb, axis=0
    )
    up_loc = eb.H_ij * (pf_loc * pfn)[:, None, None]
    upper = allreduce(_dus_rows(up_loc, offset, Kg))
    return upper.at[Kg - 1].set(0.0)


def ell_schur_step(
    eb: EllBlocks,
    lam,
    pose_free,
    block_free,
    max_cg_iters: int,
    precond_kind: str = "jacobi",
    prior=None,
    cg_tol: float = 1e-8,
    allreduce: Callable = lambda a: a,
    shard: tuple | None = None,
):
    """schur_pcg_step in per-pose layout (single-chip, or pose-row-sharded
    with ``shard=(offset, K_global)`` — CG state replicated, matvec
    distributed, [6K]+[3L]-class allreduces only)."""
    dtype = eb.gp.dtype
    Kb, R = eb.ll.shape
    L = eb.Hll.shape[0]
    pf = pose_free.astype(dtype)
    lmf = block_free.astype(dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    eye6 = jnp.eye(6, dtype=dtype)
    ll_flat = eb.ll.reshape(-1)

    precond = None
    if precond_kind == "tridiag":
        from semantic_slam_tpu.solver import tridiag as td

        D = eb.diag + lam * eye6[None]
        D = D * pf[:, None, None] + eye6[None] * (1.0 - pf)[:, None, None]
        fac = td.pcr_factor(D, _ell_chain_upper_g(eb, pose_free, allreduce, shard))

        def precond(r):
            return td.pcr_solve(fac, r) * pf[:, None]

    A = eb.Hll + lam * eye3[None]
    A = A * lmf[:, None, None] + eye3[None] * (1.0 - lmf)[:, None, None]
    Ainv = inv33(A)
    gl = eb.gl * lmf[:, None]
    y = jnp.einsum("lij,lj->li", Ainv, gl)
    yb = _gather_l(ll_flat, y, L).reshape(Kb, R, 3)
    c_loc = jnp.einsum("krij,krj->kri", eb.W_kl, yb).sum(axis=1)
    if shard is not None:
        c = allreduce(_dus_rows(c_loc, shard[0], shard[1]))
    else:
        c = c_loc
    b = -(eb.gp - c) * pf[:, None]

    if precond is None:
        Mdiag = eb.diag + lam * eye6[None]
        Mdiag = Mdiag * pf[:, None, None] + eye6[None] * (1.0 - pf)[:, None, None]
        Minv = lm_inv66(Mdiag)

        def precond(r):
            return jnp.einsum("kij,kj->ki", Minv, r) * pf[:, None]

    b = b * pf[:, None]
    x = jnp.zeros_like(b)
    r = b
    z = precond(r)
    p = z
    rz = jnp.sum(r * z)
    b2 = jnp.maximum(jnp.sum(b * b), 1e-30)

    def cond(carry):
        _, r, _, _, it = carry
        return (jnp.sum(r * r) > cg_tol * b2) & (it < max_cg_iters)

    def body(carry):
        x, r, p, rz, it = carry
        Ap = ell_matvec(
            eb, Ainv, lam, pf, p, prior=prior, allreduce=allreduce,
            shard=shard,
        )
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return x, r, p, rz_new, it + 1

    dp, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x, r, p, rz, jnp.zeros((), jnp.int32))
    )

    dpk = dp * pf[:, None]
    if shard is not None:
        dpk_loc = jax.lax.dynamic_slice_in_dim(dpk, shard[0], Kb, axis=0)
    else:
        dpk_loc = dpk
    wd = jnp.einsum("krij,ki->krj", eb.W_kl, dpk_loc)
    t = allreduce(_seg_sum_l(ll_flat, wd.reshape(Kb * R, 3), L))
    db = jnp.einsum("lij,lj->li", Ainv, (-gl - t)) * lmf[:, None]
    return dp, db


def run_lm_loop_pcg_ellk(
    poses,
    landmarks,
    edge_args: tuple,
    pose_free,
    lm_free,
    max_iterations: int,
    rel_tol: float,
    max_cg_iters: int = 128,
    init_lambda_tau: float = 1e-5,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    init_lambda=0.0,
    precond_kind: str = "jacobi",
    prior=None,
    ell_rows: tuple = (1, 1, 8),
    cg_tol: float = 1e-8,
    allreduce: Callable = lambda a: a,
    shard: tuple | None = None,
    ee: EllEdges | None = None,
):
    """run_lm_loop_pcg on the per-pose layout. Single-chip by default;
    under shard_map pass ``allreduce`` (psum), ``shard=(offset, K_global)``
    and the shard's row slice ``ee`` (built globally outside the mesh)."""
    dtype = poses.dtype
    if ee is None:
        ee = build_ell_edges(edge_args, poses.shape[0], ell_rows[2])

    def build(p, l):
        eb = ell_linearize(
            p, l, ee, robust_kind=robust_kind, robust_delta=robust_delta,
            allreduce=allreduce, shard=shard,
        )
        if prior is not None:
            eb = apply_prior_blocks(eb, prior, p, l)
        return eb

    eb0 = build(poses, landmarks)
    chi2_0 = eb0.chi2
    diag_max = jnp.maximum(
        jnp.max(jnp.abs(jnp.diagonal(eb0.diag, axis1=-2, axis2=-1))),
        jnp.max(jnp.abs(jnp.diagonal(eb0.Hll, axis1=-2, axis2=-1))),
    )
    init_lambda = jnp.asarray(init_lambda, dtype)
    lam0 = jnp.where(
        init_lambda > 0, init_lambda, init_lambda_tau * jnp.maximum(diag_max, 1.0)
    ).astype(dtype)

    def cond(carry):
        _, _, _, _, _, it, done = carry
        return (it < max_iterations) & jnp.logical_not(done)

    def body(carry):
        p, l, eb, lam, nu, it, done = carry
        dp, dl = ell_schur_step(
            eb, lam, pose_free, lm_free, max_cg_iters,
            precond_kind=precond_kind, prior=prior, cg_tol=cg_tol,
            allreduce=allreduce, shard=shard,
        )
        p_new = jax.vmap(geo.pose_retract)(p, dp.astype(p.dtype))
        l_new = l + dl.astype(l.dtype)
        eb_new = build(p_new, l_new)
        chi2_new = eb_new.chi2

        delta = jnp.concatenate([dp.reshape(-1), dl.reshape(-1)])
        gvec = jnp.concatenate([eb.gp.reshape(-1), eb.gl.reshape(-1)])
        pred = lam * jnp.dot(delta, delta) - jnp.dot(delta, gvec)
        rho = (eb.chi2 - chi2_new) / jnp.maximum(pred, 1e-12)
        finite = jnp.isfinite(chi2_new) & jnp.all(jnp.isfinite(delta))
        accept = (rho > 0) & finite

        p = jnp.where(accept, p_new, p)
        l = jnp.where(accept, l_new, l)
        lam_acc = lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam = jnp.where(accept, lam_acc, lam * nu)
        nu = jnp.where(accept, 2.0, nu * 2.0)
        converged = accept & (
            (eb.chi2 - chi2_new) <= rel_tol * jnp.maximum(eb.chi2, 1e-12)
        )
        done = converged | (lam > 1e12)
        eb = jax.tree.map(lambda a, b: jnp.where(accept, a, b), eb_new, eb)
        return p, l, eb, lam, nu, it + 1, done

    init = (
        poses, landmarks, eb0, lam0, jnp.asarray(2.0, dtype),
        jnp.zeros((), jnp.int32), jnp.zeros((), bool),
    )
    p, l, eb_f, lam, _, it, _ = jax.lax.while_loop(cond, body, init)
    return p, l, LMStats(it, chi2_0, eb_f.chi2, lam), eb_f


class EllEdgesPlanes(NamedTuple):
    """EllEdges + SE3-plane edges in per-pose layout ([K, R4] slots)."""

    pt: EllEdges
    pl: jax.Array  # [K, R4] plane index per slot (0 where empty)
    pmeas: jax.Array  # [K, R4, 4]
    pinfo: jax.Array  # [K, R4, 3, 3], zeroed on empty slots


def build_ell_edges_planes(
    edge_args: tuple, plane_args: tuple, K: int, R3: int, R4: int
) -> EllEdgesPlanes:
    from semantic_slam_tpu.solver.assembly import build_slots

    pe_k, pe_p, pe_meas, pe_info, pe_mask = plane_args
    E3 = pe_k.shape[0]
    dtype = pe_meas.dtype
    slots = build_slots(pe_k, pe_mask, K, R4)
    valid = (slots >= 0).astype(dtype)

    def gat(a):
        ap = jnp.concatenate([a, jnp.zeros((1,) + a.shape[1:], a.dtype)])
        return ap[jnp.where(slots >= 0, slots, E3)]

    # empty slots carry a unit plane: a zero 4-vector NaNs the (masked)
    # plane-tangent jacobians, and NaN * 0 stays NaN (cf. build_ell_edges)
    unit = jnp.zeros((4,), dtype).at[2].set(1.0)
    return EllEdgesPlanes(
        pt=build_ell_edges(edge_args, K, R3),
        pl=gat(pe_p),
        pmeas=jnp.where(valid[:, :, None] > 0, gat(pe_meas), unit),
        pinfo=gat(pe_info) * valid[:, :, None, None],
    )


def ell_linearize_planes(
    poses,
    landmarks,
    planes,
    ee: EllEdgesPlanes,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    allreduce: Callable = lambda a: a,
    shard: tuple | None = None,
) -> EllBlocks:
    """Merged point+plane blocks in per-pose layout: plane slots append
    after the point slots with block ids offset by L, and everything
    downstream (matvec, schur step, marginals) runs UNCHANGED on the
    merged [K, R3+R4] grid — the per-pose analog of
    build_edge_blocks_with_planes.

    With ``shard=(offset, K_global)`` (cf. ell_linearize): ``ee`` holds this
    shard's contiguous row slice and the plane additions to the global
    gp/diag embed at the row offset and merge in the psum; Hll/gl plane
    rows and chi2 psum like the point part."""
    from semantic_slam_tpu.graph.planes import _plane_edge_jac

    L = landmarks.shape[0]
    Pl = planes.shape[0]
    R4 = ee.pl.shape[1]
    dtype = poses.dtype
    K = ee.pl.shape[0]  # local rows (== global K single-chip)

    eb = ell_linearize(
        poses, landmarks, ee.pt, robust_kind=robust_kind,
        robust_delta=robust_delta, allreduce=allreduce, shard=shard,
    )
    if shard is not None:
        poses_loc = jax.lax.dynamic_slice_in_dim(poses, shard[0], K, axis=0)
    else:
        poses_loc = poses

    pl_flat = ee.pl.reshape(-1)
    pw = _gather_l(pl_flat, planes, Pl).reshape(K, R4, 4)
    # inactive plane-table rows can be all-zero; substitute a unit plane
    # (the slot's info mask already zeroes its contribution)
    unit = jnp.zeros((4,), dtype).at[2].set(1.0)
    pw = jnp.where(
        jnp.sum(pw[..., :3] * pw[..., :3], axis=-1, keepdims=True) > 1e-12,
        pw, unit,
    )
    p_b = jnp.broadcast_to(poses_loc[:, None, :], (K, R4, poses.shape[1]))
    r_p, Jk, Jp = jax.vmap(jax.vmap(_plane_edge_jac))(p_b, pw, ee.pmeas)
    p_info = ee.pinfo
    chi_e = jnp.einsum("kra,krab,krb->kr", r_p, p_info, r_p)
    chi_p = jnp.sum(robust_rho(chi_e.reshape(-1), robust_kind, robust_delta))
    if robust_kind != "none":
        w = robust_weight(
            chi_e.reshape(-1), robust_kind, robust_delta
        ).astype(dtype).reshape(K, R4)
        p_info = p_info * w[:, :, None, None]
    JkT_O = jnp.einsum("krai,krab->krib", Jk, p_info)
    JpT_O = jnp.einsum("krai,krab->krib", Jp, p_info)
    H_kk_p = jnp.einsum("kria,kraj->krij", JkT_O, Jk)
    W_kp = jnp.einsum("kria,kraj->krij", JkT_O, Jp)
    H_pp = jnp.einsum("kria,kraj->krij", JpT_O, Jp)
    g_k = jnp.einsum("kria,kra->kri", JkT_O, r_p)
    g_p = jnp.einsum("kria,kra->kri", JpT_O, r_p)

    Hll_p = allreduce(
        _seg_sum_l(pl_flat, H_pp.reshape(K * R4, 9), Pl).reshape(Pl, 3, 3)
    )
    gl_p = allreduce(_seg_sum_l(pl_flat, g_p.reshape(K * R4, 3), Pl))
    if shard is not None:
        gp = eb.gp + allreduce(_dus_rows(g_k.sum(axis=1), shard[0], shard[1]))
        diag = eb.diag + allreduce(
            _dus_rows(H_kk_p.sum(axis=1), shard[0], shard[1])
        )
    else:
        gp = eb.gp + g_k.sum(axis=1)
        diag = eb.diag + H_kk_p.sum(axis=1)

    return EllBlocks(
        ll=jnp.concatenate([eb.ll, ee.pl + L], axis=1),
        H_ii=eb.H_ii, H_ij=eb.H_ij, H_jj=eb.H_jj,
        H_kk=jnp.concatenate([eb.H_kk, H_kk_p], axis=1),
        W_kl=jnp.concatenate([eb.W_kl, W_kp], axis=1),
        Hll=jnp.concatenate([eb.Hll, Hll_p]),
        gp=gp,
        gl=jnp.concatenate([eb.gl, gl_p]),
        diag=diag,
        chi2=eb.chi2 + allreduce(chi_p),
    )


def run_lm_loop_pcg_ellk_planes(
    poses,
    landmarks,
    planes,
    edge_args: tuple,
    plane_args: tuple,
    pose_free,
    lm_free,
    plane_free,
    max_iterations: int,
    rel_tol: float,
    max_cg_iters: int = 128,
    init_lambda_tau: float = 1e-5,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    precond_kind: str = "jacobi",
    init_lambda=0.0,
    prior=None,
    ell_rows: tuple = (1, 1, 8, 8),
    cg_tol: float = 1e-8,
    allreduce: Callable = lambda a: a,
    shard: tuple | None = None,
    ee: EllEdgesPlanes | None = None,
):
    """run_lm_loop_pcg_planes on the per-pose layout. Single-chip by
    default; under shard_map pass ``allreduce`` (psum),
    ``shard=(offset, K_global)`` and the shard's row slice ``ee`` (built
    globally outside the mesh) — pose-row sharding of the merged
    point+plane grid (cf. run_lm_loop_pcg_ellk)."""
    from semantic_slam_tpu.solver.plane_ba import plane_retract

    dtype = poses.dtype
    K = poses.shape[0]
    L = landmarks.shape[0]
    block_free = jnp.concatenate([lm_free, plane_free])
    if ee is None:
        ee = build_ell_edges_planes(
            edge_args, plane_args, K, ell_rows[2], ell_rows[3]
        )

    def build(p, l, pl):
        eb = ell_linearize_planes(
            p, l, pl, ee, robust_kind=robust_kind, robust_delta=robust_delta,
            allreduce=allreduce, shard=shard,
        )
        if prior is not None:
            eb = apply_prior_blocks_planes(eb, prior, p, l, pl)
        return eb

    eb0 = build(poses, landmarks, planes)
    chi2_0 = eb0.chi2
    diag_max = jnp.maximum(
        jnp.max(jnp.abs(jnp.diagonal(eb0.diag, axis1=-2, axis2=-1))),
        jnp.max(jnp.abs(jnp.diagonal(eb0.Hll, axis1=-2, axis2=-1))),
    )
    init_lambda = jnp.asarray(init_lambda, dtype)
    lam0 = jnp.where(
        init_lambda > 0, init_lambda, init_lambda_tau * jnp.maximum(diag_max, 1.0)
    ).astype(dtype)

    def retract_all(p, l, pl, dp, db):
        p2 = jax.vmap(geo.pose_retract)(p, dp.astype(p.dtype))
        l2 = l + db[:L].astype(l.dtype)
        pl2 = jax.vmap(plane_retract)(pl, db[L:].astype(pl.dtype))
        return p2, l2, pl2

    def cond(carry):
        _, _, _, _, _, _, it, done = carry
        return (it < max_iterations) & jnp.logical_not(done)

    def body(carry):
        p, l, pl, eb, lam, nu, it, done = carry
        dp, db = ell_schur_step(
            eb, lam, pose_free, block_free, max_cg_iters,
            precond_kind=precond_kind, prior=prior, cg_tol=cg_tol,
            allreduce=allreduce, shard=shard,
        )
        p_new, l_new, pl_new = retract_all(p, l, pl, dp, db)
        eb_new = build(p_new, l_new, pl_new)
        chi2_new = eb_new.chi2

        delta = jnp.concatenate([dp.reshape(-1), db.reshape(-1)])
        gvec = jnp.concatenate([eb.gp.reshape(-1), eb.gl.reshape(-1)])
        pred = lam * jnp.dot(delta, delta) - jnp.dot(delta, gvec)
        rho = (eb.chi2 - chi2_new) / jnp.maximum(pred, 1e-12)
        finite = jnp.isfinite(chi2_new) & jnp.all(jnp.isfinite(delta))
        accept = (rho > 0) & finite

        p = jnp.where(accept, p_new, p)
        l = jnp.where(accept, l_new, l)
        pl = jnp.where(accept, pl_new, pl)
        lam_acc = lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam = jnp.where(accept, lam_acc, lam * nu)
        nu = jnp.where(accept, 2.0, nu * 2.0)
        converged = accept & (
            (eb.chi2 - chi2_new) <= rel_tol * jnp.maximum(eb.chi2, 1e-12)
        )
        done = converged | (lam > 1e12)
        eb = jax.tree.map(lambda a, b: jnp.where(accept, a, b), eb_new, eb)
        return p, l, pl, eb, lam, nu, it + 1, done

    init = (
        poses, landmarks, planes, eb0, lam0,
        jnp.asarray(2.0, dtype), jnp.zeros((), jnp.int32), jnp.zeros((), bool),
    )
    p, l, pl, eb_f, lam, _, it, _ = jax.lax.while_loop(cond, body, init)
    return p, l, pl, LMStats(it, chi2_0, eb_f.chi2, lam), eb_f


def landmark_marginals_mf_ellk(
    eb: EllBlocks, pose_free, block_free, prior=None,
    allreduce: Callable = lambda a: a, shard: tuple | None = None,
) -> jax.Array:
    """landmark_marginals_mf on per-pose-layout blocks: the chain
    tridiagonal reads off directly, and the W columns assemble per slot.

    With ``shard=(offset, K_global)`` (pose-row sharding, cf. ell_matvec):
    ``eb`` holds this shard's row slice; diag/Hll are already global
    (ell_linearize psums them), the [K,6,3B] W columns and [K,6,6] chain
    couplings psum ONCE here, and the bounded-B dense tail runs replicated
    on every shard — the maha-profile (graph_slam.cpp:221-234) recovery at
    the pose-row fast-path layout, closing r3's ``not with_marginals``
    exclusion."""
    from semantic_slam_tpu.solver import tridiag as td

    Kb, R = eb.ll.shape
    Kg = pose_free.shape[0]
    B = eb.Hll.shape[0]
    dtype = eb.gp.dtype
    pf = pose_free.astype(dtype)
    lmf = block_free.astype(dtype)
    eye6 = jnp.eye(6, dtype=dtype)

    Dm = eb.diag * pf[:, None, None] + eye6[None] * (1.0 - pf)[:, None, None]
    fac = td.pcr_factor(Dm, _ell_chain_upper_g(eb, pose_free, allreduce, shard))

    if shard is not None:
        pf_loc = jax.lax.dynamic_slice_in_dim(pf, shard[0], Kb, axis=0)
    else:
        pf_loc = pf
    w_e = pf_loc[:, None] * lmf[eb.ll]  # [Kb, R]
    W_m = eb.W_kl * w_e[:, :, None, None]
    OlmK = _onehot_l(eb.ll.reshape(-1), B, dtype).reshape(Kb, R, B)
    U = jnp.einsum("krb,krxy->kxby", OlmK, W_m).reshape(Kb, 6, 3 * B)
    if shard is not None:
        U = allreduce(_dus_rows(U, shard[0], Kg))
    return _sigma_from_chain_parts(
        fac, U, eb.Hll, pose_free, block_free, prior, dtype
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


@partial(jax.jit, static_argnames=("assembly", "ell_rows"))
def landmark_marginals_graph(
    g: GraphState, prior=None, assembly: str = "auto",
    ell_rows: tuple | None = None,
) -> jax.Array:
    """Matrix-free marginals at the CURRENT graph estimate (fresh edge-block
    build) — the PCG analog of ``lm.landmark_marginals`` for on-demand
    recovery (e.g. exporting covariances on profiles whose ticks skip it)."""
    from semantic_slam_tpu.solver.assembly import (
        build_slots, onehot, resolve_assembly,
    )

    pose_free, lm_free = _free_masks(g)
    edge_args = _edge_args(g)
    K = g.poses.shape[0]
    L = g.landmarks.shape[0]
    oh = None
    kind = resolve_assembly(assembly, ell_ok=ell_rows is not None)
    if kind == "ell":
        # per-pose layout end to end (build + recovery)
        ee = build_ell_edges(edge_args, K, ell_rows[2])
        ebk = ell_linearize(g.poses, g.landmarks, ee)
        if prior is not None:
            ebk = apply_prior_blocks(ebk, prior, g.poses, g.landmarks)
        return landmark_marginals_mf_ellk(ebk, pose_free, lm_free, prior=prior)
    if kind == "matmul":
        oh = OneHots(
            Oi=onehot(edge_args[0], K, g.poses.dtype),
            Oj=onehot(edge_args[1], K, g.poses.dtype),
            Ok=onehot(edge_args[5], K, g.poses.dtype),
            Ol=onehot(edge_args[6], L, g.poses.dtype),
        )
    eb = build_edge_blocks(
        g.poses, g.landmarks, *edge_args, lambda x: x, oh=oh
    )
    if prior is not None:
        eb = apply_prior_blocks(eb, prior, g.poses, g.landmarks)
    return landmark_marginals_mf(eb, pose_free, lm_free, prior=prior)


@partial(
    jax.jit,
    static_argnames=(
        "max_iterations", "min_edges", "rel_tol", "max_cg_iters",
        "robust_kind", "robust_delta", "precond_kind", "assembly",
        "with_marginals", "ell_rows", "cg_tol",
    ),
)
def lm_optimize_pcg(
    g: GraphState,
    max_iterations: int = 64,
    min_edges: int = 10,
    rel_tol: float = 1e-6,
    max_cg_iters: int = 128,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    init_lambda=0.0,
    precond_kind: str = "jacobi",
    prior=None,
    assembly: str = "auto",
    with_marginals: bool = False,
    ell_rows: tuple | None = None,
    cg_tol: float = 1e-8,
):
    """Single-chip matrix-free LM (drop-in for lm_optimize).

    ``with_marginals=True`` additionally returns landmark marginals computed
    matrix-free from the loop's final accepted edge blocks (prior included
    when one is passed) — no dense [6K,6K] factor on any maha+pcg tick.
    ``ell_rows`` enables the ELL assembly; single-chip this is the per-pose
    layout (run_lm_loop_pcg_ellk — broadcast/sum pose ops, no gathers or
    [E,K] one-hots)."""
    from semantic_slam_tpu.solver.assembly import resolve_assembly

    pose_free, lm_free = _free_masks(g)
    kind = resolve_assembly(assembly, ell_ok=ell_rows is not None)
    if kind == "ell":
        poses, landmarks, stats, eb_f = run_lm_loop_pcg_ellk(
            g.poses, g.landmarks, _edge_args(g), pose_free, lm_free,
            max_iterations, rel_tol, max_cg_iters,
            robust_kind=robust_kind, robust_delta=robust_delta,
            init_lambda=init_lambda, precond_kind=precond_kind, prior=prior,
            ell_rows=ell_rows, cg_tol=cg_tol,
        )
    else:
        poses, landmarks, stats, eb_f = run_lm_loop_pcg(
            g.poses, g.landmarks, _edge_args(g), pose_free, lm_free,
            lambda x: x, max_iterations, rel_tol, max_cg_iters,
            robust_kind=robust_kind, robust_delta=robust_delta,
            init_lambda=init_lambda, precond_kind=precond_kind, prior=prior,
            assembly=kind, cg_tol=cg_tol,
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
        if kind == "ell":
            marg = landmark_marginals_mf_ellk(
                eb_f, pose_free, lm_free, prior=prior
            )
        else:
            marg = landmark_marginals_mf(eb_f, pose_free, lm_free, prior=prior)
        return g, stats, marg
    return g, stats


# ---------------------------------------------------------------------------
# Plane-extended matrix-free path (planar-patch mode on the scaling solver)
# ---------------------------------------------------------------------------


def build_edge_blocks_with_planes(
    poses,
    landmarks,
    planes,
    edge_args: tuple,
    plane_args: tuple,
    allreduce: Callable,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    oh: OneHots | None = None,
) -> EdgeBlocks:
    """Point edge blocks + SE3-plane edge blocks merged into ONE landmark
    block system: plane blocks are 3-dof (2 normal-tangent + offset) exactly
    like point blocks, so they append at indices ``L..L+Pl`` and the reduced
    camera operator/preconditioner are reused untouched (the matrix-free
    analog of ``graph/planes.linearize_with_planes``). ``oh`` holds MERGED
    selections (point rows first, then plane rows)."""
    from semantic_slam_tpu.graph.planes import _plane_edge_jac

    K = poses.shape[0]
    L = landmarks.shape[0]
    Pl = planes.shape[0]
    dtype = poses.dtype

    eb = build_edge_blocks(
        poses, landmarks, *edge_args, allreduce,
        robust_kind=robust_kind, robust_delta=robust_delta, oh=oh,
    )

    pe_k, pe_p, pe_meas, pe_info, pe_mask = plane_args
    pm = pe_mask.astype(dtype)
    p_info = pe_info * pm[:, None, None]
    r_p, Jk, Jp = jax.vmap(_plane_edge_jac)(poses[pe_k], planes[pe_p], pe_meas)
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

    if oh is not None:
        E2 = edge_args[5].shape[0]
        Opk = oh.Ok[E2:]  # [E3, K]
        Opl = oh.Ol[E2:, L:]  # [E3, Pl]
        Hll_p = jnp.einsum("ep,eij->pij", Opl, H_pp)
        gl_p = jnp.einsum("ep,ei->pi", Opl, g_p)
        gp_add = jnp.einsum("ek,ei->ki", Opk, g_k)
        diag_add = jnp.einsum("ek,eij->kij", Opk, H_kk)
    else:
        Hll_p = jnp.zeros((Pl, 3, 3), dtype).at[pe_p].add(H_pp)
        gl_p = jnp.zeros((Pl, 3), dtype).at[pe_p].add(g_p)
        gp_add = jnp.zeros((K, 6), dtype).at[pe_k].add(g_k)
        diag_add = jnp.zeros((K, 6, 6), dtype).at[pe_k].add(H_kk)

    return EdgeBlocks(
        oi=eb.oi,
        oj=eb.oj,
        H_ii=eb.H_ii,
        H_ij=eb.H_ij,
        H_jj=eb.H_jj,
        lk=jnp.concatenate([eb.lk, pe_k]),
        ll=jnp.concatenate([eb.ll, pe_p + L]),
        H_kk=jnp.concatenate([eb.H_kk, H_kk]),
        W_kl=jnp.concatenate([eb.W_kl, W_kp]),
        Hll=jnp.concatenate([eb.Hll, allreduce(Hll_p)]),
        gp=eb.gp + allreduce(gp_add),
        gl=jnp.concatenate([eb.gl, allreduce(gl_p)]),
        diag=eb.diag + allreduce(diag_add),
        chi2=eb.chi2 + allreduce(chi_p),
    )


def run_lm_loop_pcg_planes(
    poses,
    landmarks,
    planes,
    edge_args: tuple,
    plane_args: tuple,
    pose_free,
    lm_free,
    plane_free,
    allreduce: Callable,
    max_iterations: int,
    rel_tol: float,
    max_cg_iters: int = 128,
    init_lambda_tau: float = 1e-5,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    precond_kind: str = "jacobi",
    init_lambda=0.0,
    prior=None,
    assembly: str = "auto",
):
    """Nielsen-damped LM over poses + point landmarks + plane landmarks with
    the matrix-free PCG inner solver (scaling-path analog of
    ``graph/planes.lm_optimize_with_planes``). ``prior`` (fixed-lag
    MarginalPrior incl. plane part) is folded into every linearization.
    ``assembly`` picks 'matmul' one-hots or 'scatter' ('ell' resolves to
    the backend default — the per-pose fast path has its own loop,
    run_lm_loop_pcg_ellk_planes)."""
    from semantic_slam_tpu.solver.assembly import onehot, resolve_assembly
    from semantic_slam_tpu.solver.plane_ba import plane_retract

    dtype = poses.dtype
    K = poses.shape[0]
    L = landmarks.shape[0]
    Pl = planes.shape[0]
    block_free = jnp.concatenate([lm_free, plane_free])
    pe_k, pe_p = plane_args[0], plane_args[1]

    oh = None
    kind = resolve_assembly(assembly, ell_ok=False)
    if kind == "matmul":
        # merged observation selection: point edges hit blocks [0,L),
        # plane edges the appended blocks [L, L+Pl)
        oh = OneHots(
            Oi=onehot(edge_args[0], K, dtype),
            Oj=onehot(edge_args[1], K, dtype),
            Ok=onehot(jnp.concatenate([edge_args[5], pe_k]), K, dtype),
            Ol=onehot(
                jnp.concatenate([edge_args[6], pe_p + L]), L + Pl, dtype
            ),
        )

    def build(p, l, pl):
        eb = build_edge_blocks_with_planes(
            p, l, pl, edge_args, plane_args, allreduce,
            robust_kind=robust_kind, robust_delta=robust_delta, oh=oh,
        )
        if prior is not None:
            eb = apply_prior_blocks_planes(eb, prior, p, l, pl)
        return eb

    eb0 = build(poses, landmarks, planes)
    chi2_0 = eb0.chi2
    diag_max = jnp.maximum(
        jnp.max(jnp.abs(jnp.diagonal(eb0.diag, axis1=-2, axis2=-1))),
        jnp.max(jnp.abs(jnp.diagonal(eb0.Hll, axis1=-2, axis2=-1))),
    )
    init_lambda = jnp.asarray(init_lambda, dtype)
    lam0 = jnp.where(
        init_lambda > 0, init_lambda, init_lambda_tau * jnp.maximum(diag_max, 1.0)
    ).astype(dtype)

    def retract_all(p, l, pl, dp, db):
        p2 = jax.vmap(geo.pose_retract)(p, dp.astype(p.dtype))
        l2 = l + db[:L].astype(l.dtype)
        pl2 = jax.vmap(plane_retract)(pl, db[L:].astype(pl.dtype))
        return p2, l2, pl2

    def cond(carry):
        _, _, _, _, _, _, it, done = carry
        return (it < max_iterations) & jnp.logical_not(done)

    def body(carry):
        p, l, pl, eb, lam, nu, it, done = carry
        dp, db = schur_pcg_step(
            eb, lam, pose_free, block_free, allreduce, max_cg_iters,
            precond_kind=precond_kind, prior=prior, oh=oh,
        )
        p_new, l_new, pl_new = retract_all(p, l, pl, dp, db)
        # speculative relinearization at the trial point (see run_lm_loop_pcg)
        eb_new = build(p_new, l_new, pl_new)
        chi2_new = eb_new.chi2

        delta = jnp.concatenate([dp.reshape(-1), db.reshape(-1)])
        gvec = jnp.concatenate([eb.gp.reshape(-1), eb.gl.reshape(-1)])
        pred = lam * jnp.dot(delta, delta) - jnp.dot(delta, gvec)
        rho = (eb.chi2 - chi2_new) / jnp.maximum(pred, 1e-12)
        finite = jnp.isfinite(chi2_new) & jnp.all(jnp.isfinite(delta))
        accept = (rho > 0) & finite

        p = jnp.where(accept, p_new, p)
        l = jnp.where(accept, l_new, l)
        pl = jnp.where(accept, pl_new, pl)
        lam_acc = lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam = jnp.where(accept, lam_acc, lam * nu)
        nu = jnp.where(accept, 2.0, nu * 2.0)
        converged = accept & (
            (eb.chi2 - chi2_new) <= rel_tol * jnp.maximum(eb.chi2, 1e-12)
        )
        done = converged | (lam > 1e12)
        eb = jax.tree.map(lambda a, b: jnp.where(accept, a, b), eb_new, eb)
        return p, l, pl, eb, lam, nu, it + 1, done

    init = (
        poses, landmarks, planes, eb0, lam0,
        jnp.asarray(2.0, dtype), jnp.zeros((), jnp.int32), jnp.zeros((), bool),
    )
    p, l, pl, eb_f, lam, _, it, _ = jax.lax.while_loop(cond, body, init)
    return p, l, pl, LMStats(it, chi2_0, eb_f.chi2, lam), eb_f


@partial(
    jax.jit,
    static_argnames=(
        "max_iterations", "min_edges", "rel_tol", "max_cg_iters",
        "robust_kind", "robust_delta", "precond_kind", "assembly",
        "with_marginals", "ell_rows",
    ),
)
def lm_optimize_pcg_planes(
    g: GraphState,
    pn,
    max_iterations: int = 64,
    min_edges: int = 10,
    rel_tol: float = 1e-6,
    max_cg_iters: int = 128,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    precond_kind: str = "jacobi",
    init_lambda=0.0,
    prior=None,
    assembly: str = "auto",
    with_marginals: bool = False,
    ell_rows: tuple | None = None,
):
    """Single-chip matrix-free planar-patch LM (drop-in for
    ``graph/planes.lm_optimize_with_planes`` on the scaling path).
    ``with_marginals=True`` also returns the POINT-landmark marginal blocks
    (the first L of the merged point+plane block system) computed
    matrix-free from the final edge blocks. ``ell_rows`` (a 4-tuple —
    (R_oi, R_oj, R_lk, R_pe)) selects the per-pose ELL fast path."""
    from semantic_slam_tpu.solver.assembly import resolve_assembly

    pose_free, lm_free = _free_masks(g)
    plane_args = (pn.pe_k, pn.pe_p, pn.pe_meas, pn.pe_info, pn.pe_mask())
    kind = resolve_assembly(
        assembly, ell_ok=ell_rows is not None and len(ell_rows) >= 4
    )
    if kind == "ell":
        poses, landmarks, planes, stats, eb_f = run_lm_loop_pcg_ellk_planes(
            g.poses, g.landmarks, pn.planes, _edge_args(g), plane_args,
            pose_free, lm_free, pn.plane_mask(),
            max_iterations, rel_tol, max_cg_iters,
            robust_kind=robust_kind, robust_delta=robust_delta,
            precond_kind=precond_kind, init_lambda=init_lambda, prior=prior,
            ell_rows=ell_rows,
        )
    else:
        poses, landmarks, planes, stats, eb_f = run_lm_loop_pcg_planes(
            g.poses, g.landmarks, pn.planes, _edge_args(g), plane_args,
            pose_free, lm_free, pn.plane_mask(), lambda x: x,
            max_iterations, rel_tol, max_cg_iters,
            robust_kind=robust_kind, robust_delta=robust_delta,
            precond_kind=precond_kind, init_lambda=init_lambda, prior=prior,
            assembly=kind,
        )
    run = (g.num_edges() + pn.num_pe) >= min_edges
    g = g._replace(
        poses=jnp.where(run, poses, g.poses),
        landmarks=jnp.where(run, landmarks, g.landmarks),
    )
    pn = pn._replace(planes=jnp.where(run, planes, pn.planes))
    stats = LMStats(
        iterations=jnp.where(run, stats.iterations, 0),
        chi2_initial=stats.chi2_initial,
        chi2_final=jnp.where(run, stats.chi2_final, stats.chi2_initial),
        lambda_final=stats.lambda_final,
    )
    if with_marginals:
        L = g.landmarks.shape[0]
        block_free = jnp.concatenate([lm_free, pn.plane_mask()])
        if kind == "ell":
            marg = landmark_marginals_mf_ellk(
                eb_f, pose_free, block_free, prior=prior
            )[:L]
        else:
            marg = landmark_marginals_mf(
                eb_f, pose_free, block_free, prior=prior
            )[:L]
        return g, pn, stats, marg
    return g, pn, stats


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "axis_name", "max_iterations", "min_edges", "rel_tol",
        "max_cg_iters", "precond_kind", "assembly", "ell_rows",
        "with_marginals", "robust_kind", "robust_delta", "cg_tol",
    ),
)
def sharded_lm_optimize_pcg_planes(
    g: GraphState,
    pn,
    mesh,
    axis_name: str = "shard",
    max_iterations: int = 64,
    min_edges: int = 10,
    rel_tol: float = 1e-6,
    max_cg_iters: int = 128,
    precond_kind: str = "jacobi",
    prior=None,
    assembly: str = "auto",
    ell_rows: tuple | None = None,
    with_marginals: bool = False,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    init_lambda=0.0,
    cg_tol: float = 1e-8,
):
    """Edge-sharded planar-patch LM: odometry, point-observation AND plane
    edges all sharded over the mesh; node arrays replicated; psum traffic per
    CG step is [6K] + [3(L+Pl)]. ``prior`` (fixed-lag MarginalPrior incl.
    plane part) is replicated; its blocks are folded post-psum on every
    shard. With ``ell_rows`` (a 4-tuple) and K divisible by the mesh, the
    solve runs on the merged point+plane per-pose grid sharded by POSE ROWS
    — the r3 fast-path layout now covering the planes profiles too.
    ``with_marginals=True`` additionally returns the POINT-landmark marginal
    blocks ([:L] of the merged system), recovered matrix-free inside the
    mesh."""
    from jax.sharding import PartitionSpec as P

    from semantic_slam_tpu.solver.assembly import resolve_assembly

    n = mesh.shape[axis_name]
    assert (
        g.odom_i.shape[0] % n == 0
        and g.lme_k.shape[0] % n == 0
        and pn.pe_k.shape[0] % n == 0
    )

    pose_free, lm_free = _free_masks(g)
    L = g.landmarks.shape[0]
    edge_args = _edge_args(g)
    plane_args = (pn.pe_k, pn.pe_p, pn.pe_meas, pn.pe_info, pn.pe_mask())
    block_free = jnp.concatenate([lm_free, pn.plane_mask()])

    kind = resolve_assembly(
        assembly, ell_ok=ell_rows is not None and len(ell_rows) >= 4
    )
    if kind == "ell" and g.poses.shape[0] % n != 0:
        kind = "matmul"  # pose-row sharding needs K divisible by the mesh

    prior_spec = None if prior is None else type(prior)(*(P() for _ in prior))

    if kind == "ell":
        K = g.poses.shape[0]
        Kb = K // n
        ee = build_ell_edges_planes(
            edge_args, plane_args, K, ell_rows[2], ell_rows[3]
        )

        def body_ell(
            poses, landmarks, planes, pose_free, lm_free, plane_free,
            prior, ee_loc,
        ):
            off = jax.lax.axis_index(axis_name) * Kb
            ar = lambda a: jax.lax.psum(a, axis_name)
            p, l, pl, stats, eb_f = run_lm_loop_pcg_ellk_planes(
                poses, landmarks, planes, (), (), pose_free, lm_free,
                plane_free, max_iterations, rel_tol, max_cg_iters,
                robust_kind=robust_kind, robust_delta=robust_delta,
                init_lambda=init_lambda, cg_tol=cg_tol,
                precond_kind=precond_kind, prior=prior, ell_rows=ell_rows,
                allreduce=ar, shard=(off, K), ee=ee_loc,
            )
            if with_marginals:
                bf = jnp.concatenate([lm_free, plane_free])
                marg = landmark_marginals_mf_ellk(
                    eb_f, pose_free, bf, prior=prior, allreduce=ar,
                    shard=(off, K),
                )[:L]
                return p, l, pl, stats, marg
            return p, l, pl, stats

        def body_ell_np(
            poses, landmarks, planes, pose_free, lm_free, plane_free, ee_loc
        ):
            return body_ell(
                poses, landmarks, planes, pose_free, lm_free, plane_free,
                None, ee_loc,
            )

        ee_spec = EllEdgesPlanes(
            pt=EllEdges(*(P(axis_name) for _ in ee.pt)),
            pl=P(axis_name), pmeas=P(axis_name), pinfo=P(axis_name),
        )
        out_specs = (P(), P(), P(), LMStats(P(), P(), P(), P()))
        if with_marginals:
            out_specs = out_specs + (P(),)
        node_specs = (P(), P(), P(), P(), P(), P())
        sharded = jax.shard_map(
            body_ell_np if prior is None else body_ell,
            mesh=mesh,
            in_specs=(
                node_specs + ((ee_spec,) if prior is None
                              else (prior_spec, ee_spec))
            ),
            out_specs=out_specs,
            check_vma=False,
        )
        node_args = (
            g.poses, g.landmarks, pn.planes, pose_free, lm_free,
            pn.plane_mask(),
        )
        out = (
            sharded(*node_args, ee)
            if prior is None
            else sharded(*node_args, prior, ee)
        )
        poses, landmarks, planes, stats = out[0], out[1], out[2], out[3]
        marg = out[4] if with_marginals else None
    else:
        def body(
            poses, landmarks, planes, pose_free, lm_free, plane_free,
            prior, edges, pargs,
        ):
            ar = lambda x: jax.lax.psum(x, axis_name)
            p, l, pl, stats, eb_f = run_lm_loop_pcg_planes(
                poses, landmarks, planes, edges, pargs, pose_free, lm_free,
                plane_free, ar,
                max_iterations, rel_tol, max_cg_iters,
                robust_kind=robust_kind, robust_delta=robust_delta,
                init_lambda=init_lambda,
                precond_kind=precond_kind, prior=prior, assembly=kind,
            )
            if with_marginals:
                bf = jnp.concatenate([lm_free, plane_free])
                marg = landmark_marginals_mf(
                    eb_f, pose_free, bf, ar, prior=prior
                )[:L]
                return p, l, pl, stats, marg
            return p, l, pl, stats

        def body_no_prior(
            poses, landmarks, planes, pose_free, lm_free, plane_free,
            edges, pargs,
        ):
            return body(
                poses, landmarks, planes, pose_free, lm_free, plane_free,
                None, edges, pargs,
            )

        node_specs = (P(), P(), P(), P(), P(), P())
        e_specs = (
            tuple(P(axis_name) for _ in edge_args),
            tuple(P(axis_name) for _ in plane_args),
        )
        out_specs = (P(), P(), P(), LMStats(P(), P(), P(), P()))
        if with_marginals:
            out_specs = out_specs + (P(),)
        sharded = jax.shard_map(
            body_no_prior if prior is None else body,
            mesh=mesh,
            in_specs=(
                node_specs + e_specs
                if prior is None
                else node_specs + (prior_spec,) + e_specs
            ),
            out_specs=out_specs,
            check_vma=False,
        )
        node_args = (
            g.poses, g.landmarks, pn.planes, pose_free, lm_free,
            pn.plane_mask(),
        )
        if prior is None:
            out = sharded(*node_args, edge_args, plane_args)
        else:
            out = sharded(*node_args, prior, edge_args, plane_args)
        poses, landmarks, planes, stats = out[0], out[1], out[2], out[3]
        marg = out[4] if with_marginals else None

    run = (g.num_edges() + pn.num_pe) >= min_edges
    g = g._replace(
        poses=jnp.where(run, poses, g.poses),
        landmarks=jnp.where(run, landmarks, g.landmarks),
    )
    pn = pn._replace(planes=jnp.where(run, planes, pn.planes))
    stats = LMStats(
        iterations=jnp.where(run, stats.iterations, 0),
        chi2_initial=stats.chi2_initial,
        chi2_final=jnp.where(run, stats.chi2_final, stats.chi2_initial),
        lambda_final=stats.lambda_final,
    )
    if with_marginals:
        return g, pn, stats, marg
    return g, pn, stats


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "axis_name", "max_iterations", "min_edges", "rel_tol",
        "max_cg_iters", "precond_kind", "assembly", "with_marginals",
        "ell_rows", "robust_kind", "robust_delta", "cg_tol",
    ),
)
def sharded_lm_optimize_pcg(
    g: GraphState,
    mesh,
    axis_name: str = "shard",
    max_iterations: int = 64,
    min_edges: int = 10,
    rel_tol: float = 1e-6,
    max_cg_iters: int = 128,
    precond_kind: str = "jacobi",
    prior=None,
    assembly: str = "auto",
    with_marginals: bool = False,
    ell_rows: tuple | None = None,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    init_lambda=0.0,
    cg_tol: float = 1e-8,
):
    """Edge-sharded matrix-free LM: ~[6K]+[3L] of psum traffic per CG step.
    ``prior`` (fixed-lag MarginalPrior) is replicated; its blocks are folded
    post-psum on every shard. ``with_marginals=True`` runs the matrix-free
    marginal recovery inside the mesh from the final shard-local edge blocks
    (one [K,6,3L]-class psum per recovery, not per step) and returns the
    replicated [L,3,3] blocks.

    With ``ell_rows`` (and no marginals) the solve runs on the per-pose ELL
    grid sharded by POSE ROWS: the grid is built once outside the mesh,
    each shard owns a contiguous [K/n, R] slice, CG state is replicated and
    the matvec distributed — identical [6K]+[3L] collective sizes, but the
    shard-local compute is the broadcast/sum fast path instead of
    slot gathers."""
    from jax.sharding import PartitionSpec as P

    from semantic_slam_tpu.solver.assembly import resolve_assembly

    n = mesh.shape[axis_name]
    assert g.odom_i.shape[0] % n == 0 and g.lme_k.shape[0] % n == 0

    pose_free, lm_free = _free_masks(g)
    edge_args = _edge_args(g)

    kind = resolve_assembly(assembly, ell_ok=ell_rows is not None)
    if kind == "ell" and g.poses.shape[0] % n != 0:
        kind = "matmul"  # pose-row sharding needs K divisible by the mesh
    if kind == "ell":
        K = g.poses.shape[0]
        Kb = K // n
        ee = build_ell_edges(edge_args, K, ell_rows[2])

        def body_ell(poses, landmarks, pose_free, lm_free, prior, ee_loc):
            off = jax.lax.axis_index(axis_name) * Kb
            ar = lambda a: jax.lax.psum(a, axis_name)
            p, l, stats, eb_f = run_lm_loop_pcg_ellk(
                poses, landmarks, (), pose_free, lm_free,
                max_iterations, rel_tol, max_cg_iters,
                robust_kind=robust_kind, robust_delta=robust_delta,
                init_lambda=init_lambda, cg_tol=cg_tol,
                precond_kind=precond_kind, prior=prior, ell_rows=ell_rows,
                allreduce=ar, shard=(off, K), ee=ee_loc,
            )
            if with_marginals:
                marg = landmark_marginals_mf_ellk(
                    eb_f, pose_free, lm_free, prior=prior,
                    allreduce=ar, shard=(off, K),
                )
                return p, l, stats, marg
            return p, l, stats

        def body_ell_np(poses, landmarks, pose_free, lm_free, ee_loc):
            return body_ell(poses, landmarks, pose_free, lm_free, None, ee_loc)

        prior_spec = (
            None if prior is None else type(prior)(*(P() for _ in prior))
        )
        ee_spec = EllEdges(*(P(axis_name) for _ in ee))
        out_specs = (P(), P(), LMStats(P(), P(), P(), P()))
        if with_marginals:
            out_specs = out_specs + (P(),)
        sharded = jax.shard_map(
            body_ell_np if prior is None else body_ell,
            mesh=mesh,
            in_specs=(
                (P(), P(), P(), P()) + ((ee_spec,) if prior is None
                                        else (prior_spec, ee_spec))
            ),
            out_specs=out_specs,
            check_vma=False,
        )
        if prior is None:
            out = sharded(g.poses, g.landmarks, pose_free, lm_free, ee)
        else:
            out = sharded(g.poses, g.landmarks, pose_free, lm_free, prior, ee)
        poses, landmarks, stats = out[0], out[1], out[2]
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
            return g, stats, out[3]
        return g, stats

    def body(poses, landmarks, pose_free, lm_free, prior, *edges):
        allreduce = lambda x: jax.lax.psum(x, axis_name)
        p, l, stats, eb_f = run_lm_loop_pcg(
            poses, landmarks, edges, pose_free, lm_free,
            allreduce, max_iterations, rel_tol,
            max_cg_iters, robust_kind=robust_kind, robust_delta=robust_delta,
            init_lambda=init_lambda, cg_tol=cg_tol,
            precond_kind=precond_kind, prior=prior,
            assembly=kind,
        )
        if with_marginals:
            marg = landmark_marginals_mf(
                eb_f, pose_free, lm_free, allreduce, prior=prior
            )
            return p, l, stats, marg
        return p, l, stats

    e_spec = tuple(P(axis_name) for _ in edge_args)
    prior_spec = (
        None if prior is None else type(prior)(*(P() for _ in prior))
    )
    def body_no_prior(poses, landmarks, pose_free, lm_free, *edges):
        return body(poses, landmarks, pose_free, lm_free, None, *edges)

    out_specs = (P(), P(), LMStats(P(), P(), P(), P()))
    if with_marginals:
        out_specs = out_specs + (P(),)
    sharded = jax.shard_map(
        body_no_prior if prior is None else body,
        mesh=mesh,
        in_specs=(
            (P(), P(), P(), P()) + e_spec
            if prior is None
            else (P(), P(), P(), P(), prior_spec) + e_spec
        ),
        out_specs=out_specs,
        check_vma=False,
    )
    if prior is None:
        out = sharded(g.poses, g.landmarks, pose_free, lm_free, *edge_args)
    else:
        out = sharded(
            g.poses, g.landmarks, pose_free, lm_free, prior, *edge_args
        )
    poses, landmarks, stats = out[0], out[1], out[2]

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
        return g, stats, out[3]
    return g, stats
