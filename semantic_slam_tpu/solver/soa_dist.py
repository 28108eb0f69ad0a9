"""Distributed / large-K SoA LM loop: replicated CG state, shard-local
edge primitives, tiled Pallas kernels where they fit.

This is the host orchestration around ``solver/pallas_tiled.py`` that
closes the r4 verdict's two structural gaps:

  * ``lm_optimize_soa_tiled``  — single-chip K > 4096: the tiled kernels
    with identity reductions (the resident kernels' Mosaic envelope ends
    at K=4096; the XLA SoA loop that served K=8192 ran 6.6 ms/iter).
  * ``sharded_lm_optimize_soa`` — the mesh path at SoA/kernel rates:
    pose rows sharded over the mesh, landmarks replicated, psums exactly
    where the single-chip host has identity.

Distribution scheme (same collective sizes as the r3 sharded ELL path —
docs/SCALING.md accounting still applies):

  * poses / landmarks / CG state are REPLICATED [*, K]/[L, *]; each shard
    owns a contiguous [Kl = K/n] row block of the edge primitives.
  * per CG step: one [3L]-class psum (the landmark reduction T after
    ``mv_fwd``) and one [12K]-class psum (the pose update u + the chain
    j-column vj after ``mv_bwd``). The chain's cross-shard spill is exact:
    shards emit vj unshifted, the host applies the pose-axis shift on the
    POST-psum replicated array, so row Kl-1 of shard s lands on row 0 of
    shard s+1 with no halo exchange.
  * per linearization: one fused psum of the embedded gp/gj parts,
    diag/Hjj parts, the [L,3]/[L,9] landmark tables, and chi2. The
    fixed-lag prior is folded into the replicated post-psum state on
    every shard identically (same rule as pcg.apply_prior_blocks).

Both a pure-XLA channel-math implementation (any backend — the CPU-mesh
test path, and TPU shards below the kernel tile) and the tiled-kernel
implementation share this host code; the choice is static at trace time.

LM semantics are ``ellk_soa.run_lm_loop_soa``'s (Nielsen damping, chi2-only
trial evaluation, (p, l, chi2, lam) carry). Reference:
graph_slam.cpp:182-219 (the lm_var loop) scaled over the mesh
(semantic_graph_slam.cpp:58-102).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from semantic_slam_tpu.core import geometry as geo
from semantic_slam_tpu.graph.state import GraphState
from semantic_slam_tpu.solver import chain_soa as chs
from semantic_slam_tpu.solver import pallas_tiled as pt
from semantic_slam_tpu.solver.ellk_soa import (
    _gather_oh,
    _m33_vec,
    _m33T_vec,
    _m66_vec,
    _m66T_vec,
    _cross,
    _ob_product,
    _hat_mul,
    _assemble_h66,
    _seg_sum_oh,
    _rotmat_conj_channels,
    _shift_down_soa,
)
from semantic_slam_tpu.solver.lm import LMStats, _free_masks
from semantic_slam_tpu.solver.pallas_cg import _inv33_ch, _inv66_ch, digit_split
from semantic_slam_tpu.solver.pcg import (
    EllEdges,
    _edge_args,
    build_ell_edges,
    landmark_marginals_mf_ellk,
)
from semantic_slam_tpu.solver.robust import robust_rho, robust_weight


class DistEdges(NamedTuple):
    """Shard-local edge data. Tiled-kernel layout fields are always built;
    the XLA-fallback one-hot factors only when the fallback is in use
    (the unused branch is dead code under jit)."""

    ll: jax.Array        # [Kl, R]
    meas_t: jax.Array    # [R, 3, Kl]
    info_t: jax.Array    # [R, 9, Kl]
    lodig: jax.Array     # [R, 1, Kl] i32 (digit_split(L) split)
    hidig: jax.Array     # [R, 1, Kl] i32
    omt: jax.Array       # [3, Kl]
    omq: jax.Array       # [4, Kl]
    oO: jax.Array        # [6, 6, Kl]
    oh_lo: jax.Array | None  # [El, lo_w_x] XLA-fallback factors
    oh_hi: jax.Array | None  # [El, hi_x]


def build_dist_edges(ee: EllEdges, L: int, use_tiled: bool) -> DistEdges:
    Kl, R = ee.ll.shape
    lo_w, _ = digit_split(L)
    ll_t = jnp.transpose(ee.ll).astype(jnp.int32)  # [R, Kl]
    lodig = (ll_t % lo_w)[:, None, :]
    hidig = (ll_t // lo_w)[:, None, :]
    oh_lo = oh_hi = None
    if not use_tiled:
        from semantic_slam_tpu.solver.pcg import _factor_l

        dtype = ee.meas.dtype
        ll_flat = ee.ll.reshape(-1)
        hi_x, lo_x = _factor_l(L)
        oh_lo = (
            ll_flat[:, None] % lo_x
            == jnp.arange(lo_x, dtype=ll_flat.dtype)[None, :]
        ).astype(dtype)
        oh_hi = (
            ll_flat[:, None] // lo_x
            == jnp.arange(hi_x, dtype=ll_flat.dtype)[None, :]
        ).astype(dtype)
    return DistEdges(
        ll=ee.ll,
        meas_t=jnp.transpose(ee.meas, (1, 2, 0)),
        info_t=jnp.transpose(ee.info, (1, 2, 3, 0)).reshape(R, 9, Kl),
        lodig=lodig,
        hidig=hidig,
        omt=jnp.transpose(ee.o_meas)[:3],
        omq=jnp.transpose(ee.o_meas)[3:7],
        oO=jnp.transpose(ee.o_info, (1, 2, 0)),
        oh_lo=oh_lo,
        oh_hi=oh_hi,
    )


class PlaneDist(NamedTuple):
    """Shard-local SE3-plane slot data (the merged point+plane grid's
    plane half, channel-matvec form). Slots follow the per-pose ELL
    contract of ``pcg.build_ell_edges_planes`` ([Kl, R4], id 0 empty,
    info mask-zeroed)."""

    pl: jax.Array     # [Kl, R4] plane index
    pmeas: jax.Array  # [Kl, R4, 4]
    pinfo: jax.Array  # [Kl, R4, 3, 3] mask-zeroed
    oh_lo: jax.Array  # [Kl*R4, lo_w] one-hot factors over Pl
    oh_hi: jax.Array  # [Kl*R4, hi]


def build_plane_dist(eep, Pl: int) -> PlaneDist:
    """From ``pcg.EllEdgesPlanes`` (or its shard row slice)."""
    from semantic_slam_tpu.solver.pcg import _factor_l

    dtype = eep.pmeas.dtype
    pl_flat = eep.pl.reshape(-1)
    hi_x, lo_x = _factor_l(Pl)
    oh_lo = (
        pl_flat[:, None] % lo_x
        == jnp.arange(lo_x, dtype=pl_flat.dtype)[None, :]
    ).astype(dtype)
    oh_hi = (
        pl_flat[:, None] // lo_x
        == jnp.arange(hi_x, dtype=pl_flat.dtype)[None, :]
    ).astype(dtype)
    return PlaneDist(
        pl=eep.pl, pmeas=eep.pmeas, pinfo=eep.pinfo, oh_lo=oh_lo, oh_hi=oh_hi
    )


class _LinG(NamedTuple):
    """One linearization, post-psum: replicated assembled state + the
    shard-local matvec primitives (opaque, impl-specific)."""

    prims: Any
    gp: jax.Array    # [6, K] replicated channel gradient (post-prior)
    diag: jax.Array  # [6, 6, K] replicated (post-prior)
    gl: jax.Array    # [L, 3] replicated (post-prior)
    Hll: jax.Array   # [L, 9] replicated (post-prior)
    chi2: jax.Array
    # planar-patch mode (None elsewhere): shard-local plane matvec blocks
    # + replicated plane tables
    pprims: Any = None       # (Hkk_p [6,6,R4,Kl], Wp [6,3,R4,Kl])
    gpl: jax.Array | None = None   # [Pl, 3] replicated (post-prior)
    Hpl: jax.Array | None = None   # [Pl, 9] replicated (post-prior)


def _grids_to_tab(gridT, lo_w, hi, D, L):
    """[D*lo_w, hi] stacked digit grids -> [L, D] table."""
    parts = []
    for d in range(D):
        g = gridT[d * lo_w:(d + 1) * lo_w, :]  # [lo_w, hi]
        parts.append(jnp.transpose(g).reshape(hi * lo_w))
    return jnp.stack(parts, axis=-1)[:L]


def _tab_to_grids(tab, lo_w, hi, D, L):
    """[L, D] table -> [D*lo_w, hi] stacked digit grids."""
    Lg = lo_w * hi
    pad = Lg - L
    t = tab
    if pad:
        t = jnp.concatenate([t, jnp.zeros((pad, D), tab.dtype)], axis=0)
    t3 = t.reshape(hi, lo_w, D)
    return jnp.concatenate(
        [jnp.transpose(t3[:, :, d]) for d in range(D)], axis=0
    )


def _dus(vec_loc, off, Kg):
    """Embed a [..., Kl] local channel block at pose-row ``off`` of a
    [..., Kg] zero array (the pre-psum embedding)."""
    shape = vec_loc.shape[:-1] + (Kg,)
    zeros = jnp.zeros(shape, vec_loc.dtype)
    idx = (jnp.zeros((), jnp.int32),) * (vec_loc.ndim - 1) + (off,)
    return jax.lax.dynamic_update_slice(zeros, vec_loc, idx)


def _slice_k(x, off, Kl):
    """[..., Kg] -> local [..., Kl] at pose-row offset."""
    return jax.lax.dynamic_slice_in_dim(x, off, Kl, axis=x.ndim - 1)


def run_lm_loop_soa_dist(
    poses,
    landmarks,
    pose_free,
    lm_free,
    de: DistEdges,
    max_iterations: int,
    rel_tol: float,
    max_cg_iters: int = 32,
    init_lambda_tau: float = 1e-5,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    init_lambda=0.0,
    prior=None,
    cg_tol: float = 1e-8,
    allreduce=lambda a: a,
    off=0,
    use_tiled: bool = False,
    interpret: bool = False,
    pe: PlaneDist | None = None,
    planes=None,
    plane_free=None,
):
    """The distributed LM loop (see module docstring). ``poses``/
    ``landmarks`` replicated; ``de`` shard-local; ``off`` this shard's
    first pose row (0 single-chip). With ``pe``/``planes``/``plane_free``
    the merged point+plane system is solved jointly (the plane half rides
    the same matvec additively: point slots through the kernels/channel
    math, plane slots through materialized channel W blocks)."""
    wdt = poses.dtype  # XLA runs native dtype; kernels cast to f32 inside
    Kg = poses.shape[0]
    L = landmarks.shape[0]
    Kl, R = de.ll.shape
    lo_w, hi = digit_split(L)
    Lg = lo_w * hi
    pf = pose_free.astype(wdt)          # [Kg] replicated
    lmf = lm_free.astype(wdt)           # [L]
    off = jnp.asarray(off, jnp.int32)
    has_planes = pe is not None
    if has_planes:
        Pl = planes.shape[0]
        R4 = pe.pl.shape[1]
        plf = plane_free.astype(wdt)    # [Pl]

    # ---- local linearize / chi2 / matvec halves (two impls, same contract)

    def _pose_channels(p):
        t_full = jnp.transpose(p[:, :3]).astype(wdt)
        q_full = jnp.transpose(p[:, 3:7]).astype(wdt)
        tj_full = chs.roll_up_pose_ch(t_full)
        qj_full = chs.roll_up_pose_ch(q_full)
        return (
            _slice_k(t_full, off, Kl), _slice_k(q_full, off, Kl),
            _slice_k(tj_full, off, Kl), _slice_k(qj_full, off, Kl),
        )

    def _lm_grids(l):
        # [3*lo_w, hi] digit-grid form: the [Lg, 3] table lane-pads 3->128
        # in kernel VMEM and costs MBs at large L (K=16384 blew the scoped
        # cap by exactly its size); the grid form is exact and ~50 KB
        return _tab_to_grids(l.astype(wdt), lo_w, hi, 3, L)

    def lin_local_tiled(p, l):
        t_loc, q_loc, tj_loc, qj_loc = _pose_channels(p)
        (v, Ow, Rt, Hii, Hij, Hjj, gp_part, gj, diag_part, Hjj_d,
         glT, HllT, chi) = pt.tiled_linearize(
            t_loc, q_loc, tj_loc, qj_loc, _lm_grids(l),
            de.meas_t, de.info_t, de.lodig, de.hidig,
            de.omt, de.omq, de.oO, lo_w,
            robust_kind=robust_kind, robust_delta=robust_delta,
            interpret=interpret,
        )
        prims = (v, Ow, Rt, Hii, Hij, Hjj)
        gl_part = _grids_to_tab(glT, lo_w, hi, 3, L)
        Hll_part = _grids_to_tab(HllT, lo_w, hi, 9, L)
        return prims, gp_part, gj, diag_part, Hjj_d, gl_part, Hll_part, chi

    def lin_local_xla(p, l):
        t_loc, q_loc, tj_loc, qj_loc = _pose_channels(p)
        Hii, Hij, Hjj, gi, gj, chi_k = chs.chain_linearize_ch(
            t_loc, q_loc, tj_loc, qj_loc, de.omt, de.omq, de.oO
        )
        chi_o = jnp.sum(chi_k)

        meas = jnp.transpose(de.meas_t, (1, 0, 2))  # [3, R, Kl]
        info = jnp.transpose(
            de.info_t.reshape(R, 3, 3, Kl), (1, 2, 0, 3)
        )  # [3, 3, R, Kl]
        t_ch = t_loc[:, None, :]
        Rt = _rotmat_conj_channels(
            q_loc[0], q_loc[1], q_loc[2], q_loc[3]
        )[:, :, None, :]
        lw = _gather_oh(de.oh_lo, de.oh_hi, l.astype(wdt), L)
        lw_ch = jnp.transpose(lw.reshape(Kl, R, 3), (2, 1, 0))
        v = _m33_vec(Rt, lw_ch - t_ch)
        r = v - meas
        Or = _m33_vec(info, r)
        chi_e = sum(r[i] * Or[i] for i in range(3))
        chi_l = jnp.sum(
            robust_rho(chi_e.reshape(-1), robust_kind, robust_delta)
        )
        if robust_kind != "none":
            w = robust_weight(
                chi_e.reshape(-1), robust_kind, robust_delta
            ).astype(wdt).reshape(R, Kl)
            Ow = info * w[None, None]
            Or = Or * w[None]
        else:
            Ow = info
        gp_obs = jnp.concatenate(
            [jnp.sum(-Or, axis=1), jnp.sum(-_cross(v, Or), axis=1)], axis=0
        )
        gl_e = _m33T_vec(Rt, Or)
        gl_part = _seg_sum_oh(
            de.oh_lo, de.oh_hi,
            jnp.transpose(gl_e, (2, 1, 0)).reshape(Kl * R, 3), L,
        )
        ORt = chs.m33_mul(Ow, Rt)
        Hll_e = chs.m33T_mul(Rt, ORt)
        Hll_part = _seg_sum_oh(
            de.oh_lo, de.oh_hi,
            jnp.transpose(Hll_e, (3, 2, 0, 1)).reshape(Kl * R, 9), L,
        )
        OB = _ob_product(Ow, v)
        BtOB = -_hat_mul(v, OB)
        diag_obs = jnp.sum(_assemble_h66(Ow, -OB, BtOB), axis=2)
        prims = ((v, Ow, Rt), Hii, Hij, Hjj)
        gp_part = gp_obs + gi
        diag_part = (diag_obs + Hii).reshape(36, Kl)
        return (
            prims, gp_part, gj, diag_part, Hjj.reshape(36, Kl),
            gl_part, Hll_part, chi_o + chi_l,
        )

    # matvec halves, shared contract:
    #   mv_fwd(prims, xm_loc) -> (Oa_opaque, T [L, 3])   (T gets psum'd)
    #   mv_bwd(prims, Oa_opaque, xm_loc, xj_loc, z [L,3]) -> (u, vj)
    def mv_fwd_tiled(prims, xm_loc):
        v, Ow, Rt, _, _, _ = prims
        Oa, T = pt.tiled_mv_fwd(
            v, Ow, de.lodig, de.hidig, Rt, xm_loc, lo_w, hi,
            interpret=interpret,
        )
        return Oa, _grids_to_tab(T, lo_w, hi, 3, L)

    def mv_bwd_tiled(prims, Oa, xm_loc, xj_loc, z):
        v, Ow, Rt, Hii, Hij, Hjj = prims
        zT = _tab_to_grids(z, lo_w, hi, 3, L)
        return pt.tiled_mv_bwd(
            v, Ow, de.lodig, de.hidig, Rt, Oa, zT, xm_loc, xj_loc,
            Hii, Hij, Hjj, lo_w, hi, interpret=interpret,
        )

    def _jp_apply(v, x_loc):
        xt = x_loc[:3, None, :]
        xr = x_loc[3:, None, :]
        return -xt + _cross(v, jnp.broadcast_to(xr, v.shape))

    def mv_fwd_xla(prims, xm_loc):
        (v, Ow, Rt), _, _, _ = prims
        a = _jp_apply(v, xm_loc)
        Oa = _m33_vec(Ow, a)
        wx = _m33T_vec(Rt, Oa)
        T = _seg_sum_oh(
            de.oh_lo, de.oh_hi,
            jnp.transpose(wx, (2, 1, 0)).reshape(Kl * R, 3), L,
        )
        return Oa, T

    def mv_bwd_xla(prims, Oa, xm_loc, xj_loc, z):
        (v, Ow, Rt), Hii, Hij, Hjj = prims
        zb = jnp.transpose(
            _gather_oh(de.oh_lo, de.oh_hi, z, L).reshape(Kl, R, 3), (2, 1, 0)
        )
        m = Oa - _m33_vec(Ow, _m33_vec(Rt, zb))
        u_obs = jnp.concatenate(
            [jnp.sum(-m, axis=1), jnp.sum(-_cross(v, m), axis=1)], axis=0
        )
        u = u_obs + _m66_vec(Hii, xm_loc) + _m66_vec(Hij, xj_loc)
        vj = _m66T_vec(Hij, xm_loc) + _m66_vec(Hjj, xj_loc)
        return u, vj

    mv_fwd = mv_fwd_tiled if use_tiled else mv_fwd_xla
    mv_bwd = mv_bwd_tiled if use_tiled else mv_bwd_xla

    def _zero_oa():
        return jnp.zeros((R, 3, Kl) if use_tiled else (3, R, Kl), wdt)

    # ---- plane half: AoS jacfwd linearize (once per LM iteration; R4 is
    # small) transposed to channel blocks for the per-CG-step products

    def plane_lin(p, pl_state):
        from semantic_slam_tpu.graph.planes import _plane_edge_jac

        poses_loc = jax.lax.dynamic_slice_in_dim(p, off, Kl, axis=0)
        pw = _gather_oh(
            pe.oh_lo, pe.oh_hi, pl_state.astype(wdt), Pl
        ).reshape(Kl, R4, 4)
        unit = jnp.zeros((4,), wdt).at[2].set(1.0)
        pw = jnp.where(
            jnp.sum(pw[..., :3] * pw[..., :3], axis=-1, keepdims=True) > 1e-12,
            pw, unit,
        )
        p_b = jnp.broadcast_to(poses_loc[:, None, :], (Kl, R4, p.shape[1]))
        r_p, Jk, Jp = jax.vmap(jax.vmap(_plane_edge_jac))(p_b, pw, pe.pmeas)
        p_info = pe.pinfo
        chi_e = jnp.einsum("kra,krab,krb->kr", r_p, p_info, r_p)
        chi_p = jnp.sum(
            robust_rho(chi_e.reshape(-1), robust_kind, robust_delta)
        )
        if robust_kind != "none":
            w = robust_weight(
                chi_e.reshape(-1), robust_kind, robust_delta
            ).astype(wdt).reshape(Kl, R4)
            p_info = p_info * w[:, :, None, None]
        JkT_O = jnp.einsum("krai,krab->krib", Jk, p_info)
        JpT_O = jnp.einsum("krai,krab->krib", Jp, p_info)
        H_kk_p = jnp.einsum("kria,kraj->krij", JkT_O, Jk)
        W_kp = jnp.einsum("kria,kraj->krij", JkT_O, Jp)
        H_pp = jnp.einsum("kria,kraj->krij", JpT_O, Jp)
        g_k = jnp.einsum("kria,kra->kri", JkT_O, r_p)
        g_p = jnp.einsum("kria,kra->kri", JpT_O, r_p)
        Hpl_part = _seg_sum_oh(
            pe.oh_lo, pe.oh_hi, H_pp.reshape(Kl * R4, 9), Pl
        )
        gpl_part = _seg_sum_oh(
            pe.oh_lo, pe.oh_hi, g_p.reshape(Kl * R4, 3), Pl
        )
        # channel forms for the matvec: [6,6,R4,Kl] / [6,3,R4,Kl]
        Hkk_ch = jnp.transpose(H_kk_p, (2, 3, 1, 0))
        Wp_ch = jnp.transpose(W_kp, (2, 3, 1, 0))
        gp_add = jnp.transpose(jnp.sum(g_k, axis=1))          # [6, Kl]
        diag_add = jnp.transpose(
            jnp.sum(H_kk_p, axis=1), (1, 2, 0)
        ).reshape(36, Kl)
        return (Hkk_ch, Wp_ch), gp_add, diag_add, gpl_part, Hpl_part, chi_p

    def plane_chi2_local(p, pl_state):
        from semantic_slam_tpu.graph import residuals as res_mod
        from semantic_slam_tpu.graph.planes import plane_retract  # noqa: F401

        poses_loc = jax.lax.dynamic_slice_in_dim(p, off, Kl, axis=0)
        pw = _gather_oh(
            pe.oh_lo, pe.oh_hi, pl_state.astype(wdt), Pl
        ).reshape(Kl, R4, 4)
        unit = jnp.zeros((4,), wdt).at[2].set(1.0)
        pw = jnp.where(
            jnp.sum(pw[..., :3] * pw[..., :3], axis=-1, keepdims=True) > 1e-12,
            pw, unit,
        )
        p_b = jnp.broadcast_to(poses_loc[:, None, :], (Kl, R4, p.shape[1]))
        r_p = jax.vmap(jax.vmap(res_mod.se3_plane_residual))(
            p_b, pw, pe.pmeas
        )
        chi_e = jnp.einsum("kra,krab,krb->kr", r_p, pe.pinfo, r_p)
        return jnp.sum(
            robust_rho(chi_e.reshape(-1), robust_kind, robust_delta)
        )

    def plane_wT_x(Wp_ch, xm_loc):
        """W_p^T x per slot, seg-summed to the plane table: [Pl, 3]."""
        wT = jnp.stack(
            [
                sum(Wp_ch[i, a] * xm_loc[i][None, :] for i in range(6))
                for a in range(3)
            ],
            axis=0,
        )  # [3, R4, Kl]
        return _seg_sum_oh(
            pe.oh_lo, pe.oh_hi,
            jnp.transpose(wT, (2, 1, 0)).reshape(Kl * R4, 3), Pl,
        )

    def plane_u(pprims, xm_loc, z_pl):
        """(Hkk_p x - W_p z_gathered) summed over slots: [6, Kl]."""
        Hkk_ch, Wp_ch = pprims
        zb = jnp.transpose(
            _gather_oh(pe.oh_lo, pe.oh_hi, z_pl, Pl).reshape(Kl, R4, 3),
            (2, 1, 0),
        )  # [3, R4, Kl]
        hx = jnp.stack(
            [
                jnp.sum(
                    sum(Hkk_ch[i, j] * xm_loc[j][None, :] for j in range(6)),
                    axis=0,
                )
                for i in range(6)
            ],
            axis=0,
        )
        wz = jnp.stack(
            [
                jnp.sum(
                    sum(Wp_ch[i, a] * zb[a] for a in range(3)), axis=0
                )
                for i in range(6)
            ],
            axis=0,
        )
        return hx - wz

    def chi2_local(p, l):
        t_loc, q_loc, tj_loc, qj_loc = _pose_channels(p)
        if use_tiled:
            return pt.tiled_chi2(
                t_loc, q_loc, tj_loc, qj_loc, _lm_grids(l),
                de.meas_t, de.info_t, de.lodig, de.hidig,
                de.omt, de.omq, de.oO, lo_w,
                robust_kind=robust_kind, robust_delta=robust_delta,
                interpret=interpret,
            )
        chi_k = chs.chain_chi2_ch(
            t_loc, q_loc, tj_loc, qj_loc, de.omt, de.omq, de.oO
        )
        meas = jnp.transpose(de.meas_t, (1, 0, 2))
        info = jnp.transpose(
            de.info_t.reshape(R, 3, 3, Kl), (1, 2, 0, 3)
        )
        Rt = _rotmat_conj_channels(
            q_loc[0], q_loc[1], q_loc[2], q_loc[3]
        )[:, :, None, :]
        lw = _gather_oh(de.oh_lo, de.oh_hi, l.astype(wdt), L)
        lw_ch = jnp.transpose(lw.reshape(Kl, R, 3), (2, 1, 0))
        v = _m33_vec(Rt, lw_ch - t_loc[:, None, :])
        r = v - meas
        Or = _m33_vec(info, r)
        chi_e = sum(r[i] * Or[i] for i in range(3))
        return jnp.sum(chi_k) + jnp.sum(
            robust_rho(chi_e.reshape(-1), robust_kind, robust_delta)
        )

    # ---- replicated assembly around the local pieces

    def build(p, l, pl=None):
        if use_tiled:
            (mv_prims, gp_part, gj, diag_part, Hjj_d, gl_part, Hll_part,
             chi) = lin_local_tiled(p, l)
        else:
            (mv_prims, gp_part, gj, diag_part, Hjj_d, gl_part, Hll_part,
             chi) = lin_local_xla(p, l)
        pprims = None
        gpl_part = Hpl_part = None
        if has_planes:
            (pprims, gp_add, diag_add, gpl_part, Hpl_part,
             chi_p) = plane_lin(p, pl)
            gp_part = gp_part + gp_add.astype(gp_part.dtype)
            diag_part = diag_part + diag_add.astype(diag_part.dtype)
            chi = chi + chi_p.astype(chi.dtype)
        # one fused collective round for the whole linearization
        payload = (
            _dus(gp_part, off, Kg), _dus(gj, off, Kg),
            _dus(diag_part, off, Kg), _dus(Hjj_d, off, Kg),
            gl_part, Hll_part, chi,
        )
        if has_planes:
            payload = payload + (gpl_part, Hpl_part)
        out = allreduce(payload)
        gp_e, gj_e, dg_e, hj_e, gl, Hll, chi = out[:7]
        gpl = Hpl = None
        if has_planes:
            gpl, Hpl = out[7], out[8]
        gp = gp_e + _shift_down_soa(gj_e)
        diag = (dg_e + _shift_down_soa(hj_e)).reshape(6, 6, Kg)
        if prior is not None:
            from semantic_slam_tpu.solver import fixed_lag as fl

            # cast to the ASSEMBLED arrays' dtype (f32 on the kernel path
            # even under x64), not wdt — an f64 value scattered into an
            # f32 array trips the dtype-promotion deprecation
            PB = prior.p_idx.shape[0]
            gp_add, gl_add, chi_pr = fl.prior_fold_terms(prior, p, l, wdt)
            gp = gp.at[:, prior.p_idx].add(
                jnp.transpose(gp_add.reshape(PB, 6)).astype(gp.dtype)
            )
            diag = diag.at[:, :, prior.p_idx].add(
                jnp.transpose(fl.prior_pose_diag(prior), (1, 2, 0)).astype(
                    diag.dtype
                )
            )
            gl = gl + gl_add.astype(gl.dtype)
            Hll = Hll + prior.Hl.reshape(L, 9).astype(Hll.dtype)
            chi = chi + chi_pr.astype(chi.dtype)
            if has_planes:
                chi_pl, gpl_add = fl._plane_prior_terms(prior, pl)
                gpl = gpl + gpl_add.astype(gpl.dtype)
                Hpl = Hpl + prior.Hpl.reshape(Pl, 9).astype(Hpl.dtype)
                chi = chi + chi_pl.astype(chi.dtype)
        return _LinG(mv_prims, gp, diag, gl, Hll, chi, pprims, gpl, Hpl)

    def chi2_at(p, l, pl=None):
        chi_loc = chi2_local(p, l)
        if has_planes:
            chi_loc = chi_loc + plane_chi2_local(p, pl).astype(chi_loc.dtype)
        chi = allreduce(chi_loc)
        if prior is not None:
            from semantic_slam_tpu.solver import fixed_lag as fl

            # chi.dtype, not wdt: the kernel path's chi is f32 even when
            # the graph dtype is f64, and the LM while carry must not
            # change dtype between build()'s chi2 and this trial chi2
            chi = chi + fl.prior_chi2(prior, p, l).astype(chi.dtype)
            if has_planes:
                chi_pl, _ = fl._plane_prior_terms(prior, pl)
                chi = chi + chi_pl.astype(chi.dtype)
        return chi

    def solve(ling: _LinG, lam):
        lam = lam.astype(wdt)
        # landmark-block inverse + block-Jacobi preconditioner, channelwise
        hll_t = jnp.transpose(ling.Hll)  # [9, L]
        one_l = 1.0 - lmf
        A = jnp.stack(
            [
                jnp.stack(
                    [
                        (hll_t[3 * i + j] + (lam if i == j else 0.0)) * lmf
                        + (one_l if i == j else 0.0)
                        for j in range(3)
                    ],
                    axis=0,
                )
                for i in range(3)
            ],
            axis=0,
        )
        Ainv = _inv33_ch(A)  # [3, 3, L]
        one_m = 1.0 - pf
        Md = jnp.stack(
            [
                jnp.stack(
                    [
                        (ling.diag[i, j] + (lam if i == j else 0.0)) * pf
                        + (one_m if i == j else 0.0)
                        for j in range(6)
                    ],
                    axis=0,
                )
                for i in range(6)
            ],
            axis=0,
        )
        Minv = _inv66_ch(Md)

        if has_planes:
            hpl_t = jnp.transpose(ling.Hpl)  # [9, Pl]
            one_pl = 1.0 - plf
            Apl = jnp.stack(
                [
                    jnp.stack(
                        [
                            (hpl_t[3 * i + j] + (lam if i == j else 0.0)) * plf
                            + (one_pl if i == j else 0.0)
                            for j in range(3)
                        ],
                        axis=0,
                    )
                    for i in range(3)
                ],
                axis=0,
            )
            Ainv_pl = _inv33_ch(Apl)  # [3, 3, Pl]
            gpl_ch = jnp.transpose(ling.gpl) * plf[None, :]

        def full_matvec(x):
            xm = x * pf[None, :]
            xm_loc = _slice_k(xm, off, Kl)
            xj_loc = _slice_k(chs.roll_up_pose_ch(xm), off, Kl)
            # the global roll wraps row K-1 -> row 0; oO masks the wrap row
            Oa, T_loc = mv_fwd(ling.prims, xm_loc)
            if has_planes:
                T, T_pl = allreduce((T_loc, plane_wT_x(ling.pprims[1], xm_loc)))
                z_pl = jnp.transpose(
                    _m33_vec(Ainv_pl, jnp.transpose(T_pl)) * plf[None, :]
                )
            else:
                T = allreduce(T_loc)  # [L, 3]
            z = jnp.transpose(_m33_vec(Ainv, jnp.transpose(T)))  # [L, 3]
            u_loc, vj_loc = mv_bwd(ling.prims, Oa, xm_loc, xj_loc, z)
            if has_planes:
                u_loc = u_loc + plane_u(ling.pprims, xm_loc, z_pl).astype(
                    u_loc.dtype
                )
            u_e, vj_e = allreduce((_dus(u_loc, off, Kg), _dus(vj_loc, off, Kg)))
            u = u_e + _shift_down_soa(vj_e)
            if prior is not None:
                PB = prior.p_idx.shape[0]
                xp = jnp.transpose(xm)[prior.p_idx].reshape(-1)
                add = (prior.Hp.astype(xp.dtype) @ xp).reshape(PB, 6)
                u = jnp.transpose(
                    jnp.transpose(u).at[prior.p_idx].add(add.astype(u.dtype))
                )
            return (u + lam * xm) * pf[None, :]

        def precond(r):
            return _m66_vec(Minv, r) * pf[None, :]

        # RHS b = -(gp - c),  c = Jp^T O' Rt (Ainv gl) (+ plane W y)
        gl_ch = jnp.transpose(ling.gl) * lmf[None, :]
        y = jnp.transpose(_m33_vec(Ainv, gl_ch))  # [L, 3]
        zero_loc = jnp.zeros((6, Kl), wdt)
        cu_loc, _ = mv_bwd(ling.prims, _zero_oa(), zero_loc, zero_loc, y)
        if has_planes:
            y_pl = jnp.transpose(_m33_vec(Ainv_pl, gpl_ch))  # [Pl, 3]
            cu_loc = cu_loc + plane_u(ling.pprims, zero_loc, y_pl).astype(
                cu_loc.dtype
            )
        c = -allreduce(_dus(cu_loc, off, Kg))
        b = -(ling.gp - c) * pf[None, :]

        x = jnp.zeros_like(b)
        r = b
        z0 = precond(r)
        p_ = z0
        rz = jnp.sum(r * z0)
        b2 = jnp.maximum(jnp.sum(b * b), 1e-30)

        def cond(carry):
            _, r, _, _, it = carry
            return (jnp.sum(r * r) > cg_tol * b2) & (it < max_cg_iters)

        def body(carry):
            x, r, p_, rz, it = carry
            Ap = full_matvec(p_)
            alpha = rz / jnp.maximum(jnp.sum(p_ * Ap), 1e-30)
            x = x + alpha * p_
            r = r - alpha * Ap
            z = precond(r)
            rz_new = jnp.sum(r * z)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            p_ = z + beta * p_
            return x, r, p_, rz_new, it + 1

        dp_soa, _, _, _, _ = jax.lax.while_loop(
            cond, body, (x, r, p_, rz, jnp.zeros((), jnp.int32))
        )
        dpk = dp_soa * pf[None, :]
        dp_loc = _slice_k(dpk, off, Kl)
        _, t_loc = mv_fwd(ling.prims, dp_loc)
        if has_planes:
            t_tab, t_pl = allreduce(
                (t_loc, plane_wT_x(ling.pprims[1], dp_loc))
            )
            db_pl = _m33_vec(
                Ainv_pl, (-gpl_ch - jnp.transpose(t_pl))
            ) * plf[None, :]
        else:
            t_tab = allreduce(t_loc)  # [L, 3]
        db_ch = _m33_vec(
            Ainv, (-gl_ch - jnp.transpose(t_tab))
        ) * lmf[None, :]
        db = jnp.transpose(db_ch)
        if has_planes:
            db = jnp.concatenate([db, jnp.transpose(db_pl)], axis=0)
        return jnp.transpose(dpk), db

    # ---- LM loop (run_lm_loop_soa semantics)
    pl0 = planes if has_planes else jnp.zeros((0, 4), wdt)
    lin0 = build(poses, landmarks, pl0)
    chi2_0 = lin0.chi2
    diag_max = jnp.maximum(
        jnp.max(jnp.abs(jnp.stack([lin0.diag[i, i] for i in range(6)]))),
        jnp.max(jnp.abs(lin0.Hll[:, 0::4])),
    )
    if has_planes:
        diag_max = jnp.maximum(
            diag_max, jnp.max(jnp.abs(lin0.Hpl[:, 0::4]))
        )
    init_lambda = jnp.asarray(init_lambda, wdt)
    lam0 = jnp.where(
        init_lambda > 0,
        init_lambda,
        init_lambda_tau * jnp.maximum(diag_max, 1.0),
    ).astype(wdt)

    def retract_all(p, l, pl, dp, db):
        p2 = jax.vmap(geo.pose_retract)(p, dp.astype(p.dtype))
        l2 = l + db[:L].astype(l.dtype)
        if has_planes:
            from semantic_slam_tpu.solver.plane_ba import plane_retract

            pl2 = jax.vmap(plane_retract)(pl, db[L:].astype(pl.dtype))
        else:
            pl2 = pl
        return p2, l2, pl2

    def cond(carry):
        _, _, _, _, _, _, it, done = carry
        return (it < max_iterations) & jnp.logical_not(done)

    def body(carry):
        p, l, pl, chi2_cur, lam, nu, it, done = carry
        lin = build(p, l, pl)
        dp, db = solve(lin, lam)
        p_new, l_new, pl_new = retract_all(p, l, pl, dp, db)
        chi2_new = chi2_at(p_new, l_new, pl_new)

        delta = jnp.concatenate([dp.reshape(-1), db.reshape(-1)])
        gvec = jnp.concatenate(
            [jnp.transpose(lin.gp).reshape(-1), lin.gl.reshape(-1)]
            + ([lin.gpl.reshape(-1)] if has_planes else [])
        )
        pred = lam * jnp.dot(delta, delta) - jnp.dot(delta, gvec)
        rho = (chi2_cur - chi2_new) / jnp.maximum(pred, 1e-12)
        finite = jnp.isfinite(chi2_new) & jnp.all(jnp.isfinite(delta))
        accept = (rho > 0) & finite

        p = jnp.where(accept, p_new, p)
        l = jnp.where(accept, l_new, l)
        pl = jnp.where(accept, pl_new, pl)
        lam_acc = lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam = jnp.where(accept, lam_acc, lam * nu)
        nu = jnp.where(accept, 2.0, nu * 2.0)
        converged = accept & (
            (chi2_cur - chi2_new) <= rel_tol * jnp.maximum(chi2_cur, 1e-12)
        )
        done = converged | (lam > 1e12)
        chi2_cur = jnp.where(accept, chi2_new, chi2_cur)
        return p, l, pl, chi2_cur, lam, nu, it + 1, done

    init = (
        poses, landmarks, pl0, chi2_0, lam0, jnp.asarray(2.0, wdt),
        jnp.zeros((), jnp.int32), jnp.zeros((), bool),
    )
    p, l, pl, chi2_f, lam, _, it, _ = jax.lax.while_loop(cond, body, init)
    if has_planes:
        return p, l, pl, LMStats(it, chi2_0, chi2_f, lam)
    return p, l, LMStats(it, chi2_0, chi2_f, lam)


def _use_tiled_auto(use_tiled, Kl: int, R: int, L: int) -> bool:
    if use_tiled == "auto":
        return jax.default_backend() == "tpu" and pt.tiled_fits(Kl, R, L)
    return bool(use_tiled)


@partial(
    jax.jit,
    static_argnames=(
        "max_iterations", "min_edges", "rel_tol", "max_cg_iters",
        "robust_kind", "robust_delta", "with_marginals", "ell_rows",
        "cg_tol", "use_tiled", "interpret",
    ),
)
def lm_optimize_soa_tiled(
    g: GraphState,
    max_iterations: int = 64,
    min_edges: int = 10,
    rel_tol: float = 1e-6,
    max_cg_iters: int = 128,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    init_lambda=0.0,
    prior=None,
    with_marginals: bool = False,
    ell_rows: tuple = (1, 1, 8),
    cg_tol: float = 1e-8,
    use_tiled: bool | str = "auto",
    interpret: bool = False,
):
    """Single-chip large-K entry: the tiled kernels (or the same host loop
    on XLA channel math elsewhere) with identity reductions. Serves
    K > 4096 where the resident kernels' Mosaic envelope ends; the
    resident path (``ellk_soa.lm_optimize_soa``) stays the 1024..4096
    single-chip fast path."""
    K = g.poses.shape[0]
    L = g.landmarks.shape[0]
    R = ell_rows[2]
    use_tiled = _use_tiled_auto(use_tiled, K, R, L)
    pose_free, lm_free = _free_masks(g)
    ee = build_ell_edges(_edge_args(g), K, R)
    de = build_dist_edges(ee, L, use_tiled)
    poses, landmarks, stats = run_lm_loop_soa_dist(
        g.poses, g.landmarks, pose_free, lm_free, de,
        max_iterations, rel_tol, max_cg_iters,
        robust_kind=robust_kind, robust_delta=robust_delta,
        init_lambda=init_lambda, prior=prior, cg_tol=cg_tol,
        use_tiled=use_tiled, interpret=interpret,
    )
    run = g.num_edges() >= min_edges
    g = g._replace(
        poses=jnp.where(run, poses.astype(g.poses.dtype), g.poses),
        landmarks=jnp.where(
            run, landmarks.astype(g.landmarks.dtype), g.landmarks
        ),
    )
    stats = LMStats(
        iterations=jnp.where(run, stats.iterations, 0),
        chi2_initial=stats.chi2_initial,
        chi2_final=jnp.where(run, stats.chi2_final, stats.chi2_initial),
        lambda_final=stats.lambda_final,
    )
    if with_marginals:
        # once-per-solve recovery on the existing AoS machinery
        from semantic_slam_tpu.solver import ellk_soa as soa

        se = soa.build_soa_edges(_edge_args(g), K, R, L)
        lin_f = soa.soa_linearize(
            g.poses, g.landmarks, se,
            robust_kind=robust_kind, robust_delta=robust_delta,
        )
        if prior is not None:
            from semantic_slam_tpu.solver.pcg import apply_prior_blocks

            lin_f = apply_prior_blocks(lin_f, prior, g.poses, g.landmarks)
        eb_f = soa.soa_to_ell_blocks(lin_f, se)
        marg = landmark_marginals_mf_ellk(eb_f, pose_free, lm_free, prior=prior)
        return g, stats, marg
    return g, stats


def sharded_lm_optimize_soa(
    g: GraphState,
    mesh,
    axis_name: str = "shard",
    max_iterations: int = 64,
    min_edges: int = 10,
    rel_tol: float = 1e-6,
    max_cg_iters: int = 128,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    init_lambda=0.0,
    prior=None,
    with_marginals: bool = False,
    ell_rows: tuple = (1, 1, 8),
    cg_tol: float = 1e-8,
    use_tiled: bool | str = "auto",
    interpret: bool = False,
):
    """The mesh path at SoA/kernel rates (r4 verdict item 1): pose rows
    sharded, one [3L] + one [12K] psum per CG step (module docstring).
    Shards of >= 1024 rows on TPU run the tiled kernels; smaller shards /
    other backends run the same loop on XLA channel math (still the SoA
    lane-filling layout — measured ~1.5-2x the sharded per-pose ELL it
    replaces)."""
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis_name]
    K = g.poses.shape[0]
    L = g.landmarks.shape[0]
    R = ell_rows[2]
    assert K % n == 0, (K, n)
    Kl = K // n
    use_tiled = _use_tiled_auto(use_tiled, Kl, R, L)

    pose_free, lm_free = _free_masks(g)
    ee = build_ell_edges(_edge_args(g), K, R)

    def body(poses, landmarks, pose_free, lm_free, prior, ee_loc):
        off = jax.lax.axis_index(axis_name) * Kl
        ar = lambda a: jax.lax.psum(a, axis_name)
        de = build_dist_edges(ee_loc, L, use_tiled)
        p, l, stats = run_lm_loop_soa_dist(
            poses, landmarks, pose_free, lm_free, de,
            max_iterations, rel_tol, max_cg_iters,
            robust_kind=robust_kind, robust_delta=robust_delta,
            init_lambda=init_lambda, prior=prior, cg_tol=cg_tol,
            allreduce=ar, off=off, use_tiled=use_tiled,
            interpret=interpret,
        )
        if with_marginals:
            # final-state recovery on the sharded AoS machinery (once per
            # solve): ell_linearize on this shard's rows + the existing
            # matrix-free recovery under the same psums
            from semantic_slam_tpu.solver.pcg import (
                apply_prior_blocks,
                ell_linearize,
            )

            eb_f = ell_linearize(
                p, l, ee_loc, robust_kind=robust_kind,
                robust_delta=robust_delta, allreduce=ar, shard=(off, K),
            )
            if prior is not None:
                eb_f = apply_prior_blocks(eb_f, prior, p, l)
            marg = landmark_marginals_mf_ellk(
                eb_f, pose_free, lm_free, prior=prior,
                allreduce=ar, shard=(off, K),
            )
            return p, l, stats, marg
        return p, l, stats

    def body_np(poses, landmarks, pose_free, lm_free, ee_loc):
        return body(poses, landmarks, pose_free, lm_free, None, ee_loc)

    prior_spec = None if prior is None else type(prior)(*(P() for _ in prior))
    ee_spec = EllEdges(*(P(axis_name) for _ in ee))
    out_specs = (P(), P(), LMStats(P(), P(), P(), P()))
    if with_marginals:
        out_specs = out_specs + (P(),)
    sharded = jax.shard_map(
        body_np if prior is None else body,
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
        poses=jnp.where(run, poses.astype(g.poses.dtype), g.poses),
        landmarks=jnp.where(
            run, landmarks.astype(g.landmarks.dtype), g.landmarks
        ),
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


@partial(
    jax.jit,
    static_argnames=(
        "max_iterations", "min_edges", "rel_tol", "max_cg_iters",
        "robust_kind", "robust_delta", "with_marginals", "ell_rows",
        "cg_tol", "use_tiled", "interpret",
    ),
)
def lm_optimize_soa_planes(
    g: GraphState,
    pn,
    max_iterations: int = 64,
    min_edges: int = 10,
    rel_tol: float = 1e-6,
    max_cg_iters: int = 128,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    init_lambda=0.0,
    prior=None,
    with_marginals: bool = False,
    ell_rows: tuple = (1, 1, 8, 8),
    cg_tol: float = 1e-8,
    use_tiled: bool | str = "auto",
    interpret: bool = False,
):
    """Planar-patch joint LM on the SoA/kernel path (r4 verdict #4 —
    before r5 the planes tick ran the r3 per-pose ELL rate at every K).
    Point slots run the tiled Pallas kernels (TPU, K >= 1024); plane slots
    ride the same matvec through materialized channel W blocks (their
    jacfwd linearize stays AoS — once per LM iteration over K*R4 slots).
    Drop-in for ``pcg.lm_optimize_pcg_planes(assembly='ell')``."""
    from semantic_slam_tpu.solver.pcg import build_ell_edges_planes

    K = g.poses.shape[0]
    L = g.landmarks.shape[0]
    Pl = pn.planes.shape[0]
    R = ell_rows[2]
    use_tiled = _use_tiled_auto(use_tiled, K, R, L)
    pose_free, lm_free = _free_masks(g)
    plane_args = (pn.pe_k, pn.pe_p, pn.pe_meas, pn.pe_info, pn.pe_mask())
    eep = build_ell_edges_planes(
        _edge_args(g), plane_args, K, ell_rows[2], ell_rows[3]
    )
    de = build_dist_edges(eep.pt, L, use_tiled)
    pd = build_plane_dist(eep, Pl)
    poses, landmarks, planes, stats = run_lm_loop_soa_dist(
        g.poses, g.landmarks, pose_free, lm_free, de,
        max_iterations, rel_tol, max_cg_iters,
        robust_kind=robust_kind, robust_delta=robust_delta,
        init_lambda=init_lambda, prior=prior, cg_tol=cg_tol,
        use_tiled=use_tiled, interpret=interpret,
        pe=pd, planes=pn.planes, plane_free=pn.plane_mask(),
    )
    run = (g.num_edges() + pn.num_pe) >= min_edges
    g = g._replace(
        poses=jnp.where(run, poses.astype(g.poses.dtype), g.poses),
        landmarks=jnp.where(
            run, landmarks.astype(g.landmarks.dtype), g.landmarks
        ),
    )
    pn = pn._replace(
        planes=jnp.where(run, planes.astype(pn.planes.dtype), pn.planes)
    )
    stats = LMStats(
        iterations=jnp.where(run, stats.iterations, 0),
        chi2_initial=stats.chi2_initial,
        chi2_final=jnp.where(run, stats.chi2_final, stats.chi2_initial),
        lambda_final=stats.lambda_final,
    )
    if with_marginals:
        from semantic_slam_tpu.solver.pcg import (
            apply_prior_blocks_planes,
            ell_linearize_planes,
        )

        block_free = jnp.concatenate([lm_free, pn.plane_mask()])
        eb_f = ell_linearize_planes(
            g.poses, g.landmarks, pn.planes, eep,
            robust_kind=robust_kind, robust_delta=robust_delta,
        )
        if prior is not None:
            eb_f = apply_prior_blocks_planes(
                eb_f, prior, g.poses, g.landmarks, pn.planes
            )
        marg = landmark_marginals_mf_ellk(
            eb_f, pose_free, block_free, prior=prior
        )[:L]
        return g, pn, stats, marg
    return g, pn, stats


def sharded_lm_optimize_soa_planes(
    g: GraphState,
    pn,
    mesh,
    axis_name: str = "shard",
    max_iterations: int = 64,
    min_edges: int = 10,
    rel_tol: float = 1e-6,
    max_cg_iters: int = 128,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    init_lambda=0.0,
    prior=None,
    with_marginals: bool = False,
    ell_rows: tuple = (1, 1, 8, 8),
    cg_tol: float = 1e-8,
    use_tiled: bool | str = "auto",
    interpret: bool = False,
):
    """The planes mesh path at SoA/kernel rates: pose-row sharding of the
    merged point+plane grid with the ``run_lm_loop_soa_dist`` collective
    scheme, plane tables psum'd alongside the point tables ([3Pl]-class).
    Drop-in for ``pcg.sharded_lm_optimize_pcg_planes``."""
    from jax.sharding import PartitionSpec as P

    from semantic_slam_tpu.solver.pcg import (
        EllEdgesPlanes,
        build_ell_edges_planes,
    )

    n = mesh.shape[axis_name]
    K = g.poses.shape[0]
    L = g.landmarks.shape[0]
    Pl = pn.planes.shape[0]
    R = ell_rows[2]
    assert K % n == 0, (K, n)
    Kl = K // n
    use_tiled = _use_tiled_auto(use_tiled, Kl, R, L)

    pose_free, lm_free = _free_masks(g)
    plane_free = pn.plane_mask()
    plane_args = (pn.pe_k, pn.pe_p, pn.pe_meas, pn.pe_info, pn.pe_mask())
    eep = build_ell_edges_planes(
        _edge_args(g), plane_args, K, ell_rows[2], ell_rows[3]
    )

    def body(poses, landmarks, planes, pose_free, lm_free, plane_free,
             prior, eep_loc):
        off = jax.lax.axis_index(axis_name) * Kl
        ar = lambda a: jax.lax.psum(a, axis_name)
        de = build_dist_edges(eep_loc.pt, L, use_tiled)
        pd = build_plane_dist(eep_loc, Pl)
        p, l, pl, stats = run_lm_loop_soa_dist(
            poses, landmarks, pose_free, lm_free, de,
            max_iterations, rel_tol, max_cg_iters,
            robust_kind=robust_kind, robust_delta=robust_delta,
            init_lambda=init_lambda, prior=prior, cg_tol=cg_tol,
            allreduce=ar, off=off, use_tiled=use_tiled,
            interpret=interpret,
            pe=pd, planes=planes, plane_free=plane_free,
        )
        if with_marginals:
            from semantic_slam_tpu.solver.pcg import (
                apply_prior_blocks_planes,
                ell_linearize_planes,
            )

            block_free = jnp.concatenate([lm_free, plane_free])
            eb_f = ell_linearize_planes(
                p, l, pl, eep_loc, robust_kind=robust_kind,
                robust_delta=robust_delta, allreduce=ar, shard=(off, K),
            )
            if prior is not None:
                eb_f = apply_prior_blocks_planes(eb_f, prior, p, l, pl)
            marg = landmark_marginals_mf_ellk(
                eb_f, pose_free, block_free, prior=prior,
                allreduce=ar, shard=(off, K),
            )[:L]
            return p, l, pl, stats, marg
        return p, l, pl, stats

    def body_np(poses, landmarks, planes, pose_free, lm_free, plane_free,
                eep_loc):
        return body(poses, landmarks, planes, pose_free, lm_free,
                    plane_free, None, eep_loc)

    prior_spec = None if prior is None else type(prior)(*(P() for _ in prior))
    eep_spec = EllEdgesPlanes(
        pt=type(eep.pt)(*(P(axis_name) for _ in eep.pt)),
        pl=P(axis_name), pmeas=P(axis_name), pinfo=P(axis_name),
    )
    out_specs = (P(), P(), P(), LMStats(P(), P(), P(), P()))
    if with_marginals:
        out_specs = out_specs + (P(),)
    sharded = jax.shard_map(
        body_np if prior is None else body,
        mesh=mesh,
        in_specs=(
            (P(), P(), P(), P(), P(), P())
            + ((eep_spec,) if prior is None else (prior_spec, eep_spec))
        ),
        out_specs=out_specs,
        check_vma=False,
    )
    args = (g.poses, g.landmarks, pn.planes, pose_free, lm_free, plane_free)
    if prior is None:
        out = sharded(*args, eep)
    else:
        out = sharded(*args, prior, eep)
    poses, landmarks, planes, stats = out[0], out[1], out[2], out[3]
    run = (g.num_edges() + pn.num_pe) >= min_edges
    g = g._replace(
        poses=jnp.where(run, poses.astype(g.poses.dtype), g.poses),
        landmarks=jnp.where(
            run, landmarks.astype(g.landmarks.dtype), g.landmarks
        ),
    )
    pn = pn._replace(
        planes=jnp.where(run, planes.astype(pn.planes.dtype), pn.planes)
    )
    stats = LMStats(
        iterations=jnp.where(run, stats.iterations, 0),
        chi2_initial=stats.chi2_initial,
        chi2_final=jnp.where(run, stats.chi2_final, stats.chi2_initial),
        lambda_final=stats.lambda_final,
    )
    if with_marginals:
        return g, pn, stats, out[4]
    return g, pn, stats
