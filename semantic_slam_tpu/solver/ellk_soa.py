"""Structure-of-arrays (K-last) per-pose PCG: the lane-geometry fast path.

Round-3 left the per-pose ELL solver HBM-bound at ~25-29% of streaming peak
(README roofline; device_time_bench r4 re-measurement: 4.43 ms/iter at
K=4096, 28.7% HBM, 0.04% FLOP peak). The residual 3-4x is pure LANE
GEOMETRY: every tensor in ``pcg.ell_linearize``/``ell_matvec`` carries its
small block dims LAST ([K,R,3], [K,R,6,6], ...), and the TPU tiles the last
two logical dims onto (8 sublanes x 128 lanes) — a [.,3] trailing dim uses
3 of 128 lanes, so each fused elementwise op moves ~2-40x more padded bytes
than payload and the VPU idles on masked lanes.

This module re-expresses the SAME math with the BIG axes last — channel
arrays shaped [..., R, K] (R on sublanes, K on lanes: full 128-lane
occupancy) — and every block product unrolled over its 3/6-sized channel
dims into fused multiply-adds on [R, K] slices. Two further structural
savings fall out:

* **Factored edge blocks.** The observation Hessian blocks are never
  materialized. With Jp = [-I | hat(v)], Jl = Rt, O' = w*O, every product
  the solver needs factors through the primitives (v, O', Rt):

      H_kk x  = Jp^T O' (Jp x)        W_kl z = Jp^T O' (Rt z)
      W^T x   = Rt^T (O' (Jp x))      Hll_e  = Rt^T O' Rt

  so a CG step streams 21 channels per edge (v 3 + O' 9 + Rt 9) instead of
  the 54 of materialized H_kk+W_kl — a 2.5x HBM cut on the step's dominant
  read (the layout change already multiplies the effective bandwidth).
* **Odometry chain in [6,6,K]**: the chain block matvecs become 36 fused
  multiply-adds over [K] lanes; the j-side shift is one lane-axis roll.

Numerics are IDENTICAL math to ``pcg.run_lm_loop_pcg_ellk`` up to float
summation order (pinned by tests/test_ellk_soa.py); the LM loop, Schur
step, preconditioners, fixed-lag prior fold and marginal recovery reuse the
same formulas. The [E]-flat landmark-side segment sums / gathers keep the
two-level one-hot MXU form (pcg._seg_sum_l/_gather_l) through cheap [E,3]
transposes.

Single-chip module; the pose-row-sharded mesh path stays in ``pcg``
(engine dispatch picks per backend/config). Reference semantics cited in
``pcg`` apply unchanged (graph_slam.cpp:182-219 lm_var loop).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from semantic_slam_tpu.core import geometry as geo
from semantic_slam_tpu.graph.state import GraphState
from semantic_slam_tpu.solver import chain_soa as chs
from semantic_slam_tpu.solver.lm import LMStats, _free_masks, inv33
from semantic_slam_tpu.solver.lm import inv66 as lm_inv66
from semantic_slam_tpu.solver.pcg import (
    EllBlocks,
    EllEdges,
    _edge_args,
    apply_prior_blocks,
    build_ell_edges,
    landmark_marginals_mf_ellk,
)
from semantic_slam_tpu.solver.robust import robust_rho, robust_weight

# ---------------------------------------------------------------------------
# channelwise small-matrix helpers: [3,3,...]/[6,...] arrays, unrolled ops
# ---------------------------------------------------------------------------


def _m33_mul(A, B):
    """[3,3,...] @ [3,3,...] unrolled to fused mul/add on the big axes."""
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


def _m33T_mul(A, B):
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


def _m33_vec(A, x):
    """[3,3,...] @ [3,...]"""
    return jnp.stack(
        [sum(A[i, k] * x[k] for k in range(3)) for i in range(3)], axis=0
    )


def _m33T_vec(A, x):
    return jnp.stack(
        [sum(A[k, i] * x[k] for k in range(3)) for i in range(3)], axis=0
    )


def _cross(v, x):
    """v x x for [3,...] channel arrays."""
    return jnp.stack(
        [
            v[1] * x[2] - v[2] * x[1],
            v[2] * x[0] - v[0] * x[2],
            v[0] * x[1] - v[1] * x[0],
        ],
        axis=0,
    )


def _m66_vec(M, x):
    """[6,6,K] @ [6,K] unrolled."""
    return jnp.stack(
        [sum(M[i, k] * x[k] for k in range(6)) for i in range(6)], axis=0
    )


def _m66T_vec(M, x):
    return jnp.stack(
        [sum(M[k, i] * x[k] for k in range(6)) for i in range(6)], axis=0
    )


def _rotmat_conj_channels(qw, qx, qy, qz):
    """Rt = R(q)^T channels (the rotation of quat_conj(q)), each [...]."""
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    # R(q) rows, transposed: Rt[i][j] = R[j][i]
    r00 = 1 - 2 * (yy + zz)
    r01 = 2 * (xy - wz)
    r02 = 2 * (xz + wy)
    r10 = 2 * (xy + wz)
    r11 = 1 - 2 * (xx + zz)
    r12 = 2 * (yz - wx)
    r20 = 2 * (xz - wy)
    r21 = 2 * (yz + wx)
    r22 = 1 - 2 * (xx + yy)
    return jnp.stack(
        [
            jnp.stack([r00, r10, r20], axis=0),
            jnp.stack([r01, r11, r21], axis=0),
            jnp.stack([r02, r12, r22], axis=0),
        ],
        axis=0,
    )


# ---------------------------------------------------------------------------
# SoA edge store + linearization
# ---------------------------------------------------------------------------


class SoAEdges(NamedTuple):
    """Per-solve static edge data, big axes last.

    Landmark slots: [.., R, K] channel arrays. Odometry is carried BOTH
    ways: the AoS [K,...] form of ``pcg.EllEdges`` (compat) and the
    channel form the r5 chain linearize (``chain_soa``) and the Pallas
    kernels consume."""

    ll: jax.Array  # [K, R] landmark index (0 empty) — gathers/seg-sums
    meas: jax.Array  # [3, R, K]
    info: jax.Array  # [3, 3, R, K] zeroed on empty slots
    o_meas: jax.Array  # [K, 7]
    o_info: jax.Array  # [K, 6, 6]
    o_w: jax.Array  # [K]
    o_meas_ch: jax.Array  # [7, K] chain measurement channels
    o_info_ch: jax.Array  # [6, 6, K] chain information channels
    # two-level one-hot factors of ll (pcg._seg_sum_l digit split),
    # MATERIALIZED once per solve: nested in the LM while, XLA fails to
    # hoist the loop-invariant compares out of the CG while, re-running
    # them every CG step (profiled r4: ~30 us/step of compare/reshape ops
    # at K=4096). ~5 MB resident; each step just feeds them to the MXU.
    oh_lo: jax.Array  # [E, lo_w] f32 (K-major flats — the XLA path)
    oh_hi: jax.Array  # [E, hi] f32
    # r-major DIGIT vectors for the VMEM-resident Pallas CG kernel
    # (solver/pallas_cg.py): slot (r,k) at r*K+k; the kernel regenerates
    # its one-hot blocks from these via iota compares (keeping the full
    # factors resident blew the K=4096 VMEM budget)
    k_lo_dig: jax.Array  # [1, E] i32
    k_hi_dig: jax.Array  # [1, E] i32


class SoALin(NamedTuple):
    """One linearization: factored observation primitives + assembled
    per-pose/landmark reductions (AoS where the LM loop/prior consume them).

    On the Pallas path the kernel-native forms are ALSO carried (channel
    gp/diag and the landmark digit-grid tables) so ``resident_solve``
    consumes kernel-L outputs with zero XLA relayouts; None elsewhere."""

    v: jax.Array  # [3, R, K]  v = Rt (l - t)
    Ow: jax.Array  # [3, 3, R, K]  robust-weighted, mask-zeroed O'
    Rt: jax.Array  # [3, 3, R, K]
    Hii: jax.Array  # [6, 6, K] chain blocks (K-last)
    Hij: jax.Array  # [6, 6, K]
    Hjj: jax.Array  # [6, 6, K]
    Hll: jax.Array  # [L, 3, 3]
    gp: jax.Array  # [K, 6]
    gl: jax.Array  # [L, 3]
    diag: jax.Array  # [K, 6, 6]
    chi2: jax.Array
    gp_ch: jax.Array | None = None  # [6, K] (kernel path)
    diag_ch: jax.Array | None = None  # [6, 6, K]
    gl_tab: jax.Array | None = None  # [Lg, 3] digit-grid table
    Hll_tab: jax.Array | None = None  # [Lg, 9]


def build_soa_edges(edge_args: tuple, K: int, R: int, L: int) -> SoAEdges:
    ee = build_ell_edges(edge_args, K, R)
    return soa_from_ell_edges(ee, L)


def soa_from_ell_edges(ee: EllEdges, L: int | None = None) -> SoAEdges:
    from semantic_slam_tpu.solver.pcg import _factor_l

    if L is None:
        raise TypeError("soa_from_ell_edges requires L (landmark capacity)")
    dtype = ee.meas.dtype
    ll_flat = ee.ll.reshape(-1)
    hi, lo_w = _factor_l(L)
    lo_e = ll_flat % lo_w
    hi_e = ll_flat // lo_w
    oh_lo = (
        lo_e[:, None] == jnp.arange(lo_w, dtype=ll_flat.dtype)[None, :]
    ).astype(dtype)
    oh_hi = (
        hi_e[:, None] == jnp.arange(hi, dtype=ll_flat.dtype)[None, :]
    ).astype(dtype)
    from semantic_slam_tpu.solver.pallas_cg import digit_split

    klo_w, _ = digit_split(L)  # kernel split (floored at 16 — Mosaic)
    ll_r = jnp.transpose(ee.ll).reshape(1, -1)  # r-major slot order
    k_lo_dig = (ll_r % klo_w).astype(jnp.int32)
    k_hi_dig = (ll_r // klo_w).astype(jnp.int32)
    return SoAEdges(
        ll=ee.ll,
        meas=jnp.transpose(ee.meas, (2, 1, 0)),
        info=jnp.transpose(ee.info, (2, 3, 1, 0)),
        o_meas=ee.o_meas,
        o_info=ee.o_info,
        o_w=ee.o_w,
        o_meas_ch=jnp.transpose(ee.o_meas),
        o_info_ch=jnp.transpose(ee.o_info, (1, 2, 0)),
        oh_lo=oh_lo,
        oh_hi=oh_hi,
        k_lo_dig=k_lo_dig,
        k_hi_dig=k_hi_dig,
    )


def _seg_sum_oh(oh_lo, oh_hi, vals, L):
    """pcg._seg_sum_l with the one-hot factors PRECOMPUTED (see SoAEdges).
    vals [E, D] -> [L, D]; float-identical contraction."""
    E, D = vals.shape
    lo_w = oh_lo.shape[1]
    hi = oh_hi.shape[1]
    P = oh_lo[:, :, None] * vals[:, None, :]  # [E, lo_w, D]
    T = jnp.einsum("eh,eld->hld", oh_hi, P)
    return T.reshape(hi * lo_w, D)[:L]


def _gather_oh(oh_lo, oh_hi, table, L):
    """pcg._gather_l with precomputed one-hot factors. [L, D] -> [E, D]."""
    E = oh_lo.shape[0]
    lo_w = oh_lo.shape[1]
    hi = oh_hi.shape[1]
    D = table.shape[1]
    dtype = table.dtype
    pad = hi * lo_w - L
    Tt = jnp.concatenate(
        [table, jnp.zeros((pad, D), dtype)]
    ).reshape(hi, lo_w * D)
    w = (oh_hi @ Tt).reshape(E, lo_w, D)
    return jnp.einsum("el,eld->ed", oh_lo, w)


def soa_linearize(
    poses,
    landmarks,
    se: SoAEdges,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
) -> SoALin:
    """pcg.ell_linearize re-expressed channelwise (see module docstring).

    Both the observation and the odometry-chain parts run channelwise
    (``chain_soa``); on the Pallas path the WHOLE linearization (obs +
    chain) is one kernel (``pallas_cg.resident_linearize``)."""
    K, R = se.ll.shape
    L = landmarks.shape[0]
    dtype = poses.dtype

    if use_pallas:
        # the whole linearization in ONE Pallas kernel: after the CG loop
        # went VMEM-resident (r4), the XLA linearize + prep was the
        # per-iteration dominator (VERDICT r4 "half the solve is still
        # XLA prep")
        from semantic_slam_tpu.solver.pallas_cg import resident_linearize

        (v, Ow, Rt3, Hii_c, Hij_c, Hjj_c, gp_ch, diag_ch, gl_tab,
         Hll_tab, chi) = resident_linearize(
            poses, landmarks, se.meas, se.info, se.k_lo_dig,
            se.k_hi_dig, se.o_meas_ch, se.o_info_ch,
            robust_kind=robust_kind,
            robust_delta=robust_delta, interpret=pallas_interpret,
        )
        return SoALin(
            v=v,
            Ow=Ow,
            Rt=Rt3[:, :, None, :],
            Hii=Hii_c,
            Hij=Hij_c,
            Hjj=Hjj_c,
            Hll=Hll_tab[:L].reshape(L, 3, 3),
            gp=jnp.transpose(gp_ch),
            gl=gl_tab[:L],
            diag=jnp.transpose(diag_ch, (2, 0, 1)),
            chi2=chi,
            gp_ch=gp_ch,
            diag_ch=diag_ch,
            gl_tab=gl_tab,
            Hll_tab=Hll_tab,
        )

    # ---- odometry chain, channelwise (chain_soa — same math as the AoS
    # vmap(se3_edge_residual_jac) build, lane-filling op order)
    t_i = jnp.transpose(poses[:, :3])  # [3, K]
    q_i = jnp.transpose(poses[:, 3:7])
    t_j = chs.roll_up_pose_ch(t_i)
    q_j = chs.roll_up_pose_ch(q_i)
    Hii_c, Hij_c, Hjj_c, gi_c, gj_c, chi_k = chs.chain_linearize_ch(
        t_i, q_i, t_j, q_j, se.o_meas_ch[:3], se.o_meas_ch[3:7],
        se.o_info_ch,
    )
    chi_o = jnp.sum(chi_k)

    # ---- observation edges: channel arrays [.., R, K]
    t_ch = t_i[:, None, :]  # [3, 1, K]
    qw, qx, qy, qz = (poses[:, 3], poses[:, 4], poses[:, 5], poses[:, 6])
    Rt = _rotmat_conj_channels(qw, qx, qy, qz)[:, :, None, :]  # [3,3,1,K]
    # kept [3,3,1,K]: broadcasting supplies the R axis inside each product,
    # so every CG step re-reads 9*K floats of rotation, not 9*R*K

    lw = _gather_oh(se.oh_lo, se.oh_hi, landmarks, L)  # [E, 3] (MXU)
    lw_ch = jnp.transpose(lw.reshape(K, R, 3), (2, 1, 0))  # [3, R, K]
    d = lw_ch - t_ch
    v = _m33_vec(Rt, d)  # [3, R, K]
    r = v - se.meas

    O = se.info  # [3,3,R,K], already mask-zeroed
    Or = _m33_vec(O, r)
    chi_e = sum(r[i] * Or[i] for i in range(3))  # [R, K]
    chi_l = jnp.sum(robust_rho(chi_e.reshape(-1), robust_kind, robust_delta))
    if robust_kind != "none":
        w = robust_weight(
            chi_e.reshape(-1), robust_kind, robust_delta
        ).astype(dtype).reshape(R, K)
        Ow = O * w[None, None]
        Or = Or * w[None]
    else:
        Ow = O

    # gradients: g_k = [-(O'r); -v x (O'r)],  g_l = Rt^T (O'r)
    g_top = -Or
    g_bot = -_cross(v, Or)
    gp_obs = jnp.concatenate(
        [jnp.sum(g_top, axis=1), jnp.sum(g_bot, axis=1)], axis=0
    )  # [6, K]
    gl_e = _m33T_vec(Rt, Or)  # [3, R, K]
    gl = _seg_sum_oh(
        se.oh_lo, se.oh_hi,
        jnp.transpose(gl_e, (2, 1, 0)).reshape(K * R, 3),
        L,
    )

    # landmark blocks: Hll_e = Rt^T O' Rt  (per edge), seg-summed
    ORt = _m33_mul(Ow, Rt)  # [3,3,R,K]
    Hll_e = _m33T_mul(Rt, ORt)
    Hll = _seg_sum_oh(
        se.oh_lo, se.oh_hi,
        jnp.transpose(Hll_e, (3, 2, 0, 1)).reshape(K * R, 9),
        L,
    ).reshape(L, 3, 3)

    # pose diagonal: H_kk = [[O', -O'B],[(-O'B)^T, -hat(v) O'B]], B = hat(v)
    OB = _ob_product(Ow, v)  # O' @ hat(v), [3,3,R,K]
    BtOB = -_hat_mul(v, OB)  # -hat(v) @ (O'B)
    Hkk = _assemble_h66(Ow, -OB, BtOB)  # [6,6,R,K]
    diag_obs = jnp.sum(Hkk, axis=2)  # [6,6,K]

    # assembled outputs (channel form, transposed to the AoS interface)
    diag_ch = diag_obs + Hii_c + _shift_down_soa(Hjj_c)
    gp_ch = gp_obs + gi_c + _shift_down_soa(gj_c)
    return SoALin(
        v=v,
        Ow=Ow,
        Rt=Rt,
        Hii=Hii_c,
        Hij=Hij_c,
        Hjj=Hjj_c,
        Hll=Hll,
        gp=jnp.transpose(gp_ch),
        gl=gl,
        diag=jnp.transpose(diag_ch, (2, 0, 1)),
        chi2=chi_o + chi_l,
    )


def soa_chi2(
    poses,
    landmarks,
    se: SoAEdges,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    prior=None,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
):
    """Objective value only — the trial-point evaluation of the LM loop.

    Float-IDENTICAL to ``soa_linearize(...).chi2`` on the same path (same
    op order on the residual path, same prior term as the prior fold
    adds), at ~1/4 the cost: no jacobians, no block products, no seg-sums.
    Keeping the loop's accept/reject decisions bitwise-equal to the
    carry-the-blocks scheme is what lets run_lm_loop_soa drop the 7 MB
    linearization tree from the while carry (measured: the tree carry cost
    more than the relinearize it saved). On the Pallas path this is one
    kernel (``pallas_cg.resident_chi2``)."""
    K, R = se.ll.shape
    L = landmarks.shape[0]

    if use_pallas:
        from semantic_slam_tpu.solver.pallas_cg import resident_chi2

        chi = resident_chi2(
            poses, landmarks, se.meas, se.info, se.k_lo_dig, se.k_hi_dig,
            se.o_meas_ch, se.o_info_ch, robust_kind=robust_kind,
            robust_delta=robust_delta, interpret=pallas_interpret,
        )
    else:
        t_i = jnp.transpose(poses[:, :3])
        q_i = jnp.transpose(poses[:, 3:7])
        chi_k = chs.chain_chi2_ch(
            t_i, q_i, chs.roll_up_pose_ch(t_i), chs.roll_up_pose_ch(q_i),
            se.o_meas_ch[:3], se.o_meas_ch[3:7], se.o_info_ch,
        )
        chi_o = jnp.sum(chi_k)

        t_ch = t_i[:, None, :]
        qw, qx, qy, qz = (poses[:, 3], poses[:, 4], poses[:, 5], poses[:, 6])
        Rt = _rotmat_conj_channels(qw, qx, qy, qz)[:, :, None, :]
        lw = _gather_oh(se.oh_lo, se.oh_hi, landmarks, L)
        lw_ch = jnp.transpose(lw.reshape(K, R, 3), (2, 1, 0))
        v = _m33_vec(Rt, lw_ch - t_ch)
        r = v - se.meas
        Or = _m33_vec(se.info, r)
        chi_e = sum(r[i] * Or[i] for i in range(3))
        chi_l = jnp.sum(
            robust_rho(chi_e.reshape(-1), robust_kind, robust_delta)
        )
        chi = chi_o + chi_l
    if prior is not None:
        from semantic_slam_tpu.solver import fixed_lag as fl

        chi = chi + fl.prior_chi2(prior, poses, landmarks)
    return chi


def apply_prior_soa_k(lin: SoALin, prior, poses, landmarks) -> SoALin:
    """Fold a fixed-lag ``MarginalPrior`` into a KERNEL-path linearization:
    the channel/grid fields feed ``resident_solve`` directly (the dense
    boundary block itself is applied inside the kernel's matvec), and the
    AoS views are re-derived so marginals/pred consume consistent values.
    Same additions as ``pcg.apply_prior_blocks``."""
    from semantic_slam_tpu.solver import fixed_lag as fl

    dtype = lin.gp.dtype
    PB = prior.p_idx.shape[0]
    L = landmarks.shape[0]
    gp_add, gl_add, chi_pr = fl.prior_fold_terms(prior, poses, landmarks, dtype)
    gp_ch = lin.gp_ch.at[:, prior.p_idx].add(
        jnp.transpose(gp_add.reshape(PB, 6)).astype(lin.gp_ch.dtype)
    )
    diag_ch = lin.diag_ch.at[:, :, prior.p_idx].add(
        jnp.transpose(fl.prior_pose_diag(prior), (1, 2, 0)).astype(
            lin.diag_ch.dtype
        )
    )
    gl_tab = lin.gl_tab.at[:L].add(gl_add.astype(lin.gl_tab.dtype))
    Hll_tab = lin.Hll_tab.at[:L].add(
        prior.Hl.reshape(L, 9).astype(lin.Hll_tab.dtype)
    )
    return lin._replace(
        gp_ch=gp_ch,
        diag_ch=diag_ch,
        gl_tab=gl_tab,
        Hll_tab=Hll_tab,
        gp=jnp.transpose(gp_ch),
        diag=jnp.transpose(diag_ch, (2, 0, 1)),
        gl=gl_tab[:L],
        Hll=Hll_tab[:L].reshape(L, 3, 3),
        chi2=lin.chi2 + chi_pr.astype(lin.chi2.dtype),
    )


def _roll_up_soa(x):
    """[.., K] channels: position k of result = x at k+1 (last = 0) — the
    chain successor x_{k+1} at row k (masked blocks zero the wraparound)."""
    return jnp.concatenate([x[..., 1:], jnp.zeros_like(x[..., :1])], axis=-1)


def _shift_down_soa(x):
    """[.., K] channels: position k of result = x at k-1 (first = 0)."""
    return jnp.concatenate([jnp.zeros_like(x[..., :1]), x[..., :-1]], axis=-1)


def _ob_product(O, v):
    """O @ hat(v): columns of hat(v) are (0,vz,-vy), (-vz,0,vx), (vy,-vx,0)."""
    c0 = jnp.stack([O[i][1] * v[2] - O[i][2] * v[1] for i in range(3)], 0)
    c1 = jnp.stack([-O[i][0] * v[2] + O[i][2] * v[0] for i in range(3)], 0)
    c2 = jnp.stack([O[i][0] * v[1] - O[i][1] * v[0] for i in range(3)], 0)
    return jnp.stack([c0, c1, c2], axis=1)  # [3(row), 3(col), ...]


def _hat_mul(v, M):
    """hat(v) @ M: rows are (-vz*M[1]+vy*M[2]), (vz*M[0]-vx*M[2]),
    (-vy*M[0]+vx*M[1])."""
    r0 = jnp.stack([-v[2] * M[1][j] + v[1] * M[2][j] for j in range(3)], 0)
    r1 = jnp.stack([v[2] * M[0][j] - v[0] * M[2][j] for j in range(3)], 0)
    r2 = jnp.stack([-v[1] * M[0][j] + v[0] * M[1][j] for j in range(3)], 0)
    return jnp.stack([r0, r1, r2], axis=0)


def _assemble_h66(TL, TR, BR):
    """[[TL, TR],[TR^T, BR]] from [3,3,...] quadrants -> [6,6,...]."""
    rows = []
    for i in range(3):
        rows.append(jnp.stack([*(TL[i][j] for j in range(3)),
                               *(TR[i][j] for j in range(3))], axis=0))
    for i in range(3):
        rows.append(jnp.stack([*(TR[j][i] for j in range(3)),
                               *(BR[i][j] for j in range(3))], axis=0))
    return jnp.stack(rows, axis=0)


# ---------------------------------------------------------------------------
# matvec / Schur step / LM loop
# ---------------------------------------------------------------------------


def _obs_apply_jp(v, x_soa):
    """Jp x for every slot: a = -x[:3] + v x x[3:]  ([3, R, K]).
    x_soa [6, K] broadcasts over R."""
    xt = x_soa[:3, None, :]  # [3,1,K]
    xr = x_soa[3:, None, :]
    vxr = _cross(v, jnp.broadcast_to(xr, v.shape))
    return -xt + vxr


def _obs_apply_jpT(v, y):
    """Jp^T y for every slot, summed over R: [6, K]."""
    top = -jnp.sum(y, axis=1)
    bot = -jnp.sum(_cross(v, y), axis=1)
    return jnp.concatenate([top, bot], axis=0)


def soa_schur_step(
    lin: SoALin,
    se: SoAEdges,
    lam,
    pose_free,
    block_free,
    max_cg_iters: int,
    precond_kind: str = "jacobi",
    prior=None,
    cg_tol: float = 1e-8,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
):
    """pcg.ell_schur_step on SoA state: returns (dp [K,6], db [L,3])."""
    dtype = lin.gp.dtype
    K = lin.gp.shape[0]
    L = lin.Hll.shape[0]
    R = lin.v.shape[1]
    pf = pose_free.astype(dtype)
    pf_soa = pf[None, :]
    lmf = block_free.astype(dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    eye6 = jnp.eye(6, dtype=dtype)

    if use_pallas and precond_kind == "jacobi":
        # the ENTIRE damped Schur solve in one kernel: Ainv/Minv built
        # in-kernel, RHS build, VMEM-resident CG, landmark back-
        # substitution, optional boundary prior inside the matvec
        # (solver/pallas_cg.resident_solve)
        from semantic_slam_tpu.solver.pallas_cg import digit_split, resident_solve

        lo_w, hi_d = digit_split(L)
        Lg = lo_w * hi_d
        if lin.gl_tab is None:
            # linearization came from the XLA path (mixed usage): derive
            # the kernel-form grid tables / channel views from AoS fields
            padL = Lg - L
            gl_tab = jnp.concatenate([lin.gl, jnp.zeros((padL, 3), dtype)])
            Hll_tab = jnp.concatenate(
                [lin.Hll.reshape(L, 9), jnp.zeros((padL, 9), dtype)]
            )
            gp_ch = jnp.transpose(lin.gp)
            diag_ch = jnp.transpose(lin.diag, (1, 2, 0))
        else:
            gl_tab, Hll_tab = lin.gl_tab, lin.Hll_tab
            gp_ch, diag_ch = lin.gp_ch, lin.diag_ch
        lmf_tab = jnp.concatenate(
            [lmf, jnp.zeros((Lg - L,), dtype)]
        )
        dp_soa, db_tab = resident_solve(
            lin.v, lin.Ow, lin.Rt[:, :, 0, :], lin.Hii, lin.Hij, lin.Hjj,
            diag_ch, se.k_lo_dig, se.k_hi_dig,
            gp_ch, gl_tab, Hll_tab, lmf_tab, pf,
            lam, cg_tol, n_steps=max_cg_iters, lo_w=lo_w,
            prior_Hp=None if prior is None else prior.Hp,
            prior_idx=None if prior is None else prior.p_idx,
            interpret=pallas_interpret,
        )
        dpk = dp_soa.astype(dtype) * pf_soa
        return jnp.transpose(dpk), db_tab[:L].astype(dtype)

    # bundle the matvec primitives (incl. the precomputed one-hot factors)
    class _L(NamedTuple):
        v: jax.Array
        Ow: jax.Array
        Rt: jax.Array
        Hii: jax.Array
        Hij: jax.Array
        Hjj: jax.Array
        oh_lo: jax.Array
        oh_hi: jax.Array

    ml = _L(
        lin.v, lin.Ow, lin.Rt, lin.Hii, lin.Hij, lin.Hjj,
        se.oh_lo, se.oh_hi,
    )

    precond = None
    if precond_kind == "tridiag":
        from semantic_slam_tpu.solver import tridiag as td

        D = lin.diag + lam * eye6[None]
        D = D * pf[:, None, None] + eye6[None] * (1.0 - pf)[:, None, None]
        pf_next = jnp.concatenate([pf[1:], jnp.zeros_like(pf[:1])])
        upper = jnp.transpose(lin.Hij, (2, 0, 1)) * (pf * pf_next)[:, None, None]
        fac = td.pcr_factor(D, upper)

        def precond(r_soa):
            return jnp.transpose(
                td.pcr_solve(fac, jnp.transpose(r_soa)) * pf[:, None]
            )

    A = lin.Hll + lam * eye3[None]
    A = A * lmf[:, None, None] + eye3[None] * (1.0 - lmf)[:, None, None]
    Ainv = inv33(A)
    gl = lin.gl * lmf[:, None]
    y = jnp.einsum("lij,lj->li", Ainv, gl)
    yb = jnp.transpose(
        _gather_oh(se.oh_lo, se.oh_hi, y, L).reshape(K, R, 3), (2, 1, 0)
    )
    # c = sum_r W y = Jp^T O' (Rt yb)
    c = _obs_apply_jpT(ml.v, _m33_vec(ml.Ow, _m33_vec(ml.Rt, yb)))
    gp_soa = jnp.transpose(lin.gp)
    b = -(gp_soa - c) * pf_soa

    if precond is None:
        Mdiag = lin.diag + lam * eye6[None]
        Mdiag = Mdiag * pf[:, None, None] + eye6[None] * (1.0 - pf)[:, None, None]
        Minv = jnp.transpose(lm_inv66(Mdiag), (1, 2, 0))  # [6,6,K]

        def precond(r_soa):
            return _m66_vec(Minv, r_soa) * pf_soa

    def matvec(p):
        return _soa_matvec_inner(ml, Ainv, lam, pf_soa, p, prior)

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
        Ap = matvec(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return x, r, p, rz_new, it + 1

    dp_soa, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x, r, p, rz, jnp.zeros((), jnp.int32))
    )

    dpk = dp_soa * pf_soa
    a = _obs_apply_jp(ml.v, dpk)
    wd = _m33T_vec(ml.Rt, _m33_vec(ml.Ow, a))  # W^T dp per slot
    t = _seg_sum_oh(
        se.oh_lo, se.oh_hi, jnp.transpose(wd, (2, 1, 0)).reshape(-1, 3), L
    )
    db = jnp.einsum("lij,lj->li", Ainv, (-gl - t)) * lmf[:, None]
    return jnp.transpose(dpk), db


def _soa_matvec_inner(ml, Ainv, lam, pf_soa, x, prior):
    L = Ainv.shape[0]
    K = x.shape[1]
    R = ml.v.shape[1]
    x = x * pf_soa
    a = _obs_apply_jp(ml.v, x)
    Oa = _m33_vec(ml.Ow, a)
    wx = _m33T_vec(ml.Rt, Oa)
    t = _seg_sum_oh(
        ml.oh_lo, ml.oh_hi, jnp.transpose(wx, (2, 1, 0)).reshape(-1, 3), L
    )
    z = jnp.einsum("lij,lj->li", Ainv, t)
    zb = jnp.transpose(
        _gather_oh(ml.oh_lo, ml.oh_hi, z, L).reshape(K, R, 3), (2, 1, 0)
    )
    m = Oa - _m33_vec(ml.Ow, _m33_vec(ml.Rt, zb))
    u_obs = _obs_apply_jpT(ml.v, m)

    xj = _roll_up_soa(x)
    vi = _m66_vec(ml.Hii, x) + _m66_vec(ml.Hij, xj)
    vj = _m66T_vec(ml.Hij, x) + _m66_vec(ml.Hjj, xj)
    u = u_obs + vi + _shift_down_soa(vj)

    if prior is not None:
        PB = prior.p_idx.shape[0]
        xp = jnp.transpose(x)[prior.p_idx].reshape(-1)
        add = (prior.Hp @ xp).reshape(PB, 6)
        u = jnp.transpose(jnp.transpose(u).at[prior.p_idx].add(add))
    return (u + lam * x) * pf_soa


def run_lm_loop_soa(
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
    use_pallas: bool = False,
    pallas_interpret: bool = False,
):
    """run_lm_loop_pcg_ellk on the SoA layout — same Nielsen LM semantics,
    but the while carry holds only (p, l, chi2, lam, nu): each body
    linearizes at the carried ACCEPTED state and evaluates the trial point
    with the chi2-only pass (``soa_chi2``, float-identical to the full
    build's chi2), so no multi-MB block tree rides the carry and no
    tree-wide accept/reject select runs per iteration. Measured: the tree
    carry + select cost more than the (rare) relinearize-after-reject this
    trades them for. The accept/reject sequence is bitwise-identical to
    the carry-the-blocks scheme (pure-function relinearization at the same
    state reproduces the same values)."""
    dtype = poses.dtype
    se = build_soa_edges(
        edge_args, poses.shape[0], ell_rows[2], landmarks.shape[0]
    )

    def build(p, l):
        lin = soa_linearize(
            p, l, se, robust_kind=robust_kind, robust_delta=robust_delta,
            use_pallas=use_pallas, pallas_interpret=pallas_interpret,
        )
        if prior is not None:
            if use_pallas:
                # kernel-path fold: channel/grid fields updated so
                # resident_solve consumes post-prior values directly
                lin = apply_prior_soa_k(lin, prior, p, l)
            else:
                # apply_prior_blocks touches only Hll/gp/gl/diag/chi2 via
                # _replace — field names shared with EllBlocks by design,
                # so the fold is literally the same code as the AoS paths
                lin = apply_prior_blocks(lin, prior, p, l)
        return lin

    def chi2_at(p, l):
        return soa_chi2(
            p, l, se, robust_kind=robust_kind, robust_delta=robust_delta,
            prior=prior, use_pallas=use_pallas,
            pallas_interpret=pallas_interpret,
        )

    # initial build: XLA dead-code-eliminates everything but chi2 and the
    # diagonals the lambda seed needs
    lin0 = build(poses, landmarks)
    chi2_0 = lin0.chi2
    diag_max = jnp.maximum(
        jnp.max(jnp.abs(jnp.diagonal(lin0.diag, axis1=-2, axis2=-1))),
        jnp.max(jnp.abs(jnp.diagonal(lin0.Hll, axis1=-2, axis2=-1))),
    )
    init_lambda = jnp.asarray(init_lambda, dtype)
    lam0 = jnp.where(
        init_lambda > 0, init_lambda, init_lambda_tau * jnp.maximum(diag_max, 1.0)
    ).astype(dtype)

    def cond(carry):
        _, _, _, _, _, it, done = carry
        return (it < max_iterations) & jnp.logical_not(done)

    def body(carry):
        p, l, chi2_cur, lam, nu, it, done = carry
        lin = build(p, l)
        dp, dl = soa_schur_step(
            lin, se, lam, pose_free, lm_free, max_cg_iters,
            precond_kind=precond_kind, prior=prior, cg_tol=cg_tol,
            use_pallas=use_pallas, pallas_interpret=pallas_interpret,
        )
        p_new = jax.vmap(geo.pose_retract)(p, dp.astype(p.dtype))
        l_new = l + dl.astype(l.dtype)
        chi2_new = chi2_at(p_new, l_new)

        delta = jnp.concatenate([dp.reshape(-1), dl.reshape(-1)])
        gvec = jnp.concatenate([lin.gp.reshape(-1), lin.gl.reshape(-1)])
        pred = lam * jnp.dot(delta, delta) - jnp.dot(delta, gvec)
        rho = (chi2_cur - chi2_new) / jnp.maximum(pred, 1e-12)
        finite = jnp.isfinite(chi2_new) & jnp.all(jnp.isfinite(delta))
        accept = (rho > 0) & finite

        p = jnp.where(accept, p_new, p)
        l = jnp.where(accept, l_new, l)
        lam_acc = lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam = jnp.where(accept, lam_acc, lam * nu)
        nu = jnp.where(accept, 2.0, nu * 2.0)
        converged = accept & (
            (chi2_cur - chi2_new) <= rel_tol * jnp.maximum(chi2_cur, 1e-12)
        )
        done = converged | (lam > 1e12)
        chi2_cur = jnp.where(accept, chi2_new, chi2_cur)
        return p, l, chi2_cur, lam, nu, it + 1, done

    init = (
        poses, landmarks, chi2_0, lam0, jnp.asarray(2.0, dtype),
        jnp.zeros((), jnp.int32), jnp.zeros((), bool),
    )
    p, l, chi2_f, lam, _, it, _ = jax.lax.while_loop(cond, body, init)
    # final-state linearization for marginal recovery (once per solve)
    lin_f = build(p, l)
    return p, l, LMStats(it, chi2_0, chi2_f, lam), lin_f, se


def soa_to_ell_blocks(lin: SoALin, se: SoAEdges) -> EllBlocks:
    """Materialize the AoS EllBlocks view (marginal recovery runs once per
    solve on it — landmark_marginals_mf_ellk unchanged)."""
    K, R = se.ll.shape
    # H_kk = [[O', -O'B],[., -hat(v) O'B]];  W_kl = [[-O'Rt],[-hat(v) O'Rt]]
    OB = _ob_product(lin.Ow, lin.v)
    BtOB = -_hat_mul(lin.v, OB)
    Hkk = _assemble_h66(lin.Ow, -OB, BtOB)  # [6,6,R,K]
    ORt = _m33_mul(lin.Ow, lin.Rt)
    W_top = -ORt
    W_bot = -_hat_mul(lin.v, ORt)
    Wk = jnp.concatenate([W_top, W_bot], axis=0)  # [6,3,R,K]
    return EllBlocks(
        ll=se.ll,
        H_ii=jnp.transpose(lin.Hii, (2, 0, 1)),
        H_ij=jnp.transpose(lin.Hij, (2, 0, 1)),
        H_jj=jnp.transpose(lin.Hjj, (2, 0, 1)),
        H_kk=jnp.transpose(Hkk, (3, 2, 0, 1)),
        W_kl=jnp.transpose(Wk, (3, 2, 0, 1)),
        Hll=lin.Hll,
        gp=lin.gp,
        gl=lin.gl,
        diag=lin.diag,
        chi2=lin.chi2,
    )


@partial(
    jax.jit,
    static_argnames=(
        "max_iterations", "min_edges", "rel_tol", "max_cg_iters",
        "robust_kind", "robust_delta", "precond_kind",
        "with_marginals", "ell_rows", "cg_tol", "use_pallas",
        "pallas_interpret",
    ),
)
def lm_optimize_soa(
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
    with_marginals: bool = False,
    ell_rows: tuple = (1, 1, 8),
    cg_tol: float = 1e-8,
    use_pallas: bool | str = "auto",
    pallas_interpret: bool = False,
):
    """Drop-in for pcg.lm_optimize_pcg(assembly='ell') on the SoA layout.

    ``use_pallas='auto'`` engages the VMEM-resident kernels on TPU when
    the static shapes fit the budget and the configuration is in kernel
    scope (jacobi preconditioner; fixed-lag priors supported in-kernel
    since r5) — pallas_cg.fits()."""
    if use_pallas == "auto":
        from semantic_slam_tpu.solver.pallas_cg import digit_split, fits

        K = g.poses.shape[0]
        L = g.landmarks.shape[0]
        lo_d, hi_d = digit_split(L)
        use_pallas = (
            jax.default_backend() == "tpu"
            and precond_kind == "jacobi"
            and fits(K, ell_rows[2], L, lo_d, hi_d)
        )
    pose_free, lm_free = _free_masks(g)
    poses, landmarks, stats, lin_f, se = run_lm_loop_soa(
        g.poses, g.landmarks, _edge_args(g), pose_free, lm_free,
        max_iterations, rel_tol, max_cg_iters,
        robust_kind=robust_kind, robust_delta=robust_delta,
        init_lambda=init_lambda, precond_kind=precond_kind, prior=prior,
        ell_rows=ell_rows, cg_tol=cg_tol,
        use_pallas=bool(use_pallas), pallas_interpret=pallas_interpret,
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
        eb_f = soa_to_ell_blocks(lin_f, se)
        marg = landmark_marginals_mf_ellk(eb_f, pose_free, lm_free, prior=prior)
        return g, stats, marg
    return g, stats
