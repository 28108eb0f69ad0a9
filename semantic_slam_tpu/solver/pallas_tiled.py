"""Grid-tiled solver kernels: K-block Pallas kernels + XLA-hosted CG loop.

The r5 resident kernels (solver/pallas_cg.py) hold the WHOLE problem in
VMEM, which caps them at the Mosaic envelope 1024 <= K <= 4096 and locks
them out of the mesh path (a kernel cannot psum mid-loop). This module
re-cuts the same channel math (chain_soa / pallas_cg helpers) into
PER-BLOCK kernels over K-tiles of 1024..4096 lanes, with the CG loop and
all cross-block reductions hosted in XLA:

  * ``tiled_linearize``   — obs + chain linearization, grid over K-blocks;
    landmark digit-grid tables and chi2 accumulate across blocks in the
    kernel's own output refs (sequential TPU grid).
  * ``tiled_mv_fwd``      — first matvec half: Oa = O'(Jp x) per block,
    plus the landmark reduction T = seg-sum(Rt^T Oa) accumulated across
    blocks. T is exactly the [3L]-class array the mesh path psums.
  * ``tiled_mv_bwd``      — second half: u = Jp^T(Oa - O' Rt z) + chain
    terms, given the (psum'd, Ainv-applied) landmark grids z.
  * ``tiled_chi2``        — trial-point objective, accumulated over blocks.

Why this closes BOTH round-4 verdict items at once:

  * K > 4096 (single chip): grid = K/Kb blocks, identity reductions — the
    envelope is gone; only the per-block shapes (all <= the proven K=4096
    family) reach Mosaic.
  * multi-chip: each shard runs the same kernels over ITS pose rows
    (grid = K_shard/Kb); the host inserts psums exactly where the
    single-chip host inserts identity — [3L] after ``tiled_mv_fwd``,
    [6K] after ``tiled_mv_bwd`` — the same collective sizes as the r3
    sharded ELL path, at kernel-rate shard-local compute.

Cost model vs the resident kernel: each CG step re-streams the factored
primitives (v 3 + O' 9 per slot + Rt 9 + chain 108 floats/pose) from HBM
instead of holding them in VMEM — at K=4096/R=8 that is ~2.8 MB/step,
~3.5 us at v5e HBM speed, vs the resident kernel's zero. Single-chip
1024 <= K <= 4096 therefore keeps the resident path; this module serves
the sizes and meshes the resident path cannot.

Layout rules (same hard-won set as pallas_cg, adapted to tiling):
edge tensors are [R, C, K] (leading-dim r indexing of the loaded block is
contiguous; the K axis is the tiled lanes), pose tensors [C, K], digit
vectors [R, 1, K] i32, landmark tables ride as [Lg, D] with in-kernel
leading-dim reshapes to digit grids, one-hots are regenerated per (r,
block) from iota compares.

Reference: the g2o lm_var iteration (graph_slam.cpp:182-219), scaled past
the resident envelope and across the mesh
(semantic_graph_slam.cpp:58-102 — the loop being scaled).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from semantic_slam_tpu.solver import chain_soa as ch
from semantic_slam_tpu.solver.pallas_cg import (
    VMEM_BUDGET_BYTES,
    _cross,
    _m33_vec,
    _m33T_vec,
    _m66_vec,
    _m66T_vec,
    _ob_product_k,
    _robust_rho_w,
    digit_split,
)

TILE_MIN = 1024  # Mosaic crashes this kernel family below 1024 lanes
TILE_MAX = 2048  # Kb=4096 blocks blow the 16 MB scoped-VMEM cap in the
                 # obs-linearize kernel at R=4/L=2048 (measured 17.4M);
                 # Kb=2048 is the proven-good block (the K=4096 runs use it)


_FORCE_BLOCK: int | None = None  # tests/benches pin the tile size


def pick_block(Kl: int, hi: int = 0) -> int | None:
    """K-tile size in [TILE_MIN, TILE_MAX] dividing Kl (capacities are
    powers of two — engine growth doubles). Prefers a grid of >= 2 blocks
    so the Pallas pipeline overlaps each block's DMA with the previous
    block's compute. ``hi`` is the landmark digit-grid height: the
    obs-linearize kernel's scoped VMEM sits ~1 MB under the 16 MB cap at
    Kb=2048/hi=64 and the hi_oh temps grow with hi, so hi >= 128
    (L > 2048) caps the tile at 1024 (measured: K=16384/L=4096 blows the
    cap at Kb=2048 by 1.06M and runs at Kb=1024 — 4.61 ms/iter vs 10.4
    XLA). None = out of kernel scope."""
    if _FORCE_BLOCK is not None:
        return _FORCE_BLOCK if Kl % _FORCE_BLOCK == 0 else None
    if Kl < TILE_MIN:
        return None
    cap = 1024 if hi >= 128 else TILE_MAX
    kb = min(cap, Kl // 2) if Kl >= 2 * TILE_MIN else min(cap, Kl)
    while kb >= TILE_MIN:
        if Kl % kb == 0:
            return kb
        kb //= 2
    return None


def tiled_fits(Kl: int, R: int, L: int) -> bool:
    """Static predicate: a block size exists and the per-block VMEM is in
    budget (the tiled kernels' block shapes are the proven resident-kernel
    family, so the envelope check is just the tile bound)."""
    lo_w, hi = digit_split(L)
    kb = pick_block(Kl, hi)
    if kb is None:
        return False
    Lg = hi * lo_w
    per_block = (
        (3 + 9 + 3 + 9) * R * kb  # meas/info/v/Ow blocks
        + 2 * R * kb              # digit blocks (i32)
        + (9 + 7 + 6 + 36) * kb   # Rt/t+q/gp/diag
        + 3 * 36 * kb             # chain blocks
        + 12 * lo_w * hi + 4 * Lg  # grids + lm table
        + (2 * lo_w + hi + 12) * kb  # oh/dot temps
    )
    return per_block * 4 < VMEM_BUDGET_BYTES


def _oh_rows(lod, hid, lo_w, hi, Kb):
    """One-hot factors for one r's digit rows ([1, Kb] each)."""
    f32 = jnp.float32
    lo_oh = (
        jax.lax.broadcasted_iota(jnp.int32, (lo_w, Kb), 0) == lod
    ).astype(f32)
    hi_oh = (
        jax.lax.broadcasted_iota(jnp.int32, (hi, Kb), 0) == hid
    ).astype(f32)
    return lo_oh, hi_oh


def _gather_grids(grids, lo_oh, hi_oh):
    """Gather table rows for one (r, block): [3, Kb] from [lo_w, hi] grids."""
    f32 = jnp.float32
    rows = []
    for d in range(3):
        wT = jax.lax.dot_general(
            grids[d], hi_oh, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # [lo_w, Kb]
        rows.append(jnp.sum(lo_oh * wT, axis=0, keepdims=True))
    return jnp.concatenate(rows, axis=0)


# ---------------------------------------------------------------------------
# observation linearize (tiled)
# ---------------------------------------------------------------------------


def _lin_obs_kernel(
    t_ref,      # [3, Kb]
    q_ref,      # [4, Kb]
    lmT_ref,    # [3*lo_w, hi] landmark digit grids (constant across blocks;
                # the [Lg, 3] table form lane-pads 3 -> 128 and costs MBs of
                # VMEM at large L — the grid form is exact and tiny)
    meas_ref,   # [R, 3, Kb]
    info_ref,   # [R, 9, Kb]
    lodig_ref,  # [R, 1, Kb] i32
    hidig_ref,  # [R, 1, Kb] i32
    v_out,      # [R, 3, Kb]
    Ow_out,     # [R, 9, Kb]
    Rt_out,     # [9, Kb]
    gp_out,     # [6, Kb] (obs part)
    diag_out,   # [36, Kb] (obs part)
    glT_out,    # [3*lo_w, hi] accumulated across blocks
    HllT_out,   # [9*lo_w, hi] accumulated
    chi_out,    # [1, 1] SMEM accumulated
    *,
    R: int,
    lo_w: int,
    hi: int,
    robust_kind: str,
    robust_delta: float,
):
    kb = pl.program_id(0)

    @pl.when(kb == 0)
    def _():
        glT_out[:] = jnp.zeros_like(glT_out)
        HllT_out[:] = jnp.zeros_like(HllT_out)
        chi_out[0, 0] = 0.0

    Kb = t_ref.shape[1]
    f32 = jnp.float32
    t = t_ref[:]
    q = q_ref[:]
    meas = meas_ref[:]
    info = info_ref[:]
    lodig = lodig_ref[:]
    hidig = hidig_ref[:]

    Rt = ch.rotmat_ch(ch.quat_conj_ch(q))  # [3, 3, Kb]
    Rt_out[:] = Rt.reshape(9, Kb)

    lmT = lmT_ref[:]
    TzT = [lmT[d * lo_w:(d + 1) * lo_w, :] for d in range(3)]  # [lo_w, hi]

    gp_top = jnp.zeros((3, Kb), f32)
    gp_bot = jnp.zeros((3, Kb), f32)
    TL = jnp.zeros((3, 3, Kb), f32)
    TR = jnp.zeros((3, 3, Kb), f32)
    BR = jnp.zeros((3, 3, Kb), f32)
    Tgl = [jnp.zeros((lo_w, hi), f32) for _ in range(3)]
    THll = [jnp.zeros((lo_w, hi), f32) for _ in range(9)]
    chi_acc = jnp.zeros((), f32)
    v_blocks = []
    Ow_blocks = []

    for r in range(R):
        lo_oh, hi_oh = _oh_rows(lodig[r], hidig[r], lo_w, hi, Kb)
        lw = _gather_grids(TzT, lo_oh, hi_oh)  # [3, Kb]
        d_v = lw - t
        v_r = _m33_vec(Rt, d_v)
        r_r = v_r - meas[r]
        O_r = info[r].reshape(3, 3, Kb)
        Or = _m33_vec(O_r, r_r)
        chi_e = sum(r_r[i] * Or[i] for i in range(3))
        rho, w = _robust_rho_w(chi_e, robust_kind, robust_delta)
        chi_acc = chi_acc + jnp.sum(rho)
        if w is None:
            Ow_r = O_r
            Orw = Or
        else:
            Ow_r = O_r * w[None, None]
            Orw = Or * w[None]
        v_blocks.append(v_r)
        Ow_blocks.append(Ow_r.reshape(9, Kb))

        gp_top = gp_top - Orw
        gp_bot = gp_bot - _cross(v_r, Orw)
        gl_e = _m33T_vec(Rt, Orw)
        ORt = ch.m33_mul(Ow_r, Rt)
        Hll_e = ch.m33T_mul(Rt, ORt)
        for d in range(3):
            Tgl[d] = Tgl[d] + jax.lax.dot_general(
                lo_oh * gl_e[d:d + 1].reshape(1, Kb), hi_oh,
                (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )
        for i in range(3):
            for j in range(3):
                c = 3 * i + j
                THll[c] = THll[c] + jax.lax.dot_general(
                    lo_oh * Hll_e[i, j].reshape(1, Kb), hi_oh,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=f32,
                )
        OB = _ob_product_k(Ow_r, v_r)
        TL = TL + Ow_r
        TR = TR - OB
        BR = BR - ch.hat_mul(v_r, OB)

    v_out[:] = jnp.stack(v_blocks, axis=0)
    Ow_out[:] = jnp.stack(Ow_blocks, axis=0)
    gp_out[:] = jnp.concatenate([gp_top, gp_bot], axis=0)
    TRt = jnp.stack(
        [jnp.stack([TR[j, i] for j in range(3)], axis=0) for i in range(3)],
        axis=0,
    )
    diag_out[:] = jnp.concatenate(
        [
            jnp.concatenate([TL, TR], axis=1),
            jnp.concatenate([TRt, BR], axis=1),
        ],
        axis=0,
    ).reshape(36, Kb)
    glT_out[:] = glT_out[:] + jnp.concatenate(
        [Tgl[d] for d in range(3)], axis=0
    )
    HllT_out[:] = HllT_out[:] + jnp.concatenate(
        [THll[c] for c in range(9)], axis=0
    )
    chi_out[0, 0] = chi_out[0, 0] + chi_acc


# ---------------------------------------------------------------------------
# chain linearize (tiled; successor poses precomputed at host)
# ---------------------------------------------------------------------------


def _lin_chain_kernel(
    t_ref,    # [3, Kb]
    q_ref,    # [4, Kb]
    tj_ref,   # [3, Kb] successor pose (global roll done at host)
    qj_ref,   # [4, Kb]
    omt_ref,  # [3, Kb]
    omq_ref,  # [4, Kb]
    oO_ref,   # [6, 6, Kb] (zeroed on masked rows)
    Hii_out,  # [6, 6, Kb]
    Hij_out,
    Hjj_out,
    gi_out,   # [6, Kb]
    gj_out,   # [6, Kb]
    chi_out,  # [1, 1] SMEM accumulated
):
    kb = pl.program_id(0)

    @pl.when(kb == 0)
    def _():
        chi_out[0, 0] = 0.0

    Hii_c, Hij_c, Hjj_c, gi_c, gj_c, chi_k = ch.chain_linearize_ch(
        t_ref[:], q_ref[:], tj_ref[:], qj_ref[:],
        omt_ref[:], omq_ref[:], oO_ref[:],
    )
    Hii_out[:] = Hii_c
    Hij_out[:] = Hij_c
    Hjj_out[:] = Hjj_c
    gi_out[:] = gi_c
    gj_out[:] = gj_c
    chi_out[0, 0] = chi_out[0, 0] + jnp.sum(chi_k)


# ---------------------------------------------------------------------------
# matvec halves (tiled)
# ---------------------------------------------------------------------------


def _mv_fwd_kernel(
    v_ref,      # [R, 3, Kb]
    Ow_ref,     # [R, 9, Kb]
    lodig_ref,  # [R, 1, Kb]
    hidig_ref,  # [R, 1, Kb]
    Rt_ref,     # [9, Kb]
    x_ref,      # [6, Kb] (pre-masked at host)
    Oa_out,     # [R, 3, Kb]
    T_out,      # [3*lo_w, hi] accumulated
    *,
    R: int,
    lo_w: int,
    hi: int,
):
    kb = pl.program_id(0)

    @pl.when(kb == 0)
    def _():
        T_out[:] = jnp.zeros_like(T_out)

    Kb = x_ref.shape[1]
    f32 = jnp.float32
    v = v_ref[:]
    Ow = Ow_ref[:]
    lodig = lodig_ref[:]
    hidig = hidig_ref[:]
    Rt = Rt_ref[:].reshape(3, 3, Kb)
    x = x_ref[:]
    xt = x[:3]
    xr = x[3:]

    Td = [jnp.zeros((lo_w, hi), f32) for _ in range(3)]
    Oa_blocks = []
    for r in range(R):
        v_r = v[r]
        a_r = -xt + _cross(v_r, xr)
        Oa_r = _m33_vec(Ow[r].reshape(3, 3, Kb), a_r)
        Oa_blocks.append(Oa_r)
        wx_r = _m33T_vec(Rt, Oa_r)
        lo_oh, hi_oh = _oh_rows(lodig[r], hidig[r], lo_w, hi, Kb)
        for d in range(3):
            Td[d] = Td[d] + jax.lax.dot_general(
                lo_oh * wx_r[d:d + 1, :], hi_oh,
                (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )
    Oa_out[:] = jnp.stack(Oa_blocks, axis=0)
    T_out[:] = T_out[:] + jnp.concatenate([Td[d] for d in range(3)], axis=0)


def _mv_bwd_kernel(
    v_ref,      # [R, 3, Kb]
    Ow_ref,     # [R, 9, Kb]
    lodig_ref,  # [R, 1, Kb]
    hidig_ref,
    Rt_ref,     # [9, Kb]
    Oa_ref,     # [R, 3, Kb]
    zT_ref,     # [3*lo_w, hi] (constant across blocks; post-psum, Ainv'd)
    x_ref,      # [6, Kb] (pre-masked)
    xj_ref,     # [6, Kb] (global roll done at host)
    Hii_ref,    # [6, 6, Kb]
    Hij_ref,
    Hjj_ref,
    u_out,      # [6, Kb]  u_obs + Hii x + Hij xj  (no vj shift, no lam)
    vj_out,     # [6, Kb]  Hij^T x + Hjj xj  (host shifts down globally)
    *,
    R: int,
    lo_w: int,
    hi: int,
):
    Kb = x_ref.shape[1]
    f32 = jnp.float32
    v = v_ref[:]
    Ow = Ow_ref[:]
    lodig = lodig_ref[:]
    hidig = hidig_ref[:]
    Rt = Rt_ref[:].reshape(3, 3, Kb)
    Oa = Oa_ref[:]
    x = x_ref[:]
    xj = xj_ref[:]
    zT = zT_ref[:]
    z_grids = [zT[d * lo_w:(d + 1) * lo_w, :] for d in range(3)]

    u_top = jnp.zeros((3, Kb), f32)
    u_bot = jnp.zeros((3, Kb), f32)
    for r in range(R):
        lo_oh, hi_oh = _oh_rows(lodig[r], hidig[r], lo_w, hi, Kb)
        zb_r = _gather_grids(z_grids, lo_oh, hi_oh)
        v_r = v[r]
        Ow_r = Ow[r].reshape(3, 3, Kb)
        m_r = Oa[r] - _m33_vec(Ow_r, _m33_vec(Rt, zb_r))
        u_top = u_top - m_r
        u_bot = u_bot - _cross(v_r, m_r)
    u_obs = jnp.concatenate([u_top, u_bot], axis=0)

    Hii = Hii_ref[:]
    Hij = Hij_ref[:]
    Hjj = Hjj_ref[:]
    u_out[:] = u_obs + _m66_vec(Hii, x) + _m66_vec(Hij, xj)
    vj_out[:] = _m66T_vec(Hij, x) + _m66_vec(Hjj, xj)


# ---------------------------------------------------------------------------
# chi2 (tiled)
# ---------------------------------------------------------------------------


def _chi2_kernel(
    t_ref,      # [3, Kb]
    q_ref,      # [4, Kb]
    tj_ref,     # [3, Kb]
    qj_ref,     # [4, Kb]
    lmT_ref,    # [3*lo_w, hi] landmark digit grids
    meas_ref,   # [R, 3, Kb]
    info_ref,   # [R, 9, Kb]
    lodig_ref,  # [R, 1, Kb]
    hidig_ref,
    omt_ref,    # [3, Kb]
    omq_ref,    # [4, Kb]
    oO_ref,     # [6, 6, Kb]
    chi_out,    # [1, 1] SMEM accumulated
    *,
    R: int,
    lo_w: int,
    hi: int,
    robust_kind: str,
    robust_delta: float,
):
    kb = pl.program_id(0)

    @pl.when(kb == 0)
    def _():
        chi_out[0, 0] = 0.0

    Kb = t_ref.shape[1]
    f32 = jnp.float32
    t = t_ref[:]
    q = q_ref[:]
    meas = meas_ref[:]
    info = info_ref[:]
    lodig = lodig_ref[:]
    hidig = hidig_ref[:]
    Rt = ch.rotmat_ch(ch.quat_conj_ch(q))

    lmT = lmT_ref[:]
    TzT = [lmT[d * lo_w:(d + 1) * lo_w, :] for d in range(3)]

    chi_acc = jnp.zeros((), f32)
    for r in range(R):
        lo_oh, hi_oh = _oh_rows(lodig[r], hidig[r], lo_w, hi, Kb)
        lw = _gather_grids(TzT, lo_oh, hi_oh)
        v_r = _m33_vec(Rt, lw - t)
        r_r = v_r - meas[r]
        O_r = info[r].reshape(3, 3, Kb)
        Or = _m33_vec(O_r, r_r)
        chi_e = sum(r_r[i] * Or[i] for i in range(3))
        rho, _ = _robust_rho_w(chi_e, robust_kind, robust_delta)
        chi_acc = chi_acc + jnp.sum(rho)

    chi_k = ch.chain_chi2_ch(
        t, q, tj_ref[:], qj_ref[:], omt_ref[:], omq_ref[:], oO_ref[:]
    )
    chi_out[0, 0] = chi_out[0, 0] + chi_acc + jnp.sum(chi_k)


# ---------------------------------------------------------------------------
# host wrappers (traced inline from the LM loop; shard-local shapes)
# ---------------------------------------------------------------------------


def _bs(block, n_extra_dims):
    """BlockSpec for a K-tiled array with ``n_extra_dims`` leading dims."""
    zeros = (0,) * n_extra_dims
    return pl.BlockSpec(
        block, lambda i, _z=zeros: _z + (i,), memory_space=pltpu.VMEM
    )


def _bs_const(shape):
    nd = len(shape)
    zeros = (0,) * nd
    return pl.BlockSpec(
        shape, lambda i, _z=zeros: _z, memory_space=pltpu.VMEM
    )


def tiled_linearize(
    t_loc,      # [3, Kl]
    q_loc,      # [4, Kl]
    tj_loc,     # [3, Kl]
    qj_loc,     # [4, Kl]
    lmT,        # [3*lo_w, hi] landmark digit grids (host: _tab_to_grids)
    meas_t,     # [R, 3, Kl]
    info_t,     # [R, 9, Kl]
    lodig,      # [R, 1, Kl] i32
    hidig,      # [R, 1, Kl] i32
    omt,        # [3, Kl]
    omq,        # [4, Kl]
    oO,         # [6, 6, Kl]
    lo_w: int,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    interpret: bool = False,
):
    """Tiled obs+chain linearization over the local rows. Returns
    (v [R,3,Kl], Ow [R,9,Kl], Rt [9,Kl], Hii/Hij/Hjj [6,6,Kl],
    gp_part [6,Kl] (obs + gi), gj [6,Kl] (host shifts globally),
    diag_part [36,Kl] (obs + Hii), Hjj_d [36,Kl] (host shifts),
    glT [3*lo_w,hi], HllT [9*lo_w,hi], chi)."""
    R = meas_t.shape[0]
    Kl = t_loc.shape[1]
    hi = lmT.shape[1]
    f32 = jnp.float32
    Kb = pick_block(Kl, hi)
    grid = Kl // Kb

    kern = functools.partial(
        _lin_obs_kernel, R=R, lo_w=lo_w, hi=hi,
        robust_kind=robust_kind, robust_delta=robust_delta,
    )
    v, Ow, Rt, gp_obs, diag_obs, glT, HllT, chi_l = pl.pallas_call(
        kern,
        grid=(grid,),
        out_shape=(
            jax.ShapeDtypeStruct((R, 3, Kl), f32),
            jax.ShapeDtypeStruct((R, 9, Kl), f32),
            jax.ShapeDtypeStruct((9, Kl), f32),
            jax.ShapeDtypeStruct((6, Kl), f32),
            jax.ShapeDtypeStruct((36, Kl), f32),
            jax.ShapeDtypeStruct((3 * lo_w, hi), f32),
            jax.ShapeDtypeStruct((9 * lo_w, hi), f32),
            jax.ShapeDtypeStruct((1, 1), f32),
        ),
        in_specs=[
            _bs((3, Kb), 1),
            _bs((4, Kb), 1),
            _bs_const((3 * lo_w, hi)),
            _bs((R, 3, Kb), 2),
            _bs((R, 9, Kb), 2),
            _bs((R, 1, Kb), 2),
            _bs((R, 1, Kb), 2),
        ],
        out_specs=(
            _bs((R, 3, Kb), 2),
            _bs((R, 9, Kb), 2),
            _bs((9, Kb), 1),
            _bs((6, Kb), 1),
            _bs((36, Kb), 1),
            _bs_const((3 * lo_w, hi)),
            _bs_const((9 * lo_w, hi)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(
        t_loc.astype(f32), q_loc.astype(f32), lmT.astype(f32),
        meas_t.astype(f32), info_t.astype(f32),
        lodig.astype(jnp.int32), hidig.astype(jnp.int32),
    )
    Hii, Hij, Hjj, gi, gj, chi_o = pl.pallas_call(
        _lin_chain_kernel,
        grid=(grid,),
        out_shape=(
            jax.ShapeDtypeStruct((6, 6, Kl), f32),
            jax.ShapeDtypeStruct((6, 6, Kl), f32),
            jax.ShapeDtypeStruct((6, 6, Kl), f32),
            jax.ShapeDtypeStruct((6, Kl), f32),
            jax.ShapeDtypeStruct((6, Kl), f32),
            jax.ShapeDtypeStruct((1, 1), f32),
        ),
        in_specs=[
            _bs((3, Kb), 1), _bs((4, Kb), 1),
            _bs((3, Kb), 1), _bs((4, Kb), 1),
            _bs((3, Kb), 1), _bs((4, Kb), 1),
            _bs((6, 6, Kb), 2),
        ],
        out_specs=(
            _bs((6, 6, Kb), 2), _bs((6, 6, Kb), 2), _bs((6, 6, Kb), 2),
            _bs((6, Kb), 1), _bs((6, Kb), 1),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(
        t_loc.astype(f32), q_loc.astype(f32),
        tj_loc.astype(f32), qj_loc.astype(f32),
        omt.astype(f32), omq.astype(f32), oO.astype(f32),
    )
    gp_part = gp_obs + gi
    diag_part = diag_obs + Hii.reshape(36, Kl)
    return (
        v, Ow, Rt, Hii, Hij, Hjj,
        gp_part, gj, diag_part, Hjj.reshape(36, Kl),
        glT, HllT, chi_l[0, 0] + chi_o[0, 0],
    )


def tiled_mv_fwd(v, Ow, lodig, hidig, Rt, xm, lo_w, hi, interpret=False):
    """(Oa [R,3,Kl], T [3*lo_w, hi]) — first matvec half over local rows."""
    R, _, Kl = v.shape
    f32 = jnp.float32
    Kb = pick_block(Kl, hi)
    kern = functools.partial(_mv_fwd_kernel, R=R, lo_w=lo_w, hi=hi)
    return pl.pallas_call(
        kern,
        grid=(Kl // Kb,),
        out_shape=(
            jax.ShapeDtypeStruct((R, 3, Kl), f32),
            jax.ShapeDtypeStruct((3 * lo_w, hi), f32),
        ),
        in_specs=[
            _bs((R, 3, Kb), 2),
            _bs((R, 9, Kb), 2),
            _bs((R, 1, Kb), 2),
            _bs((R, 1, Kb), 2),
            _bs((9, Kb), 1),
            _bs((6, Kb), 1),
        ],
        out_specs=(
            _bs((R, 3, Kb), 2),
            _bs_const((3 * lo_w, hi)),
        ),
        interpret=interpret,
    )(
        v.astype(f32), Ow.astype(f32), lodig, hidig, Rt.astype(f32),
        xm.astype(f32),
    )


def tiled_mv_bwd(
    v, Ow, lodig, hidig, Rt, Oa, zT, xm, xj, Hii, Hij, Hjj, lo_w, hi,
    interpret=False,
):
    """(u_part [6,Kl], vj [6,Kl]) — second matvec half over local rows."""
    R, _, Kl = v.shape
    f32 = jnp.float32
    Kb = pick_block(Kl, hi)
    kern = functools.partial(_mv_bwd_kernel, R=R, lo_w=lo_w, hi=hi)
    return pl.pallas_call(
        kern,
        grid=(Kl // Kb,),
        out_shape=(
            jax.ShapeDtypeStruct((6, Kl), f32),
            jax.ShapeDtypeStruct((6, Kl), f32),
        ),
        in_specs=[
            _bs((R, 3, Kb), 2),
            _bs((R, 9, Kb), 2),
            _bs((R, 1, Kb), 2),
            _bs((R, 1, Kb), 2),
            _bs((9, Kb), 1),
            _bs((R, 3, Kb), 2),
            _bs_const(zT.shape),
            _bs((6, Kb), 1),
            _bs((6, Kb), 1),
            _bs((6, 6, Kb), 2),
            _bs((6, 6, Kb), 2),
            _bs((6, 6, Kb), 2),
        ],
        out_specs=(
            _bs((6, Kb), 1),
            _bs((6, Kb), 1),
        ),
        interpret=interpret,
    )(
        v.astype(f32), Ow.astype(f32), lodig, hidig, Rt.astype(f32),
        Oa.astype(f32), zT.astype(f32),
        xm.astype(f32), xj.astype(f32),
        Hii.astype(f32), Hij.astype(f32), Hjj.astype(f32),
    )


def tiled_chi2(
    t_loc, q_loc, tj_loc, qj_loc, lmT, meas_t, info_t, lodig, hidig,
    omt, omq, oO, lo_w,
    robust_kind="none", robust_delta=1.0, interpret=False,
):
    """Local-rows objective (obs + chain), one tiled kernel."""
    R = meas_t.shape[0]
    Kl = t_loc.shape[1]
    hi = lmT.shape[1]
    f32 = jnp.float32
    Kb = pick_block(Kl, hi)
    kern = functools.partial(
        _chi2_kernel, R=R, lo_w=lo_w, hi=hi,
        robust_kind=robust_kind, robust_delta=robust_delta,
    )
    chi = pl.pallas_call(
        kern,
        grid=(Kl // Kb,),
        out_shape=jax.ShapeDtypeStruct((1, 1), f32),
        in_specs=[
            _bs((3, Kb), 1), _bs((4, Kb), 1),
            _bs((3, Kb), 1), _bs((4, Kb), 1),
            _bs_const((3 * lo_w, hi)),
            _bs((R, 3, Kb), 2),
            _bs((R, 9, Kb), 2),
            _bs((R, 1, Kb), 2),
            _bs((R, 1, Kb), 2),
            _bs((3, Kb), 1), _bs((4, Kb), 1),
            _bs((6, 6, Kb), 2),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(
        t_loc.astype(f32), q_loc.astype(f32),
        tj_loc.astype(f32), qj_loc.astype(f32), lmT.astype(f32),
        meas_t.astype(f32), info_t.astype(f32),
        lodig.astype(jnp.int32), hidig.astype(jnp.int32),
        omt.astype(f32), omq.astype(f32), oO.astype(f32),
    )
    return chi[0, 0]
