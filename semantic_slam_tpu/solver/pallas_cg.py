"""VMEM-resident solver kernels: the LM iteration's device work as three
Pallas TPU kernels.

r4 made the CG inner loop and the observation linearize resident; the
remaining XLA in-loop work (odometry-chain linearize, the Schur RHS ``b``
build, the landmark back-substitution, the block-Jacobi/landmark inverses,
and the trial-point chi2) was ~0.5 of the 0.93 ms/iter at K=4096 — larger
than both kernels combined (VERDICT r4 "half the solve is still XLA
prep"). Round 5 folds all of it in. Per LM iteration the device now runs:

  1. ``resident_linearize`` — observation AND odometry-chain linearization
     (channelwise ``chain_soa`` math) in one kernel: emits the factored CG
     primitives (v, O', Rt), chain blocks, gp/diag, and the landmark-grid
     tables gl/Hll, plus chi2.
  2. ``resident_solve`` — the whole damped Schur solve: landmark-block
     inverse A^-1 and block-Jacobi M^-1 built in-kernel, RHS
     ``b = -(gp - W A^-1 gl)``, the CG loop against VMEM-resident state,
     and the landmark back-substitution ``db`` — one kernel, no HBM
     re-streaming per step. Optional fixed-lag boundary prior (PB<=8 dense
     block) applied inside the matvec.
  3. ``resident_chi2`` — the trial-point objective (obs + chain residuals,
     robust rho) for the LM accept/reject test.

XLA keeps only the retraction, prior folds, and scalar LM bookkeeping.

Layout rules learned the hard way (Mosaic crashes on big relayouts —
[R,K]->[E] transposes/reshapes of edge-sized tensors):

  * every edge tensor lives in R-MAJOR [C, E] form (E = R*K, slot (r,k) at
    r*K+k) for the kernel's whole life; the XLA caller reshapes the SoA
    [C,R,K] channels (a no-relayout collapse) and passes r-major digit
    vectors of the slot landmark index;
  * the per-pose broadcast x -> slots is free (slots are processed per
    R-block as [*, K] lane slices); the slot-sum back is a sum over the R
    static lane slices — no transposes anywhere near E;
  * the landmark seg-sum/gather two-level contractions are standard MXU
    matmuls against one-hot factors REGENERATED per R-block from the digit
    vectors via iota compares (keeping [E, lo_w+hi] factors resident blew
    the K=4096 VMEM budget); only [lo_w, hi]/[Lg, few]-sized tiles get
    transposed.

Numerics: float-identical op classes to the XLA SoA path up to reduction
order; parity pinned by tests/test_pallas_cg.py (interpret mode on CPU,
compiled + value-checked on TPU via tools/tpu_kernel_check.py). Scope:
jacobi preconditioner (tridiag falls back to the XLA loop); ``fits()``
enforces the VMEM budget and the empirically-mapped Mosaic envelope.

Reference: the g2o lm_var iteration this accelerates is
``/root/reference/src/ps_graph_slam/graph_slam.cpp:182-219``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from semantic_slam_tpu.solver import chain_soa as ch

VMEM_BUDGET_BYTES = 14 * 1024 * 1024  # headroom below the ~16 MB/core


def digit_split(L: int) -> tuple[int, int]:
    """(lo_w, hi) digit split for the kernel's two-level one-hot factors.

    Picks the power-of-two lo_w minimizing the kernel's per-block VMEM
    temps (lo_oh + wT are [lo_w, K], hi_oh is [hi, K] -> cost 2*lo_w +
    ceil(L/lo_w); compare/dot work is ~K*L either way) — this is what
    stretches the envelope to K=8192/L=2048. Both digits floored at 16:
    Mosaic miscompiles the [lo_w, hi]-tile ops below that (observed:
    hi=8/9 crash the compile helper; 16 works)."""
    best = None
    lo_w = 16
    while lo_w <= max(16, L):
        hi = max(16, -(-L // lo_w))
        cost = 2 * lo_w + hi
        if best is None or cost < best[0]:
            best = (cost, lo_w, hi)
        lo_w *= 2
    return best[1], best[2]


def fits(K: int, R: int, L: int, lo_w: int, hi: int, dtype_bytes: int = 4) -> bool:
    """Static predicate for the resident kernels: VMEM budget plus the
    empirically-mapped Mosaic envelope — this toolchain's compile helper
    CRASHES (subprocess exit 1, no diagnostic) outside 1024 <= K <= 4096
    for this kernel family, independent of the VMEM estimate (K=8192
    fails even with ~12.8 MB modeled). Outside the envelope the XLA SoA
    path serves (still 1.5x the r3 layout at K=8192)."""
    if K < 1024 or K > 4096:
        return False
    E = K * R
    Lg = hi * lo_w
    persistent = (
        3 * E       # v
        + 9 * E     # Ow
        + 9 * K     # Rt (per pose; slots processed per R-block)
        + 3 * 36 * K  # chain blocks
        + 36 * K    # Minv
        + 2 * E // 2       # digit vectors (i32 [1,E] x2; one-hot blocks
                           # are regenerated per R-block from iota compares)
        + 36 * K    # gp + b + CG state (x, r, p, z)
        + 3 * E     # Oa blocks held across the two matvec passes
        + 30 * Lg   # gl/Hll tables + Ainv + y + db + masks
    )
    temps = (2 * lo_w + hi) * K + 12 * K  # per-block oh/dot temps
    return (persistent + temps) * dtype_bytes < VMEM_BUDGET_BYTES


def _m33_vec(A, x):
    return jnp.stack(
        [sum(A[i, k] * x[k] for k in range(3)) for i in range(3)], axis=0
    )


def _m33T_vec(A, x):
    return jnp.stack(
        [sum(A[k, i] * x[k] for k in range(3)) for i in range(3)], axis=0
    )


def _cross(v, x):
    return jnp.stack(
        [
            v[1] * x[2] - v[2] * x[1],
            v[2] * x[0] - v[0] * x[2],
            v[0] * x[1] - v[1] * x[0],
        ],
        axis=0,
    )


def _m66_vec(M, x):
    return jnp.stack(
        [sum(M[i, k] * x[k] for k in range(6)) for i in range(6)], axis=0
    )


def _m66T_vec(M, x):
    return jnp.stack(
        [sum(M[k, i] * x[k] for k in range(6)) for i in range(6)], axis=0
    )


def _inv33_ch(A):
    """Closed-form adjugate/det 3x3 inverse on [3, 3, K] channel arrays
    (lm.inv33's formula, channelwise so the big axis fills the lanes)."""
    a, b, c = A[0][0], A[0][1], A[0][2]
    d, e, f = A[1][0], A[1][1], A[1][2]
    g_, h, i = A[2][0], A[2][1], A[2][2]
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
    inv_det = 1.0 / det
    return jnp.stack(
        [
            jnp.stack([A11, A12, A13], axis=0),
            jnp.stack([A21, A22, A23], axis=0),
            jnp.stack([A31, A32, A33], axis=0),
        ],
        axis=0,
    ) * inv_det


def _mm33_ch(A, B):
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


def _inv66_ch(M):
    """lm.inv66 (2x2-of-3x3 block Schur) on [6, 6, K] channel arrays."""
    A = M[:3, :3]
    B = M[:3, 3:]
    C = M[3:, :3]
    D = M[3:, 3:]
    Ai = _inv33_ch(A)
    CAi = _mm33_ch(C, Ai)
    S = D - _mm33_ch(CAi, B)
    Si = _inv33_ch(S)
    AiB = _mm33_ch(Ai, B)
    TL = Ai + _mm33_ch(_mm33_ch(AiB, Si), CAi)
    TR = -_mm33_ch(AiB, Si)
    BL = -_mm33_ch(Si, CAi)
    return jnp.concatenate(
        [
            jnp.concatenate([TL, TR], axis=1),
            jnp.concatenate([BL, Si], axis=1),
        ],
        axis=0,
    )


def _oh_blocks(lodig, hidig, sl, lo_w, hi, K):
    """Regenerate a slot block's one-hot factors from the digit vectors
    (iota compares — ~K*(lo_w+hi) VPU ops, vs keeping E*(lo_w+hi) floats
    resident, which blows the VMEM budget at K=4096)."""
    f32 = jnp.float32
    lo_oh = (
        jax.lax.broadcasted_iota(jnp.int32, (lo_w, K), 0) == lodig[:, sl]
    ).astype(f32)  # [lo_w, K]
    hi_oh = (
        jax.lax.broadcasted_iota(jnp.int32, (hi, K), 0) == hidig[:, sl]
    ).astype(f32)  # [hi, K]
    return lo_oh, hi_oh


# ---------------------------------------------------------------------------
# the resident SOLVE kernel: Ainv/Minv + b build + CG loop + back-substitution
# ---------------------------------------------------------------------------


def _solve_kernel(
    # VMEM inputs
    v_ref,      # [3, E] r-major slots
    Ow_ref,     # [3, 3, E]
    Rt_ref,     # [3, 3, K]
    Hii_ref,    # [6, 6, K] chain blocks
    Hij_ref,    # [6, 6, K]
    Hjj_ref,    # [6, 6, K]
    diag_ref,   # [6, 6, K] RAW pose diagonal blocks (post-prior; damping,
                # gauge masking and the analytic block-Schur inverse happen
                # IN-KERNEL where the channel math fills the lanes)
    lodig_ref,  # [1, E] i32 — lo digit of the slot landmark index
    hidig_ref,  # [1, E] i32 — hi digit
    gp_ref,     # [6, K] gradient (post-prior)
    gl_ref,     # [Lg, 3] landmark gradient table (grid-padded, post-prior)
    Hll_ref,    # [Lg, 9] landmark block table (row-major 3x3, post-prior)
    lmf_ref,    # [1, Lg] landmark-free mask (0 on pads/fixed)
    pf_ref,     # [1, K] pose-free mask
    *prior_and_scalars,  # [Hp [6PB,6PB], pidx [PB,1] i32] if has_prior,
                         # then SMEM lam [1,1], tol [1,1]
    n_steps: int,
    R: int,
    lo_w: int,
    hi: int,
    has_prior: bool,
):
    if has_prior:
        Hp_ref, pidx_ref, lam_ref, tol_ref, dp_out, db_out = prior_and_scalars
    else:
        lam_ref, tol_ref, dp_out, db_out = prior_and_scalars
    K = gp_ref.shape[1]
    Lg = hi * lo_w
    f32 = jnp.float32

    v = v_ref[:]
    Ow = Ow_ref[:]
    Rt_k = Rt_ref[:]
    Hii = Hii_ref[:]
    Hij = Hij_ref[:]
    Hjj = Hjj_ref[:]
    lodig = lodig_ref[:]
    hidig = hidig_ref[:]
    pf = pf_ref[:]  # [1, K]
    lmf = lmf_ref[:]  # [1, Lg]
    lam = lam_ref[0, 0]
    tol = tol_ref[0, 0]

    # ---- landmark-block inverse A^-1 = inv33((Hll + lam I) masked), built
    # channelwise from the grid table (the XLA AoS inv33 ran at ~3.5% tile
    # occupancy)
    hll_t = jnp.transpose(Hll_ref[:])  # [9, Lg]
    one_l = 1.0 - lmf[0]
    A = jnp.stack(
        [
            jnp.stack(
                [
                    (hll_t[3 * i + j] + (lam if i == j else 0.0)) * lmf[0]
                    + (one_l if i == j else 0.0)
                    for j in range(3)
                ],
                axis=0,
            )
            for i in range(3)
        ],
        axis=0,
    )
    Ainv = _inv33_ch(A)  # [3, 3, Lg]

    # ---- damped + gauge-masked block-Jacobi preconditioner, once per solve:
    # Md = (diag + lam I) * pf + I * (1 - pf);  Minv = inv66(Md)
    diag6 = diag_ref[:]
    pfk = pf[0]
    one_m = 1.0 - pfk
    Md = jnp.stack(
        [
            jnp.stack(
                [
                    (diag6[i, j] + (lam if i == j else 0.0)) * pfk
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

    if has_prior:
        # Hp_ref layout is CHANNEL-MAJOR [c*PBp+b, d*PBp+j] (resident_solve
        # rearranges + pads PB->PBp>=16): the in-matvec term uses only
        # static [PBp, PBp] slices, [PBp, K] one-hot reductions, and tiny
        # transposes — no flat-vector reshapes (Mosaic rejects 1-D<->2-D
        # shape casts)
        Hp = Hp_ref[:]  # [6*PBp, 6*PBp]
        PBp = pidx_ref.shape[0]
        p_oneh = (
            jax.lax.broadcasted_iota(jnp.int32, (PBp, K), 1) == pidx_ref[:]
        ).astype(f32)  # [PBp, K] (pad rows compare against K -> all-zero)

    def oh_blocks(sl):
        return _oh_blocks(lodig, hidig, sl, lo_w, hi, K)

    def roll_up(x):  # [6, K]: position k <- x[k+1], last zero
        return jnp.concatenate([x[:, 1:], jnp.zeros((6, 1), f32)], axis=1)

    def shift_down(x):  # [6, K]: position k <- x[k-1], first zero
        return jnp.concatenate([jnp.zeros((6, 1), f32), x[:, :-1]], axis=1)

    def tab_to_grids(tab_ch):
        """[3, Lg] channels -> per-component [lo_w, hi] grids (via the
        [Lg, 3] table: leading-dim reshapes only — Mosaic rejects
        1-D -> 2-D shape casts of flat channels)."""
        t3 = jnp.transpose(tab_ch).reshape(hi, lo_w, 3)
        return [jnp.transpose(t3[:, :, d]) for d in range(3)]

    def gather_block(grids, sl):
        """Gather table rows for one slot block: [3, K]."""
        lo_oh, hi_oh = oh_blocks(sl)
        rows = []
        for d in range(3):
            wT = jax.lax.dot_general(
                grids[d], hi_oh, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )  # [lo_w, K]
            rows.append(jnp.sum(lo_oh * wT, axis=0, keepdims=True))
        return jnp.concatenate(rows, axis=0)

    # ---- RHS: b = -(gp - c) * pf with c = Jp^T O' (Rt (A^-1 gl))
    gl_ch = jnp.transpose(gl_ref[:]) * lmf  # [3, Lg] masked gradient
    y = _m33_vec(Ainv, gl_ch)  # [3, Lg]
    y_grids = tab_to_grids(y)
    c_top = jnp.zeros((3, K), f32)
    c_bot = jnp.zeros((3, K), f32)
    for r in range(R):
        sl = slice(r * K, (r + 1) * K)
        yb_r = gather_block(y_grids, sl)
        m_r = _m33_vec(Ow[:, :, sl], _m33_vec(Rt_k, yb_r))
        c_top = c_top - m_r
        c_bot = c_bot - _cross(v[:, sl], m_r)
    c = jnp.concatenate([c_top, c_bot], axis=0)  # [6, K]
    b = -(gp_ref[:] - c) * pf

    def matvec(x):
        # Slots are processed per R-BLOCK ([*, K] lane slices of the
        # resident [*, E] arrays): the pose->slot broadcast disappears
        # (the block shares the pose axis), dot temps shrink from
        # [lo_w, E] to [lo_w, K], and Rt needs no E-tiling — this is what
        # fits K=4096 in VMEM.
        xm = x * pf
        xt = xm[:3]  # [3, K]
        xr = xm[3:]
        Oa_blocks = []
        TdT = [jnp.zeros((lo_w, hi), f32) for _ in range(3)]
        for r in range(R):
            sl = slice(r * K, (r + 1) * K)
            v_r = v[:, sl]
            a_r = -xt + _cross(v_r, xr)  # Jp x for this slot block
            Oa_r = _m33_vec(Ow[:, :, sl], a_r)
            Oa_blocks.append(Oa_r)
            wx_r = _m33T_vec(Rt_k, Oa_r)  # W^T x block
            lo_oh, hi_oh = oh_blocks(sl)
            for d in range(3):
                # contract over K against hi_oh^T (A @ B^T form)
                TdT[d] = TdT[d] + jax.lax.dot_general(
                    lo_oh * wx_r[d:d + 1, :], hi_oh,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=f32,
                )
        T = jnp.stack([jnp.transpose(t) for t in TdT], axis=-1)
        t_ch = jnp.transpose(T.reshape(Lg, 3))  # [3, Lg]
        zch = _m33_vec(Ainv, t_ch)  # [3, Lg]
        z_grids = tab_to_grids(zch)

        u_top = jnp.zeros((3, K), f32)
        u_bot = jnp.zeros((3, K), f32)
        for r in range(R):
            sl = slice(r * K, (r + 1) * K)
            zb_r = gather_block(z_grids, sl)
            v_r = v[:, sl]
            Ow_r = Ow[:, :, sl]
            m_r = Oa_blocks[r] - _m33_vec(Ow_r, _m33_vec(Rt_k, zb_r))
            u_top = u_top - m_r
            u_bot = u_bot - _cross(v_r, m_r)
        u_obs = jnp.concatenate([u_top, u_bot], axis=0)  # [6, K]
        xj = roll_up(xm)
        vi = _m66_vec(Hii, xm) + _m66_vec(Hij, xj)
        vj = _m66T_vec(Hij, xm) + _m66_vec(Hjj, xj)
        u = u_obs + vi + shift_down(vj)
        if has_prior:
            # dense boundary-pose prior block u[:, p_idx] += Hp x[:, p_idx]:
            # gather/scatter as [PBp, K] one-hot VPU reductions, the dense
            # block product as 36 static [PBp, PBp] slice reductions
            xp_rows = []  # [1, PBp] per channel d: x[d, p_idx[j]]
            for d in range(6):
                xp_rows.append(
                    jnp.transpose(
                        jnp.sum(p_oneh * xm[d:d + 1, :], axis=1, keepdims=True)
                    )
                )
            u_rows = []
            for c0 in range(6):
                acc = jnp.zeros((PBp, 1), f32)
                for d in range(6):
                    Hp_cd = Hp[
                        c0 * PBp:(c0 + 1) * PBp, d * PBp:(d + 1) * PBp
                    ]
                    acc = acc + jnp.sum(
                        Hp_cd * xp_rows[d], axis=1, keepdims=True
                    )
                u_rows.append(jnp.sum(acc * p_oneh, axis=0, keepdims=True))
            u = u + jnp.concatenate(u_rows, axis=0)
        return (u + lam * xm) * pf

    def precond(r):
        return _m66_vec(Minv, r) * pf

    b2 = jnp.maximum(jnp.sum(b * b), 1e-30)
    x0 = jnp.zeros((6, K), f32)
    r0 = b
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def step(i, carry):
        x, r, p, rz = carry
        active = jnp.sum(r * r) > tol * b2
        Ap = matvec(p)
        alpha = jnp.where(
            active, rz / jnp.maximum(jnp.sum(p * Ap), 1e-30), 0.0
        )
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(active, rz_new / jnp.maximum(rz, 1e-30), 0.0)
        p = jnp.where(active, z + beta * p, p)
        rz = jnp.where(active, rz_new, rz)
        return x, r, p, rz

    x, _, _, _ = jax.lax.fori_loop(0, n_steps, step, (x0, r0, p0, rz0))

    # ---- landmark back-substitution: db = A^-1 (-gl - W^T dp) masked
    dpk = x * pf
    dt = dpk[:3]
    dr = dpk[3:]
    Tb = [jnp.zeros((lo_w, hi), f32) for _ in range(3)]
    for r in range(R):
        sl = slice(r * K, (r + 1) * K)
        v_r = v[:, sl]
        a_r = -dt + _cross(v_r, dr)
        wd_r = _m33T_vec(Rt_k, _m33_vec(Ow[:, :, sl], a_r))
        lo_oh, hi_oh = oh_blocks(sl)
        for d in range(3):
            Tb[d] = Tb[d] + jax.lax.dot_general(
                lo_oh * wd_r[d:d + 1, :], hi_oh,
                (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )
    Tt = jnp.stack([jnp.transpose(t) for t in Tb], axis=-1)
    t_ch = jnp.transpose(Tt.reshape(Lg, 3))  # [3, Lg]
    db = _m33_vec(Ainv, (-gl_ch - t_ch)) * lmf  # [3, Lg]

    dp_out[:] = x
    db_out[:] = jnp.transpose(db)


@functools.partial(
    jax.jit, static_argnames=("n_steps", "lo_w", "interpret")
)
def resident_solve(
    v,        # [3, R, K] SoA channels (reshaped r-major internally)
    Ow,       # [3, 3, R, K]
    Rt,       # [3, 3, K]
    Hii,      # [6, 6, K]
    Hij,
    Hjj,
    diag,     # [6, 6, K] raw pose diagonal blocks (post-prior)
    lo_dig,   # [1, E] i32 r-major digit vectors (SoAEdges.k_*_dig)
    hi_dig,   # [1, E] i32
    gp,       # [6, K] gradient (post-prior)
    gl_tab,   # [Lg, 3] grid table (post-prior)
    Hll_tab,  # [Lg, 9] grid table (post-prior)
    lmf_tab,  # [Lg] landmark-free mask (float, 0 on pads)
    pf,       # [K] pose-free mask (float)
    lam,
    cg_tol,
    n_steps: int,
    lo_w: int,
    prior_Hp=None,   # [6PB, 6PB] dense boundary prior (None = no prior)
    prior_idx=None,  # [PB] i32 boundary pose indices
    interpret: bool = False,
):
    """(dp [6, K], db [Lg, 3]) solving the damped reduced system + landmark
    back-substitution (see module docstring). ``lo_w`` is the digit_split
    low-digit width the grid tables were built with (Lg = hi * lo_w)."""
    K = gp.shape[1]
    R = v.shape[1]
    E = K * R
    Lg = gl_tab.shape[0]
    f32 = jnp.float32
    hi = Lg // lo_w
    assert hi * lo_w == Lg, (Lg, lo_w)
    has_prior = prior_Hp is not None
    kern = functools.partial(
        _solve_kernel, n_steps=n_steps, R=R, lo_w=lo_w, hi=hi,
        has_prior=has_prior,
    )
    inputs = [
        v.astype(f32).reshape(3, E),
        Ow.astype(f32).reshape(3, 3, E),
        Rt.astype(f32), Hii.astype(f32), Hij.astype(f32), Hjj.astype(f32),
        diag.astype(f32),
        lo_dig.astype(jnp.int32).reshape(1, E),
        hi_dig.astype(jnp.int32).reshape(1, E),
        gp.astype(f32),
        gl_tab.astype(f32),
        Hll_tab.astype(f32),
        lmf_tab.astype(f32).reshape(1, Lg),
        pf.astype(f32).reshape(1, K),
    ]
    n_vmem = len(inputs)
    if has_prior:
        # rearrange Hp [6PB, 6PB] (pose-major) -> channel-major
        # [c*PBp+b, d*PBp+j], padded to PBp >= 16 (Mosaic miscompiles
        # sub-16 tiles); pad indices point at K so their one-hot rows are
        # all-zero in-kernel
        PB = prior_idx.shape[0]
        PBp = max(16, PB)
        Hp4 = jnp.transpose(
            prior_Hp.astype(f32).reshape(PB, 6, PB, 6), (1, 0, 3, 2)
        )  # [6, PB, 6, PB]
        Hp_r = jnp.zeros((6, PBp, 6, PBp), f32).at[:, :PB, :, :PB].set(Hp4)
        idx_p = jnp.concatenate(
            [
                prior_idx.astype(jnp.int32),
                jnp.full((PBp - PB,), K, jnp.int32),
            ]
        )
        inputs += [
            Hp_r.reshape(6 * PBp, 6 * PBp),
            idx_p.reshape(PBp, 1),
        ]
        n_vmem += 2
    inputs += [
        jnp.asarray(lam, f32).reshape(1, 1),
        jnp.asarray(cg_tol, f32).reshape(1, 1),
    ]
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((6, K), f32),
            jax.ShapeDtypeStruct((Lg, 3), f32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_vmem
        + [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(*inputs)


# ---------------------------------------------------------------------------
# the resident LINEARIZE kernel: observation + odometry-chain linearization
# ---------------------------------------------------------------------------


def _obs_lin_kernel(
    t_ref,      # [3, K]
    q_ref,      # [4, K]
    lm_ref,     # [Lg, 3] landmark table, padded to hi*lo_w rows
    meas_ref,   # [3, E] r-major
    info_ref,   # [3, 3, E]
    lodig_ref,  # [1, E] i32
    hidig_ref,  # [1, E] i32
    v_out,      # [3, E]
    Ow_out,     # [3, 3, E]
    Rt_out,     # [3, 3, K]
    gp_out,     # [6, K] observation part only
    diag_out,   # [6, 6, K] observation part only
    gl_out,     # [Lg, 3]
    Hll_out,    # [Lg, 9] (row-major 3x3)
    chi_out,    # [1, 1] SMEM
    *,
    R: int,
    lo_w: int,
    hi: int,
    robust_kind: str,
    robust_delta: float,
):
    K = t_ref.shape[1]
    f32 = jnp.float32
    t = t_ref[:]
    q = q_ref[:]
    lodig = lodig_ref[:]
    hidig = hidig_ref[:]

    Rt = ch.rotmat_ch(ch.quat_conj_ch(q))  # R(q)^T channels
    Rt_out[:] = Rt

    # landmark table in digit-grid form for the per-block gathers
    lm3 = lm_ref[:].reshape(hi, lo_w, 3)
    TzT = [jnp.transpose(lm3[:, :, d]) for d in range(3)]  # [lo_w, hi]

    def oh_blocks(sl):
        return _oh_blocks(lodig, hidig, sl, lo_w, hi, K)

    gp_top = jnp.zeros((3, K), f32)
    gp_bot = jnp.zeros((3, K), f32)
    TL = jnp.zeros((3, 3, K), f32)   # diag quadrants (see assembly below)
    TR = jnp.zeros((3, 3, K), f32)
    BR = jnp.zeros((3, 3, K), f32)
    Tgl = [jnp.zeros((lo_w, hi), f32) for _ in range(3)]
    THll = [jnp.zeros((lo_w, hi), f32) for _ in range(9)]
    chi_acc = jnp.zeros((), f32)

    for r in range(R):
        sl = slice(r * K, (r + 1) * K)
        lo_oh, hi_oh = oh_blocks(sl)
        # gather this block's landmark world positions
        lw_rows = []
        for d in range(3):
            wT = jax.lax.dot_general(
                TzT[d], hi_oh, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )  # [lo_w, K]
            lw_rows.append(jnp.sum(lo_oh * wT, axis=0, keepdims=True))
        lw = jnp.concatenate(lw_rows, axis=0)  # [3, K]

        d_v = lw - t
        v_r = jnp.stack(
            [sum(Rt[i, k2] * d_v[k2] for k2 in range(3)) for i in range(3)],
            axis=0,
        )  # Rt @ (lw - t)
        meas_r = meas_ref[:, sl]
        r_r = v_r - meas_r
        O_r = info_ref[:, :, sl]
        Or = jnp.stack(
            [sum(O_r[i, k2] * r_r[k2] for k2 in range(3)) for i in range(3)],
            axis=0,
        )
        chi_e = sum(r_r[i] * Or[i] for i in range(3))

        # robust rho + weight (solver/robust.py formulas, channelwise)
        rho, w = _robust_rho_w(chi_e, robust_kind, robust_delta)
        chi_acc = chi_acc + jnp.sum(rho)
        if w is None:
            Ow_r = O_r
            Orw = Or
        else:
            Ow_r = O_r * w[None, None]
            Orw = Or * w[None]

        v_out[:, sl] = v_r
        Ow_out[:, :, sl] = Ow_r

        # gradients
        gp_top = gp_top - Orw
        gp_bot = gp_bot - _cross(v_r, Orw)
        gl_e = jnp.stack(
            [sum(Rt[k2, i] * Orw[k2] for k2 in range(3)) for i in range(3)],
            axis=0,
        )  # Rt^T (O'r)

        # landmark blocks Hll_e = Rt^T (O' Rt)
        ORt = ch.m33_mul(Ow_r, Rt)
        Hll_e = ch.m33T_mul(Rt, ORt)

        # seg-sum the gl / Hll channels into digit-grid accumulators
        for d in range(3):
            Tgl[d] = Tgl[d] + jax.lax.dot_general(
                lo_oh * gl_e[d:d + 1].reshape(1, K), hi_oh,
                (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )
        for i in range(3):
            for j in range(3):
                c = 3 * i + j
                THll[c] = THll[c] + jax.lax.dot_general(
                    lo_oh * Hll_e[i, j].reshape(1, K), hi_oh,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=f32,
                )

        # pose diagonal quadrants: [[O', -O'B],[(-O'B)^T, -hat(v) O'B]]
        OB = _ob_product_k(Ow_r, v_r)
        TL = TL + Ow_r
        TR = TR - OB
        BR = BR - ch.hat_mul(v_r, OB)

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
    )
    gl_out[:] = jnp.stack(
        [jnp.transpose(Tgl[d]) for d in range(3)], axis=-1
    ).reshape(hi * lo_w, 3)
    Hll_out[:] = jnp.stack(
        [jnp.transpose(THll[c]) for c in range(9)], axis=-1
    ).reshape(hi * lo_w, 9)
    chi_out[0, 0] = chi_acc


def _chain_lin_kernel(
    t_ref,   # [3, K]
    q_ref,   # [4, K]
    omt_ref,  # [3, K] chain measurement translation
    omq_ref,  # [4, K] chain measurement quaternion
    oO_ref,   # [6, 6, K] chain information (zeroed on masked rows)
    Hii_out,  # [6, 6, K]
    Hij_out,  # [6, 6, K]
    Hjj_out,  # [6, 6, K]
    gi_out,   # [6, K]
    gj_out,   # [6, K]
    chi_out,  # [1, 1] SMEM
):
    """Odometry-chain linearization kernel (chain_soa channel math — the
    same code the XLA path runs). Separate from the observation kernel: the
    chain's ~25 live [3,3,K]/[6,6,K] temporaries on top of the obs
    accumulators blew the 16 MB scoped-VMEM cap at K=4096 when fused
    (measured: 26.15M live); split, each side fits comfortably."""
    t = t_ref[:]
    q = q_ref[:]
    tj = ch.roll_up_pose_ch(t)
    qj = ch.roll_up_pose_ch(q)
    Hii_c, Hij_c, Hjj_c, gi_c, gj_c, chi_k = ch.chain_linearize_ch(
        t, q, tj, qj, omt_ref[:], omq_ref[:], oO_ref[:]
    )
    Hii_out[:] = Hii_c
    Hij_out[:] = Hij_c
    Hjj_out[:] = Hjj_c
    gi_out[:] = gi_c
    gj_out[:] = gj_c
    chi_out[0, 0] = jnp.sum(chi_k)


def _robust_rho_w(chi_e, robust_kind: str, robust_delta: float):
    """solver/robust.py rho/weight formulas, channelwise. Returns (rho, w)
    with w None for the trivial kernel."""
    if robust_kind == "none":
        return chi_e, None
    if robust_kind == "huber":
        d2 = robust_delta * robust_delta
        e = jnp.sqrt(jnp.maximum(chi_e, 1e-30))
        rho = jnp.where(chi_e <= d2, chi_e, 2.0 * robust_delta * e - d2)
        w = jnp.minimum(1.0, robust_delta / e)
        return rho, w
    if robust_kind == "dcs":
        phi = robust_delta * robust_delta
        rho = 2.0 * phi * chi_e / (phi + jnp.maximum(chi_e, 1e-30))
        s_ = 2.0 * phi / (phi + jnp.maximum(chi_e, 0.0))
        w = jnp.minimum(1.0, s_ * s_)
        return rho, w
    raise ValueError(robust_kind)


def _ob_product_k(O, v):
    """O @ hat(v) (channel arrays)."""
    c0 = jnp.stack([O[i][1] * v[2] - O[i][2] * v[1] for i in range(3)], 0)
    c1 = jnp.stack([-O[i][0] * v[2] + O[i][2] * v[0] for i in range(3)], 0)
    c2 = jnp.stack([O[i][0] * v[1] - O[i][1] * v[0] for i in range(3)], 0)
    return jnp.stack([c0, c1, c2], axis=1)


@functools.partial(
    jax.jit, static_argnames=("robust_kind", "robust_delta", "interpret")
)
def resident_linearize(
    poses,      # [K, 7]
    landmarks,  # [L, 3]
    meas,       # [3, R, K] SoA channels
    info,       # [3, 3, R, K]
    lo_dig,     # [1, E] i32 (r-major)
    hi_dig,     # [1, E] i32
    o_meas_ch,  # [7, K] chain measurement channels
    o_info_ch,  # [6, 6, K] chain information channels (masked rows zeroed)
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    interpret: bool = False,
):
    """Full (observation + chain) linearization in one kernel. Returns
    (v [3,R,K], Ow [3,3,R,K], Rt [3,3,K], Hii/Hij/Hjj [6,6,K],
    gp [6,K], diag [6,6,K], gl_tab [Lg,3], Hll_tab [Lg,9], chi2 scalar) —
    v/Ow/Rt/blocks in exactly the layouts ``resident_solve`` consumes."""
    K = poses.shape[0]
    L = landmarks.shape[0]
    R = meas.shape[1]
    E = K * R
    f32 = jnp.float32
    lo_w, hi = digit_split(L)
    pad = hi * lo_w - L
    lm_tab = landmarks.astype(f32)
    if pad:
        lm_tab = jnp.concatenate([lm_tab, jnp.zeros((pad, 3), f32)], axis=0)

    kern = functools.partial(
        _obs_lin_kernel, R=R, lo_w=lo_w, hi=hi,
        robust_kind=robust_kind, robust_delta=robust_delta,
    )
    Lg = hi * lo_w
    out_shapes = (
        jax.ShapeDtypeStruct((3, E), f32),          # v
        jax.ShapeDtypeStruct((3, 3, E), f32),       # Ow
        jax.ShapeDtypeStruct((3, 3, K), f32),       # Rt
        jax.ShapeDtypeStruct((6, K), f32),          # gp (obs)
        jax.ShapeDtypeStruct((6, 6, K), f32),       # diag (obs)
        jax.ShapeDtypeStruct((Lg, 3), f32),         # gl table
        jax.ShapeDtypeStruct((Lg, 9), f32),         # Hll table
        jax.ShapeDtypeStruct((1, 1), f32),          # chi (obs)
    )
    t_ch = jnp.transpose(poses[:, :3]).astype(f32)
    q_ch = jnp.transpose(poses[:, 3:7]).astype(f32)
    v_e, Ow_e, Rt, gp_obs, diag_obs, gl_tab, Hll_tab, chi_l = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=tuple(
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7
            + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        ),
        interpret=interpret,
    )(
        t_ch,
        q_ch,
        lm_tab,
        meas.astype(f32).reshape(3, E),
        info.astype(f32).reshape(3, 3, E),
        lo_dig.astype(jnp.int32).reshape(1, E),
        hi_dig.astype(jnp.int32).reshape(1, E),
    )
    chain_shapes = (
        jax.ShapeDtypeStruct((6, 6, K), f32),       # Hii
        jax.ShapeDtypeStruct((6, 6, K), f32),       # Hij
        jax.ShapeDtypeStruct((6, 6, K), f32),       # Hjj
        jax.ShapeDtypeStruct((6, K), f32),          # gi
        jax.ShapeDtypeStruct((6, K), f32),          # gj
        jax.ShapeDtypeStruct((1, 1), f32),          # chi (chain)
    )
    Hii, Hij, Hjj, gi, gj, chi_o = pl.pallas_call(
        _chain_lin_kernel,
        out_shape=chain_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=tuple(
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
            + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        ),
        interpret=interpret,
    )(
        t_ch,
        q_ch,
        o_meas_ch[:3].astype(f32),
        o_meas_ch[3:7].astype(f32),
        o_info_ch.astype(f32),
    )

    def shift_down(x):
        return jnp.concatenate([jnp.zeros_like(x[..., :1]), x[..., :-1]], -1)

    gp = gp_obs + gi + shift_down(gj)
    diag = diag_obs + Hii + shift_down(Hjj)
    return (
        v_e.reshape(3, R, K),
        Ow_e.reshape(3, 3, R, K),
        Rt,
        Hii, Hij, Hjj,
        gp, diag,
        gl_tab, Hll_tab,
        chi_l[0, 0] + chi_o[0, 0],
    )


# ---------------------------------------------------------------------------
# the resident CHI2 kernel: trial-point objective (obs + chain residuals)
# ---------------------------------------------------------------------------


def _chi2_kernel(
    t_ref,      # [3, K]
    q_ref,      # [4, K]
    lm_ref,     # [Lg, 3]
    meas_ref,   # [3, E]
    info_ref,   # [3, 3, E]
    lodig_ref,  # [1, E]
    hidig_ref,  # [1, E]
    omt_ref,    # [3, K]
    omq_ref,    # [4, K]
    oO_ref,     # [6, 6, K]
    chi_out,    # [1, 1] SMEM
    *,
    R: int,
    lo_w: int,
    hi: int,
    robust_kind: str,
    robust_delta: float,
):
    K = t_ref.shape[1]
    f32 = jnp.float32
    t = t_ref[:]
    q = q_ref[:]
    lodig = lodig_ref[:]
    hidig = hidig_ref[:]
    Rt = ch.rotmat_ch(ch.quat_conj_ch(q))

    lm3 = lm_ref[:].reshape(hi, lo_w, 3)
    TzT = [jnp.transpose(lm3[:, :, d]) for d in range(3)]

    chi_acc = jnp.zeros((), f32)
    for r in range(R):
        sl = slice(r * K, (r + 1) * K)
        lo_oh, hi_oh = _oh_blocks(lodig, hidig, sl, lo_w, hi, K)
        lw_rows = []
        for d in range(3):
            wT = jax.lax.dot_general(
                TzT[d], hi_oh, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            lw_rows.append(jnp.sum(lo_oh * wT, axis=0, keepdims=True))
        lw = jnp.concatenate(lw_rows, axis=0)
        d_v = lw - t
        v_r = jnp.stack(
            [sum(Rt[i, k2] * d_v[k2] for k2 in range(3)) for i in range(3)],
            axis=0,
        )
        r_r = v_r - meas_ref[:, sl]
        O_r = info_ref[:, :, sl]
        Or = jnp.stack(
            [sum(O_r[i, k2] * r_r[k2] for k2 in range(3)) for i in range(3)],
            axis=0,
        )
        chi_e = sum(r_r[i] * Or[i] for i in range(3))
        rho, _ = _robust_rho_w(chi_e, robust_kind, robust_delta)
        chi_acc = chi_acc + jnp.sum(rho)

    tj = ch.roll_up_pose_ch(t)
    qj = ch.roll_up_pose_ch(q)
    chi_k = ch.chain_chi2_ch(t, q, tj, qj, omt_ref[:], omq_ref[:], oO_ref[:])
    chi_out[0, 0] = chi_acc + jnp.sum(chi_k)


@functools.partial(
    jax.jit, static_argnames=("robust_kind", "robust_delta", "interpret")
)
def resident_chi2(
    poses,
    landmarks,
    meas,
    info,
    lo_dig,
    hi_dig,
    o_meas_ch,
    o_info_ch,
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    interpret: bool = False,
):
    """Objective-only pass (the LM trial evaluation) as one kernel.
    Float-identical op classes to the linearize kernel's chi2."""
    K = poses.shape[0]
    L = landmarks.shape[0]
    R = meas.shape[1]
    E = K * R
    f32 = jnp.float32
    lo_w, hi = digit_split(L)
    pad = hi * lo_w - L
    lm_tab = landmarks.astype(f32)
    if pad:
        lm_tab = jnp.concatenate([lm_tab, jnp.zeros((pad, 3), f32)], axis=0)
    kern = functools.partial(
        _chi2_kernel, R=R, lo_w=lo_w, hi=hi,
        robust_kind=robust_kind, robust_delta=robust_delta,
    )
    chi = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, 1), f32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(
        jnp.transpose(poses[:, :3]).astype(f32),
        jnp.transpose(poses[:, 3:7]).astype(f32),
        lm_tab,
        meas.astype(f32).reshape(3, E),
        info.astype(f32).reshape(3, 3, E),
        lo_dig.astype(jnp.int32).reshape(1, E),
        hi_dig.astype(jnp.int32).reshape(1, E),
        o_meas_ch[:3].astype(f32),
        o_meas_ch[3:7].astype(f32),
        o_info_ch.astype(f32),
    )
    return chi[0, 0]
