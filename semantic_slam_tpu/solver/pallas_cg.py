"""VMEM-resident CG: the whole PCG inner loop as ONE Pallas TPU kernel.

The XLA SoA path (``ellk_soa``) re-streams every per-edge primitive from
HBM on every CG step — ~9 MB/step at K=4096 — and lands at ~40-55 us/step
(~20% of streaming peak; r4 device profiling). The factored SoA store
(v 3ch + O' 9ch + Rt 9 + chain 108 + Minv 36 + one-hot factors) fits in
VMEM (~16 MB/core) to K~4096, so this kernel loads everything once and
runs all CG steps against on-chip memory (ROADMAP r3: "resident-CG kernel
— the whole CG loop without HBM re-streaming").

Layout rules learned the hard way (Mosaic crashes on big relayouts —
[R,K]->[E] transposes/reshapes of edge-sized tensors):

  * every edge tensor lives in R-MAJOR [C, E] form (E = R*K, slot (r,k) at
    r*K+k) for the kernel's whole life; the XLA caller reshapes the SoA
    [C,R,K] channels (a no-relayout collapse) and builds matching r-major
    one-hot factors once per solve;
  * the per-pose broadcast x -> slots is a LANE CONCAT ([6,K] tiled R
    times along the minor axis); the slot-sum back is a sum of R static
    lane SLICES m[:, r*K:(r+1)*K] — no transposes anywhere near E;
  * the landmark seg-sum/gather two-level contractions are standard MXU
    matmuls against resident factors:  T^T = (ohlo_T * vals) @ ohhi  and
    w^T = Tz^T @ ohhi^T (expressed as dot_general contracting ohhi's
    minor dim);  only [lo_w, hi]-sized tiles get transposed.

Numerics: float-identical op classes to the XLA SoA path up to reduction
order; parity pinned by tests/test_pallas_cg.py (interpret mode on CPU,
compiled + value-checked on TPU). Scope: jacobi preconditioner, no
fixed-lag prior inside the kernel (callers needing tridiag/prior fall
back to the XLA loop; ``fits()`` also enforces the VMEM budget).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
    """Static predicate for the resident kernel: VMEM budget plus the
    empirically-mapped Mosaic envelope — this toolchain's compile helper
    CRASHES (subprocess exit 1, no diagnostic) outside 1024 <= K <= 4096
    for this kernel family, independent of the VMEM estimate (K=8192
    fails even with ~12.8 MB modeled). Outside the envelope the XLA SoA
    path serves (still 1.5x the r3 layout at K=8192)."""
    if K < 1024 or K > 4096:
        return False
    E = K * R
    persistent = (
        3 * E       # v
        + 9 * E     # Ow
        + 9 * K     # Rt (per pose; slots processed per R-block)
        + 3 * 36 * K  # chain blocks
        + 36 * K    # Minv
        + 2 * E // 2       # digit vectors (i32 [1,E] x2; one-hot blocks
                           # are regenerated per R-block from iota compares)
        + 30 * K    # b + CG state (x, r, p, z)
        + 3 * E     # Oa blocks held across the two matvec passes
        + L * 12    # Ainv + tables
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


def _kernel(
    v_ref,      # [3, E] r-major slots
    Ow_ref,     # [3, 3, E]
    Rt_ref,     # [3, 3, K]
    Hii_ref,    # [6, 6, K]
    Hij_ref,    # [6, 6, K]
    Hjj_ref,    # [6, 6, K]
    diag_ref,   # [6, 6, K] RAW pose diagonal blocks (damping/masking and
                # the analytic block-Schur inverse happen IN-KERNEL, where
                # the channel math fills the lanes — XLA's AoS inv66 ran
                # at ~3.5% tile occupancy)
    lodig_ref,  # [1, E] i32 — lo digit of the slot landmark index
    hidig_ref,  # [1, E] i32 — hi digit
    Ainv_ref,   # [3, 3, L]
    b_ref,      # [6, K]
    pf_ref,     # [1, K]
    lam_ref,    # [1, 1] SMEM
    tol_ref,    # [1, 1] SMEM
    out_ref,    # [6, K]
    *,
    n_steps: int,
    L: int,
    R: int,
    lo_w: int,
    hi: int,
):
    K = b_ref.shape[1]
    E = K * R
    f32 = jnp.float32

    v = v_ref[:]
    Ow = Ow_ref[:]
    Rt_k = Rt_ref[:]
    Hii = Hii_ref[:]
    Hij = Hij_ref[:]
    Hjj = Hjj_ref[:]
    lodig = lodig_ref[:]
    hidig = hidig_ref[:]
    Ainv = Ainv_ref[:]
    pf = pf_ref[:]  # [1, K]
    lam = lam_ref[0, 0]
    tol = tol_ref[0, 0]

    # damped + gauge-masked block-Jacobi preconditioner, once per solve:
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

    def oh_blocks(sl):
        """Regenerate this slot block's one-hot factors from the digit
        vectors (iota compares — ~K*(lo_w+hi) VPU ops, vs keeping E*(lo_w
        + hi) floats resident, which blows the VMEM budget at K=4096)."""
        lo_oh = (
            jax.lax.broadcasted_iota(jnp.int32, (lo_w, K), 0)
            == lodig[:, sl]
        ).astype(f32)  # [lo_w, K]
        hi_oh = (
            jax.lax.broadcasted_iota(jnp.int32, (hi, K), 0)
            == hidig[:, sl]
        ).astype(f32)  # [hi, K]
        return lo_oh, hi_oh

    def roll_up(x):  # [6, K]: position k <- x[k+1], last zero
        return jnp.concatenate([x[:, 1:], jnp.zeros((6, 1), f32)], axis=1)

    def shift_down(x):  # [6, K]: position k <- x[k-1], first zero
        return jnp.concatenate([jnp.zeros((6, 1), f32), x[:, :-1]], axis=1)

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
        t_tab = T.reshape(hi * lo_w, 3)[:L]  # [L, 3]
        zch = _m33_vec(Ainv, jnp.transpose(t_tab))  # [3, L]
        pad = hi * lo_w - L
        zp = jnp.transpose(zch)  # [L, 3] (small)
        if pad:
            zp = jnp.concatenate([zp, jnp.zeros((pad, 3), f32)], axis=0)
        zp3 = zp.reshape(hi, lo_w, 3)
        TzT = [jnp.transpose(zp3[:, :, d]) for d in range(3)]  # [lo_w, hi]

        u_top = jnp.zeros((3, K), f32)
        u_bot = jnp.zeros((3, K), f32)
        for r in range(R):
            sl = slice(r * K, (r + 1) * K)
            lo_oh, hi_oh = oh_blocks(sl)
            zb_rows = []
            for d in range(3):
                # w^T block = Tz^T @ hi_oh (standard matmul over hi)
                wT = jax.lax.dot_general(
                    TzT[d], hi_oh, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )  # [lo_w, K]
                zb_rows.append(
                    jnp.sum(lo_oh * wT, axis=0, keepdims=True)  # [1, K]
                )
            zb_r = jnp.concatenate(zb_rows, axis=0)  # [3, K]
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
        return (u + lam * xm) * pf

    def precond(r):
        return _m66_vec(Minv, r) * pf

    b = b_ref[:] * pf
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
    out_ref[:] = x


@functools.partial(jax.jit, static_argnames=("n_steps", "interpret"))
def resident_cg(
    v,       # [3, R, K] SoA channels (reshaped r-major internally)
    Ow,      # [3, 3, R, K]
    Rt,      # [3, 3, K]
    Hii,     # [6, 6, K]
    Hij,
    Hjj,
    diag,    # [6, 6, K] raw pose diagonal blocks (Minv built in-kernel)
    lo_dig,  # [1, E] i32 r-major digit vectors (SoAEdges.k_*_dig)
    hi_dig,  # [1, E] i32
    Ainv,    # [3, 3, L] channelized damped landmark-block inverse
    b,       # [6, K]
    pf,      # [K] pose-free mask (float)
    lam,
    cg_tol,
    n_steps: int,
    interpret: bool = False,
):
    """dp [6, K] solving the damped reduced system (see module docstring)."""
    K = b.shape[1]
    R = v.shape[1]
    E = K * R
    L = Ainv.shape[2]
    f32 = jnp.float32
    lo_w, hi = digit_split(L)
    kern = functools.partial(
        _kernel, n_steps=n_steps, L=L, R=R, lo_w=lo_w, hi=hi
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((6, K), f32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 12
        + [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        v.astype(f32).reshape(3, E),
        Ow.astype(f32).reshape(3, 3, E),
        Rt.astype(f32), Hii.astype(f32), Hij.astype(f32), Hjj.astype(f32),
        diag.astype(f32),
        lo_dig.astype(jnp.int32).reshape(1, E),
        hi_dig.astype(jnp.int32).reshape(1, E),
        Ainv.astype(f32), b.astype(f32), pf.astype(f32).reshape(1, K),
        jnp.asarray(lam, f32).reshape(1, 1),
        jnp.asarray(cg_tol, f32).reshape(1, 1),
    )


# ---------------------------------------------------------------------------
# Observation-edge linearization kernel (the r4 follow-up to resident CG:
# after the CG loop went resident, the XLA linearize was the per-iteration
# dominator — its landmark-side D=9 seg-sums fuse pathologically inside the
# LM while loop). Same layout rules as the CG kernel; produces v/Ow/Rt in
# exactly the layouts resident_cg consumes.
# ---------------------------------------------------------------------------


def _m33_mul_k(A, B):
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


def _m33T_mul_k(A, B):
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


def _rotmat_conj_k(q):
    """Rt = R(q)^T channels from q [4, K] -> [3, 3, K]."""
    qw, qx, qy, qz = q[0], q[1], q[2], q[3]
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
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


def _ob_product_k(O, v):
    """O @ hat(v) (channel arrays)."""
    c0 = jnp.stack([O[i][1] * v[2] - O[i][2] * v[1] for i in range(3)], 0)
    c1 = jnp.stack([-O[i][0] * v[2] + O[i][2] * v[0] for i in range(3)], 0)
    c2 = jnp.stack([O[i][0] * v[1] - O[i][1] * v[0] for i in range(3)], 0)
    return jnp.stack([c0, c1, c2], axis=1)


def _hat_mul_k(v, M):
    """hat(v) @ M (channel arrays)."""
    r0 = jnp.stack([-v[2] * M[1][j] + v[1] * M[2][j] for j in range(3)], 0)
    r1 = jnp.stack([v[2] * M[0][j] - v[0] * M[2][j] for j in range(3)], 0)
    r2 = jnp.stack([-v[1] * M[0][j] + v[0] * M[1][j] for j in range(3)], 0)
    return jnp.stack([r0, r1, r2], axis=0)


def _obs_lin_kernel(
    t_ref,      # [3, K]
    q_ref,      # [4, K]
    lm_ref,     # [Lpad, 3] landmark table, padded to hi*lo_w rows
    meas_ref,   # [3, E] r-major
    info_ref,   # [3, 3, E]
    lodig_ref,  # [1, E] i32
    hidig_ref,  # [1, E] i32
    v_out,      # [3, E]
    Ow_out,     # [3, 3, E]
    Rt_out,     # [3, 3, K]
    gp_out,     # [6, K]
    diag_out,   # [6, 6, K]
    gl_out,     # [hi*lo_w, 3]
    Hll_out,    # [hi*lo_w, 9] (row-major 3x3)
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

    Rt = _rotmat_conj_k(q)  # [3, 3, K]
    Rt_out[:] = Rt

    # landmark table in digit-grid form for the per-block gathers
    lm3 = lm_ref[:].reshape(hi, lo_w, 3)
    TzT = [jnp.transpose(lm3[:, :, d]) for d in range(3)]  # [lo_w, hi]

    def oh_blocks(sl):
        lo_oh = (
            jax.lax.broadcasted_iota(jnp.int32, (lo_w, K), 0)
            == lodig[:, sl]
        ).astype(f32)
        hi_oh = (
            jax.lax.broadcasted_iota(jnp.int32, (hi, K), 0)
            == hidig[:, sl]
        ).astype(f32)
        return lo_oh, hi_oh

    gp_top = jnp.zeros((3, K), f32)
    gp_bot = jnp.zeros((3, K), f32)
    TL = jnp.zeros((3, 3, K), f32)   # diag quadrants (see _assemble below)
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
        chi_e = sum(r_r[i] * Or[i] for i in range(3))  # [1?, K] -> [K]-row

        # robust rho + weight (solver/robust.py formulas, channelwise)
        if robust_kind == "none":
            rho = chi_e
            w = None
        elif robust_kind == "huber":
            d2 = robust_delta * robust_delta
            e = jnp.sqrt(jnp.maximum(chi_e, 1e-30))
            rho = jnp.where(chi_e <= d2, chi_e, 2.0 * robust_delta * e - d2)
            w = jnp.minimum(1.0, robust_delta / e)
        elif robust_kind == "dcs":
            phi = robust_delta * robust_delta
            rho = 2.0 * phi * chi_e / (phi + jnp.maximum(chi_e, 1e-30))
            s_ = 2.0 * phi / (phi + jnp.maximum(chi_e, 0.0))
            w = jnp.minimum(1.0, s_ * s_)
        else:
            raise ValueError(robust_kind)
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
        ORt = _m33_mul_k(Ow_r, Rt)
        Hll_e = _m33T_mul_k(Rt, ORt)

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
        BR = BR - _hat_mul_k(v_r, OB)

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


@functools.partial(
    jax.jit, static_argnames=("robust_kind", "robust_delta", "interpret")
)
def resident_obs_linearize(
    poses,      # [K, 7]
    landmarks,  # [L, 3]
    meas,       # [3, R, K] SoA channels
    info,       # [3, 3, R, K]
    lo_dig,     # [1, E] i32 (r-major)
    hi_dig,     # [1, E] i32
    robust_kind: str = "none",
    robust_delta: float = 1.0,
    interpret: bool = False,
):
    """Observation-edge linearization in one kernel. Returns
    (v [3,R,K], Ow [3,3,R,K], Rt [3,3,K], gp_obs [K,6], diag_obs [K,6,6],
    gl [L,3], Hll [L,3,3], chi_l scalar) — v/Ow/Rt in exactly the layouts
    ``resident_cg`` consumes."""
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
    out_shapes = (
        jax.ShapeDtypeStruct((3, E), f32),          # v
        jax.ShapeDtypeStruct((3, 3, E), f32),       # Ow
        jax.ShapeDtypeStruct((3, 3, K), f32),       # Rt
        jax.ShapeDtypeStruct((6, K), f32),          # gp_obs
        jax.ShapeDtypeStruct((6, 6, K), f32),       # diag_obs
        jax.ShapeDtypeStruct((hi * lo_w, 3), f32),  # gl table
        jax.ShapeDtypeStruct((hi * lo_w, 9), f32),  # Hll table
        jax.ShapeDtypeStruct((1, 1), f32),          # chi_l
    )
    v_e, Ow_e, Rt, gp_obs, diag_obs, gl_tab, Hll_tab, chi = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=tuple(
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7
            + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        ),
        interpret=interpret,
    )(
        jnp.transpose(poses[:, :3]).astype(f32),
        jnp.transpose(poses[:, 3:7]).astype(f32),
        lm_tab,
        meas.astype(f32).reshape(3, E),
        info.astype(f32).reshape(3, 3, E),
        lo_dig.astype(jnp.int32).reshape(1, E),
        hi_dig.astype(jnp.int32).reshape(1, E),
    )
    return (
        v_e.reshape(3, R, K),
        Ow_e.reshape(3, 3, R, K),
        Rt,
        jnp.transpose(gp_obs),
        jnp.transpose(diag_obs, (2, 0, 1)),
        gl_tab[:L],
        Hll_tab[:L].reshape(L, 3, 3),
        chi[0, 0],
    )
