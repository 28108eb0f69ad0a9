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
    Both digits floored at 16: Mosaic miscompiles the [lo_w, hi]-tile ops
    below that (observed: hi=8/9 crash the compile helper; 16 works)."""
    lo_w = 1
    while lo_w * lo_w < L:
        lo_w *= 2
    lo_w = max(16, lo_w)
    hi = max(16, -(-L // lo_w))
    return lo_w, hi


def fits(K: int, R: int, L: int, lo_w: int, hi: int, dtype_bytes: int = 4) -> bool:
    """Static predicate for the resident kernel: VMEM budget plus the
    empirically-mapped Mosaic envelope (K < 1024 crashes the compile
    helper on this toolchain — and at those sizes the XLA SoA path is
    already sub-ms, so nothing is lost by falling back)."""
    if K < 1024:
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
    temps = 3 * lo_w * K + 12 * K  # per-block dot temps + channel temps
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


def _kernel(
    v_ref,      # [3, E] r-major slots
    Ow_ref,     # [3, 3, E]
    Rt_ref,     # [3, 3, K]
    Hii_ref,    # [6, 6, K]
    Hij_ref,    # [6, 6, K]
    Hjj_ref,    # [6, 6, K]
    Minv_ref,   # [6, 6, K]
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
    Minv = Minv_ref[:]
    lodig = lodig_ref[:]
    hidig = hidig_ref[:]
    Ainv = Ainv_ref[:]
    pf = pf_ref[:]  # [1, K]
    lam = lam_ref[0, 0]
    tol = tol_ref[0, 0]

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
    Minv,    # [6, 6, K] damped block-Jacobi inverse (pose-masked)
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
        Minv.astype(f32),
        lo_dig.astype(jnp.int32).reshape(1, E),
        hi_dig.astype(jnp.int32).reshape(1, E),
        Ainv.astype(f32), b.astype(f32), pf.astype(f32).reshape(1, K),
        jnp.asarray(lam, f32).reshape(1, 1),
        jnp.asarray(cg_tol, f32).reshape(1, 1),
    )
