"""Scatter-free block-Hessian assembly via one-hot matmuls.

XLA lowers ``x.at[idx].add(blocks)`` on TPU to a serialized per-index
scatter loop; at K=512 that scatter dominates dense linearization (~7.5 of
~10.4 ms per LM iteration, measured v5e). Replacing every accumulation
with a one-hot segment-sum turns it into a ``dot_general`` on the MXU:
0/1 weights are exact in f32, so the result differs from the scatter path
only in floating-point summation order.

CPU keeps the scatter path (its scatters are cheap; [E,K] one-hot matmuls
are wasteful there) — ``resolve_assembly("auto")`` picks per backend.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


# A/B override for 'auto', read ONCE at import: resolution happens at jit
# trace time under a static 'auto' argument, so a mid-process env flip would
# be silently ignored by already-compiled signatures — set SLAM_ASSEMBLY
# before the process starts (it is a process-level knob, not per-call).
_VALID_KINDS = ("ell", "matmul", "scatter")
_ENV_FORCED = os.environ.get("SLAM_ASSEMBLY", "")
if _ENV_FORCED and _ENV_FORCED not in _VALID_KINDS:
    # an unrecognized value must fail loudly at import, not silently fall
    # through every caller's if/elif chain to the scatter path on TPU
    raise ValueError(
        f"SLAM_ASSEMBLY={_ENV_FORCED!r} is not one of {_VALID_KINDS}"
    )


def resolve_assembly(kind: str, ell_ok: bool = False) -> str:
    """Resolve 'auto' to a concrete assembly kind for this backend.

    ``ell_ok`` says the caller can honor the ELL gather layout (it passed
    ``ell_rows`` and its graph satisfies the sorted/bounded contract —
    see ``build_slots``). On TPU, 'auto' prefers 'ell' when available: it
    does O(K*R) work where the one-hot matmuls do O(E*K). A requested/forced
    'ell' without ``ell_ok`` degrades to the backend default rather than
    computing garbage."""
    if kind == "auto":
        kind = _ENV_FORCED or (
            ("ell" if ell_ok else "matmul")
            if jax.default_backend() == "tpu"
            else "scatter"
        )
    if kind == "ell" and not ell_ok:
        kind = "matmul" if jax.default_backend() == "tpu" else "scatter"
    return kind


def onehot(idx: jax.Array, n: int, dtype) -> jax.Array:
    """[E, n] exact 0/1 selection matrix."""
    return (idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :]).astype(dtype)


def segment_sum_mm(idx: jax.Array, vals: jax.Array, n: int) -> jax.Array:
    """sum_e vals[e] into row idx[e] of an [n, ...] output — as one matmul."""
    return jnp.einsum("ek,e...->k...", onehot(idx, n, vals.dtype), vals)


def _cross_block_chunk(idx_r, idx_c, B, n_r: int, n_c: int) -> jax.Array:
    Or = onehot(idx_r, n_r, B.dtype)
    Oc = onehot(idx_c, n_c, B.dtype)
    Z = jnp.einsum("eab,el->ealb", B, Oc)  # [E, a, n_c, b]
    return jnp.einsum("ek,ealb->kalb", Or, Z)


def cross_block_mm(
    idx_r: jax.Array,
    idx_c: jax.Array,
    B: jax.Array,
    n_r: int,
    n_c: int,
    max_elems: int = 1 << 24,
) -> jax.Array:
    """sum_e  e_r(idx_r[e]) ⊗ B_e ⊗ e_c(idx_c[e])^T  as two matmuls.

    B is [E, a, b]; returns the block grid in [n_r, a, n_c, b] layout
    (reshape to the flat [a*n_r, b*n_c] system afterwards).

    The [E, a, n_c, b] outer-product intermediate scales with E*n_c, which
    can dwarf the output at grown capacity buckets — the edge axis is
    chunked so the transient stays under ``max_elems`` elements (64 MB f32
    at the default); zero-padded tail edges contribute exact zero blocks.
    """
    E, a, b = B.shape
    chunk = max(128, max_elems // max(1, a * n_c * b))
    if E <= chunk:
        return _cross_block_chunk(idx_r, idx_c, B, n_r, n_c)
    n_chunks = -(-E // chunk)
    pad = n_chunks * chunk - E
    idx_r = jnp.pad(idx_r, (0, pad))
    idx_c = jnp.pad(idx_c, (0, pad))
    B = jnp.pad(B, ((0, pad), (0, 0), (0, 0)))

    def body(i, acc):
        s = i * chunk
        return acc + _cross_block_chunk(
            jax.lax.dynamic_slice_in_dim(idx_r, s, chunk),
            jax.lax.dynamic_slice_in_dim(idx_c, s, chunk),
            jax.lax.dynamic_slice_in_dim(B, s, chunk),
            n_r,
            n_c,
        )

    out0 = jnp.zeros((n_r, a, n_c, b), B.dtype)
    return jax.lax.fori_loop(0, n_chunks, body, out0)


def diag_embed_blocks(D: jax.Array) -> jax.Array:
    """[K, a, a] diagonal blocks into the [K, a, K, a] block grid."""
    K = D.shape[0]
    eye = jnp.eye(K, dtype=D.dtype)
    return D[:, :, None, :] * eye[:, None, :, None]


# ---------------------------------------------------------------------------
# ELL gather layout: O(K*R) segment sums for sorted, bounded edge indices
# ---------------------------------------------------------------------------
#
# The one-hot matmuls above run near MXU f32 peak but do O(E*K) work — at
# K=4096/E=16k that is ~100x the FLOPs the segment sums actually need, and
# it dominates both the CG matvec and the per-iteration linearization
# (measured: benchmarks/device_time_bench.py roofline). The SLAM engine's
# graphs satisfy two structural invariants the generic path ignores:
#
#   * edge arrays are appended in keyframe order, so the pose index of the
#     real (masked-prefix) edges is NONDECREASING — this survives fixed-lag
#     compaction (solver/fixed_lag.py uses a stable partition and subtracts
#     a constant) and multisession concatenation;
#   * each keyframe ingests at most ``max_detections_per_frame *
#     max_planes_per_detection`` landmark edges and one odometry edge per
#     side, so the per-pose edge count has a STATIC config bound R.
#
# Under that contract every segment sum becomes a [K, R] GATHER + sum —
# O(K*R) elements instead of O(E*K) multiply-adds, turning the solver's
# dominant cost into a minor one. Empty slots carry -1 and read a zero pad
# row, so capacity padding and ragged counts cost nothing.


def _row_counts(key: jax.Array, n: int) -> jax.Array:
    """#edges per output row, [n] i32 — a two-level (hi/lo digit) one-hot
    count: O(E*sqrt(n)) compares + one wide MXU contraction, instead of the
    O(E*n) flat compare or a serial bincount. (Same digit trick as
    pcg._seg_sum_l; narrow flat one-hots run at VPU compare speed —
    CLAUDE.md r3 note.)"""
    E = key.shape[0]
    lo_w = 1
    while lo_w * lo_w < n:
        lo_w *= 2
    hi = -(-n // lo_w)
    lo_e = key % lo_w
    hi_e = key // lo_w
    oh_lo = (
        lo_e[:, None] == jnp.arange(lo_w, dtype=key.dtype)[None, :]
    ).astype(jnp.float32)
    oh_hi = (
        hi_e[:, None] == jnp.arange(hi, dtype=key.dtype)[None, :]
    ).astype(jnp.float32)
    T = jnp.einsum("eh,el->hl", oh_hi, oh_lo)  # [hi, lo_w] counts
    return T.reshape(hi * lo_w)[:n].astype(jnp.int32)


def build_slots(idx: jax.Array, mask: jax.Array, n: int, r: int) -> jax.Array:
    """[n, r] ELL slot table for a sorted, bounded segment index vector.

    ``idx[e]`` names the output row of edge ``e``; ``mask`` marks real
    edges (a PREFIX — capacity padding is a suffix). Requires the masked
    prefix of ``idx`` nondecreasing with at most ``r`` entries per value
    (the caller's contract; violations silently drop edges ``r+1...``).
    Returns slot positions into the edge axis, or -1 for empty slots.

    Implementation: per-row counts + exclusive cumsum. jnp.searchsorted
    (the r3 form) lowers to binary-search WHILE loops on TPU — four serial
    loops of ~400 us each per solve at K=4096 (profiled r4); the count form
    is equivalent for sorted keys and fully parallel.
    """
    key = jnp.where(mask, idx, n).astype(jnp.int32)  # pad tail sorts last
    counts = _row_counts(key, n)
    hi = jnp.cumsum(counts).astype(jnp.int32)
    lo = hi - counts
    slots = lo[:, None] + jnp.arange(r, dtype=jnp.int32)[None, :]
    return jnp.where(slots < hi[:, None], slots, -1)


def count_uncovered(idx: jax.Array, mask: jax.Array, n: int, r: int) -> jax.Array:
    """Number of REAL edges ``build_slots(idx, mask, n, r)`` would silently
    drop (contract violations: per-pose count above ``r``, or unsorted /
    out-of-range indices in the masked prefix). The engine's construction
    invariants guarantee 0; tests assert it so a future edge type that breaks
    the contract fails loudly instead of corrupting TPU solves silently."""
    slots = build_slots(idx, mask, n, r)
    covered = jnp.zeros((idx.shape[0] + 1,), jnp.int32)
    covered = covered.at[jnp.where(slots >= 0, slots, idx.shape[0])].set(
        1, mode="drop"
    )
    # counts are order-invariant, so coverage alone cannot see a mis-sorted
    # prefix (it would mis-ATTRIBUTE edges, not drop them) — check the
    # monotonicity contract explicitly
    key = jnp.where(mask, idx, n).astype(jnp.int32)
    inversions = jnp.sum((key[1:] < key[:-1]).astype(jnp.int32))
    return jnp.sum(mask.astype(jnp.int32)) - jnp.sum(covered[:-1]) + inversions


def slot_sum(vals: jax.Array, slots: jax.Array) -> jax.Array:
    """Segment-sum ``vals`` [E, ...] into [n, ...] through an ELL slot
    table (``build_slots``): a gather of ``n*r`` rows + a sum — no scatter,
    no [E, n] one-hot. Empty (-1) slots read a zero pad row."""
    pad = jnp.zeros((1,) + vals.shape[1:], vals.dtype)
    vp = jnp.concatenate([vals, pad], axis=0)
    safe = jnp.where(slots >= 0, slots, vals.shape[0])
    return vp[safe].sum(axis=1)
