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
_ENV_FORCED = os.environ.get("SLAM_ASSEMBLY", "")


def resolve_assembly(kind: str) -> str:
    if kind != "auto":
        return kind
    if _ENV_FORCED in ("matmul", "scatter"):
        return _ENV_FORCED
    return "matmul" if jax.default_backend() == "tpu" else "scatter"


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
