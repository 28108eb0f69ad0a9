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

import jax
import jax.numpy as jnp


def resolve_assembly(kind: str) -> str:
    if kind != "auto":
        return kind
    import os

    forced = os.environ.get("SLAM_ASSEMBLY", "")
    if forced in ("matmul", "scatter"):
        return forced
    return "matmul" if jax.default_backend() == "tpu" else "scatter"


def onehot(idx: jax.Array, n: int, dtype) -> jax.Array:
    """[E, n] exact 0/1 selection matrix."""
    return (idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :]).astype(dtype)


def segment_sum_mm(idx: jax.Array, vals: jax.Array, n: int) -> jax.Array:
    """sum_e vals[e] into row idx[e] of an [n, ...] output — as one matmul."""
    return jnp.einsum("ek,e...->k...", onehot(idx, n, vals.dtype), vals)


def cross_block_mm(
    idx_r: jax.Array, idx_c: jax.Array, B: jax.Array, n_r: int, n_c: int
) -> jax.Array:
    """sum_e  e_r(idx_r[e]) ⊗ B_e ⊗ e_c(idx_c[e])^T  as two matmuls.

    B is [E, a, b]; returns the block grid in [n_r, a, n_c, b] layout
    (reshape to the flat [a*n_r, b*n_c] system afterwards).
    """
    Or = onehot(idx_r, n_r, B.dtype)
    Oc = onehot(idx_c, n_c, B.dtype)
    Z = jnp.einsum("eab,el->ealb", B, Oc)  # [E, a, n_c, b]
    return jnp.einsum("ek,ealb->kalb", Or, Z)


def diag_embed_blocks(D: jax.Array) -> jax.Array:
    """[K, a, a] diagonal blocks into the [K, a, K, a] block grid."""
    K = D.shape[0]
    eye = jnp.eye(K, dtype=D.dtype)
    return D[:, :, None, :] * eye[:, None, :, None]
