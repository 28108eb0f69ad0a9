"""Closed-form symmetric 3x3 eigen-analysis, fully vectorized (VPU-friendly).

No iterative eigensolvers on the hot path: plane normals are the smallest
eigenvector of a per-pixel covariance, computed for ~300k pixels per frame,
so everything is branch-free elementwise math + cross products.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sym33_eigvals(C: jax.Array) -> jax.Array:
    """Eigenvalues of symmetric 3x3 matrices, ascending. C: [..., 3, 3]."""
    c00, c01, c02 = C[..., 0, 0], C[..., 0, 1], C[..., 0, 2]
    c11, c12, c22 = C[..., 1, 1], C[..., 1, 2], C[..., 2, 2]
    p1 = c01 * c01 + c02 * c02 + c12 * c12
    q = (c00 + c11 + c22) / 3.0
    p2 = (c00 - q) ** 2 + (c11 - q) ** 2 + (c22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.maximum(p, 1e-30)

    b00, b11, b22 = (c00 - q) / safe_p, (c11 - q) / safe_p, (c22 - q) / safe_p
    b01, b02, b12 = c01 / safe_p, c02 / safe_p, c12 / safe_p
    detB = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    e_max = q + 2.0 * p * jnp.cos(phi)
    e_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_max - e_min
    return jnp.stack([e_min, e_mid, e_max], axis=-1)


def sym33_eigvec_for(C: jax.Array, lam: jax.Array) -> jax.Array:
    """Unit eigenvector of symmetric C for eigenvalue lam.

    Null-space of (C - lam I) via the largest cross product of its rows —
    robust without branching; isotropic matrices fall back to e_z.
    """
    A = C - lam[..., None, None] * jnp.eye(3, dtype=C.dtype)
    r0, r1, r2 = A[..., 0, :], A[..., 1, :], A[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.where(
        ((n01 >= n02) & (n01 >= n12))[..., None],
        c01,
        jnp.where((n02 >= n12)[..., None], c02, c12),
    )
    norm = jnp.linalg.norm(best, axis=-1, keepdims=True)
    fallback = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], dtype=C.dtype), best.shape)
    ok = norm[..., 0] > 1e-20
    return jnp.where(ok[..., None], best / jnp.maximum(norm, 1e-30), fallback)


def sym33_smallest_eig(C: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(unit eigenvector of smallest eigenvalue, eigenvalues ascending)."""
    evals = sym33_eigvals(C)
    return sym33_eigvec_for(C, evals[..., 0]), evals
