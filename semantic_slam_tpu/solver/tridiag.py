"""Block-tridiagonal solves via parallel cyclic reduction (PCR).

The reduced camera system of a SLAM chain is dominated by the odometry
tridiagonal: pose k couples to k-1 and k+1 through the chain edges, while
landmark Schur fill adds (mostly local) extra coupling. A block-tridiagonal
preconditioner therefore captures far more of the operator than block-Jacobi
— but the textbook block-Thomas factorization is a length-K SERIAL
recurrence, the worst possible shape for a TPU.

PCR instead eliminates neighbors at strides 1, 2, 4, ... : each of the
ceil(log2 K) levels is a fully BATCHED set of 6x6 inverses/matmuls over all
K rows (VPU/MXU work, no scan carry). Factorization precomputes per-level
elimination coefficients; applying the preconditioner to a new rhs is
log2(K) levels of two batched [K,6,6]x[K,6] matvecs plus one final
block-diagonal solve.

Boundary/inactive rows are handled by masking: fixed or inactive poses get
identity diagonal blocks and zero couplings, so their solution components
pass through untouched.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from semantic_slam_tpu.solver.lm import inv33, inv66  # noqa: F401


def _inv66(A: jax.Array) -> jax.Array:
    """Batched 6x6 inverse — analytic block-Schur (lm.inv66); the previous
    jnp.linalg.inv lowered to per-matrix LU custom-calls on TPU.

    PRECONDITION (inherited from lm.inv66): each matrix's leading 3x3 block
    and its Schur complement must be invertible — no pivoting happens, so an
    ill-conditioned leading block yields silent non-finite output where an
    LU would still solve. Holds for the damped SPD diagonals and the
    diagonally-dominant PCR elimination blocks this module feeds it; a new
    caller with arbitrary blocks must guarantee it (or check finiteness)."""
    return inv66(A)


class PCRFactor(NamedTuple):
    alphas: jax.Array  # [L, K, 6, 6] lower-elimination coefficients per level
    gammas: jax.Array  # [L, K, 6, 6] upper-elimination coefficients per level
    final_inv: jax.Array  # [K, 6, 6] inverse of the fully-reduced diagonal


def _shift_down(x: jax.Array, s: int) -> jax.Array:
    """y_k = x_{k-s} (zero-filled): rows move toward larger k."""
    return jnp.pad(x, [(s, 0)] + [(0, 0)] * (x.ndim - 1))[: x.shape[0]]


def _shift_up(x: jax.Array, s: int) -> jax.Array:
    """y_k = x_{k+s} (zero-filled)."""
    return jnp.pad(x, [(0, s)] + [(0, 0)] * (x.ndim - 1))[s:]


def pcr_factor(diag: jax.Array, upper: jax.Array) -> PCRFactor:
    """Factor the symmetric block tridiagonal with diagonal blocks ``diag``
    [K,6,6] and super-diagonal blocks ``upper`` [K,6,6] (row k couples to
    k+1 via upper[k]; upper[K-1] must be zero). Sub-diagonal is upper^T.
    """
    K = diag.shape[0]
    levels = max(1, math.ceil(math.log2(K))) if K > 1 else 1

    b = diag
    c = upper  # coupling k -> k+s
    a = jnp.swapaxes(_shift_down(upper, 1), -1, -2)  # coupling k -> k-s

    alphas = []
    gammas = []
    s = 1
    for _ in range(levels):
        binv = _inv66(b)
        binv_dn = _shift_down(binv, s)  # inv(b_{k-s})
        binv_up = _shift_up(binv, s)  # inv(b_{k+s})
        alpha = a @ binv_dn  # zero rows where k-s < 0 (a already zero there)
        gamma = c @ binv_up

        a_dn = _shift_down(a, s)
        c_dn = _shift_down(c, s)
        a_up = _shift_up(a, s)
        c_up = _shift_up(c, s)
        b = b - alpha @ c_dn - gamma @ a_up
        a_new = -(alpha @ a_dn)
        c_new = -(gamma @ c_up)
        a, c = a_new, c_new

        alphas.append(alpha)
        gammas.append(gamma)
        s *= 2

    return PCRFactor(
        alphas=jnp.stack(alphas), gammas=jnp.stack(gammas), final_inv=_inv66(b)
    )


def pcr_solve(fac: PCRFactor, r: jax.Array) -> jax.Array:
    """Apply the factored inverse to rhs ``r`` [K,6]."""
    levels = fac.alphas.shape[0]
    s = 1
    for l in range(levels):
        r = (
            r
            - jnp.einsum("kij,kj->ki", fac.alphas[l], _shift_down(r, s))
            - jnp.einsum("kij,kj->ki", fac.gammas[l], _shift_up(r, s))
        )
        s *= 2
    return jnp.einsum("kij,kj->ki", fac.final_inv, r)


def pcr_solve_cols(fac: PCRFactor, R: jax.Array) -> jax.Array:
    """Apply the factored inverse to a block of rhs columns ``R`` [K,6,C]
    at once — each PCR level is one batched [K,6,6]x[K,6,C] matmul, so a
    wide C (e.g. the 3L marginal-recovery columns) rides the MXU instead of
    looping pcr_solve."""
    levels = fac.alphas.shape[0]
    s = 1
    for l in range(levels):
        R = (
            R
            - jnp.einsum("kij,kjc->kic", fac.alphas[l], _shift_down(R, s))
            - jnp.einsum("kij,kjc->kic", fac.gammas[l], _shift_up(R, s))
        )
        s *= 2
    return jnp.einsum("kij,kjc->kic", fac.final_inv, R)


def chain_blocks_from_edges(
    diag: jax.Array,  # [K, 6, 6] damped pose diagonal (already masked/identity)
    oi: jax.Array,
    oj: jax.Array,
    H_ij: jax.Array,  # [E, 6, 6] odometry cross blocks (masked rows zeroed)
    pose_free: jax.Array,  # [K] float/bool
) -> tuple[jax.Array, jax.Array]:
    """Assemble (diag, upper) for the chain preconditioner from edge blocks.

    Only edges with j == i+1 (the odometry chain the engine builds,
    semantic_graph_slam.cpp:104-150) contribute off-diagonal coupling; any
    other edge simply isn't represented in the preconditioner. Couplings
    touching fixed/inactive poses are zeroed so those rows stay identity.
    """
    K = diag.shape[0]
    pf = pose_free.astype(diag.dtype)
    chain = (oj == oi + 1) & (oj < K)
    w = chain.astype(diag.dtype) * pf[oi] * pf[jnp.clip(oj, 0, K - 1)]
    upper = jnp.zeros((K, 6, 6), diag.dtype).at[jnp.where(chain, oi, K)].add(
        H_ij * w[:, None, None], mode="drop"
    )
    upper = upper.at[K - 1].set(0.0)
    return diag, upper
