"""Pallas TPU kernels for the frontend hot ops.

``score_hypotheses`` fuses the RANSAC hypothesis-scoring inner loop of the
plane extractor (``frontend/planes.py``): for every pixel x every plane
hypothesis, the point-to-plane distance gate AND the normal-alignment gate
AND the candidate mask, reduced to per-hypothesis inlier counts — without
ever materializing the [N, S] intermediate in HBM. Each grid step streams a
pixel tile into VMEM, does two [T,3]x[3,S] MXU matmuls, and accumulates
counts in the output block.

A pure-jnp reference implementation backs non-TPU platforms and the
correctness tests (pallas interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 2048


def score_hypotheses_ref(pts, nrm, cand, hyp_n, hyp_d, dist_thres, cos_thres):
    """jnp reference: returns per-hypothesis inlier counts [S] (f32)."""
    dist = jnp.abs(pts @ hyp_n.T + hyp_d[None, :])  # [N, S]
    align = nrm @ hyp_n.T
    inl = (dist < dist_thres) & (align > cos_thres) & cand[:, None]
    return jnp.sum(inl, axis=0).astype(pts.dtype)


def _score_kernel(pts_ref, nrm_ref, cand_ref, hypn_ref, hypd_ref, thr_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    pts = pts_ref[:]  # [T, 3]
    nrm = nrm_ref[:]
    cand = cand_ref[:]  # [T, 1]
    hyp_n = hypn_ref[:]  # [S, 3]
    hyp_d = hypd_ref[:]  # [1, S]
    dist_thres = thr_ref[0, 0]
    cos_thres = thr_ref[0, 1]

    dist = jnp.abs(
        jnp.dot(pts, hyp_n.T, preferred_element_type=jnp.float32) + hyp_d
    )  # [T, S]
    align = jnp.dot(nrm, hyp_n.T, preferred_element_type=jnp.float32)
    inl = (dist < dist_thres) & (align > cos_thres) & (cand > 0.5)
    out_ref[:] = out_ref[:] + jnp.sum(
        inl.astype(jnp.float32), axis=0, keepdims=True
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def score_hypotheses_pallas(
    pts, nrm, cand, hyp_n, hyp_d, dist_thres, cos_thres, interpret: bool = False
):
    """Pallas version; pts/nrm [N,3] f32, cand [N] bool, hyp_n [S,3],
    hyp_d [S]. N must be a multiple of TILE (the extractor's sample grids
    are powers of two)."""
    N = pts.shape[0]
    S = hyp_n.shape[0]
    tile = min(TILE, N)
    assert N % tile == 0
    grid = N // tile

    thr = jnp.stack([dist_thres, cos_thres]).reshape(1, 2).astype(jnp.float32)
    cand_f = cand.astype(jnp.float32).reshape(N, 1)

    out = pl.pallas_call(
        _score_kernel,
        out_shape=jax.ShapeDtypeStruct((1, S), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        pts.astype(jnp.float32),
        nrm.astype(jnp.float32),
        cand_f,
        hyp_n.astype(jnp.float32),
        hyp_d.reshape(1, S).astype(jnp.float32),
        thr,
    )
    return out[0].astype(pts.dtype)


def use_pallas_default() -> bool:
    """Pallas kernels only on real TPU backends (axon/tpu)."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
