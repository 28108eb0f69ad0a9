"""Point-cloud filters — the PCL filter set of the reference, batched.

Equivalents of ``plane_segmentation``'s filters
(``/root/reference/src/planar_segmentation/plane_segmentation.cpp``):
voxel-grid downsample (0.1 m leaf, :564-582), statistical outlier removal
(meanK 50 / stddev 1.0, :584-606) and the 0.3–3 m range filter (:608-629).
Off the reference's main path (preprocess is commented out there) but part
of the library surface; everything is static-shape, mask-based, jittable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("grid_dim",))
def voxel_downsample(
    pts: jax.Array,  # [N, 3]
    valid: jax.Array,  # [N]
    leaf: jax.Array | float = 0.1,
    grid_dim: int = 64,
):
    """Voxel-grid downsample: per-occupied-voxel centroid.

    Returns (centroids [N,3], keep_mask [N]) where entry i holds the
    centroid of the voxel whose FIRST member is point i (stable
    representative, keeps static shape).
    """
    N = pts.shape[0]
    leaf = jnp.asarray(leaf, pts.dtype)
    origin = jnp.min(jnp.where(valid[:, None], pts, jnp.inf), axis=0)
    idx3 = jnp.floor((pts - origin) / leaf).astype(jnp.int32)
    idx3 = jnp.clip(idx3, 0, grid_dim - 1)
    key = (idx3[:, 0] * grid_dim + idx3[:, 1]) * grid_dim + idx3[:, 2]
    key = jnp.where(valid, key, grid_dim**3)  # invalid -> dump bucket

    nb = grid_dim**3 + 1
    sums = jnp.zeros((nb, 3), pts.dtype).at[key].add(jnp.where(valid[:, None], pts, 0))
    cnts = jnp.zeros((nb,), pts.dtype).at[key].add(valid.astype(pts.dtype))
    centroids_per_voxel = sums / jnp.maximum(cnts[:, None], 1.0)

    # a voxel's representative is its smallest member index
    first_full = jnp.full((nb,), N, jnp.int32).at[key].min(jnp.arange(N, dtype=jnp.int32))
    keep = valid & (first_full[key] == jnp.arange(N))
    return centroids_per_voxel[key], keep


@partial(jax.jit, static_argnames=("mean_k",))
def statistical_outlier_removal(
    pts: jax.Array, valid: jax.Array, mean_k: int = 50, stddev_mul: float = 1.0
):
    """PCL StatisticalOutlierRemoval: mean distance to k nearest neighbours,
    global mean+std threshold. O(N^2) distances — intended for the already
    cropped/downsampled clouds it is used on."""
    d2 = jnp.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    big = jnp.asarray(jnp.finfo(pts.dtype).max, pts.dtype)
    d2 = jnp.where(valid[None, :], d2, big)
    d2 = d2 + jnp.eye(pts.shape[0], dtype=pts.dtype) * big  # exclude self
    knn = -jax.lax.top_k(-d2, mean_k)[0]  # [N, k] smallest distances
    mean_d = jnp.mean(jnp.sqrt(jnp.maximum(knn, 0.0)), axis=1)
    m = valid
    mu = jnp.sum(jnp.where(m, mean_d, 0)) / jnp.maximum(jnp.sum(m), 1)
    var = jnp.sum(jnp.where(m, (mean_d - mu) ** 2, 0)) / jnp.maximum(jnp.sum(m), 1)
    thr = mu + stddev_mul * jnp.sqrt(var)
    return valid & (mean_d <= thr)


@jax.jit
def range_filter(pts: jax.Array, valid: jax.Array, d_min: float = 0.3, d_max: float = 3.0):
    """Distance filter 0.3–3 m (plane_segmentation.cpp:608-629)."""
    d = jnp.linalg.norm(pts, axis=-1)
    return valid & (d > d_min) & (d < d_max)
