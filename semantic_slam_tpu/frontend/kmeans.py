"""Batched k-means + the reference's legacy clustering plane pipeline.

The reference carries a second (pre-OrganizedMultiPlaneSegmentation) plane
path built on OpenCV k-means: normal-space clustering, gravity filtering of
centroids, then distance-space clustering within each normal cluster
(``plane_segmentation.cpp:261-535``). It is dead on the main path but part
of the component surface (SURVEY.md §2 item 12d); re-built here TPU-style:
fixed iteration count, masked points, deterministic plus-plus-ish seeding
by strided sampling.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(
    x: jax.Array,  # [N, D]
    valid: jax.Array,  # [N]
    k: int = 3,
    iters: int = 10,
):
    """Masked Lloyd iterations; returns (centroids [k,D], labels [N],
    compactness). Seeding: evenly strided valid-agnostic picks (deterministic
    — replaces cv::KMEANS_RANDOM_CENTERS)."""
    N = x.shape[0]
    seeds = x[(jnp.arange(k) * N) // k + N // (2 * k)]

    def step(c, _):
        d2 = jnp.sum((x[:, None, :] - c[None, :, :]) ** 2, axis=-1)  # [N,k]
        lab = jnp.argmin(d2, axis=1)
        w = valid.astype(x.dtype)
        one_hot = (lab[:, None] == jnp.arange(k)[None, :]).astype(x.dtype) * w[:, None]
        sums = one_hot.T @ x  # [k, D]
        cnts = jnp.sum(one_hot, axis=0)  # [k]
        c_new = jnp.where(cnts[:, None] > 0, sums / jnp.maximum(cnts[:, None], 1.0), c)
        return c_new, None

    c, _ = jax.lax.scan(step, seeds, None, length=iters)
    d2 = jnp.sum((x[:, None, :] - c[None, :, :]) ** 2, axis=-1)
    labels = jnp.argmin(d2, axis=1)
    compactness = jnp.sum(jnp.min(d2, axis=1) * valid.astype(x.dtype))
    return c, labels, compactness


@partial(jax.jit, static_argnames=("k_normals", "k_dist"))
def legacy_cluster_planes(
    pts: jax.Array,  # [N, 3] cam frame
    nrm: jax.Array,  # [N, 3]
    valid: jax.Array,  # [N]
    horiz_normal_cam: jax.Array,  # [3]
    k_normals: int = 3,
    k_dist: int = 3,
    min_points: int = 500,
):
    """The legacy pipeline (clusterAndSegmentAllPlanes, cpp:261-294):

      1. k-means over normals; keep centroids within +-0.3 of the gravity
         normal in cam frame per axis (filterCentroids, :504-523),
      2. per kept normal-cluster: k-means over plane offsets d = -(n.p)
         (distanceBasedSegmentation, :369-430),
      3. emit (normal, d) planes with enough supporting points.

    Returns (planes [k_normals*k_dist, 4], counts, valid_mask).
    """
    nc, nlab, _ = kmeans(nrm, valid, k=k_normals)
    ok_c = (
        (jnp.abs(nc[:, 0] - horiz_normal_cam[0]) < 0.3)
        & (jnp.abs(nc[:, 1] - horiz_normal_cam[1]) < 0.3)
        & (jnp.abs(nc[:, 2] - horiz_normal_cam[2]) < 0.3)
    )  # [k_normals]

    P = k_normals * k_dist
    planes = jnp.zeros((P, 4), pts.dtype)
    counts = jnp.zeros((P,), pts.dtype)
    pvalid = jnp.zeros((P,), bool)

    for ci in range(k_normals):
        members = valid & (nlab == ci)
        d = -(pts @ nc[ci])  # distance along the cluster normal (:383-390)
        dc, dlab, _ = kmeans(d[:, None], members, k=k_dist)
        for di in range(k_dist):
            sel = members & (dlab == di)
            cnt = jnp.sum(sel.astype(pts.dtype))
            slot = ci * k_dist + di
            planes = planes.at[slot].set(
                jnp.concatenate([nc[ci], dc[di]])
            )
            counts = counts.at[slot].set(cnt)
            pvalid = pvalid.at[slot].set(ok_c[ci] & (cnt > min_points))
    return planes, counts, pvalid
