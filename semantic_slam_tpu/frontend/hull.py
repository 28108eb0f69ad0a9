"""Planar polygon-area estimation — the ``compute2DConvexHull`` equivalent.

The reference fits a RANSAC plane, projects inliers, builds a convex hull
and gates on ``pcl::calculatePolygonArea``
(``plane_segmentation.cpp:189-195,631-665``). Pointer-walking hull
algorithms are jit-hostile, so two batched estimators are provided:

* ``pca_area``    — moment matching ``12*sqrt(l1*l2)`` (exact for uniform
  rectangles; what the extraction pipeline uses by default),
* ``polygon_area``— angular-sort shoelace: project inliers into the plane
  basis, sort by angle about the centroid, take the farthest point per
  angular bin, and apply the shoelace formula. Exact for convex regions
  (== hull area), a documented under-estimate for concave boundaries.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def plane_basis(n: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Orthonormal in-plane basis for unit normal n."""
    ref = jnp.where(
        jnp.abs(n[2]) < 0.9,
        jnp.array([0.0, 0.0, 1.0], dtype=n.dtype),
        jnp.array([1.0, 0.0, 0.0], dtype=n.dtype),
    )
    u = jnp.cross(n, ref)
    u = u / jnp.maximum(jnp.linalg.norm(u), 1e-12)
    v = jnp.cross(n, u)
    return u, v


def pca_area(evals: jax.Array) -> jax.Array:
    """Area from in-plane covariance eigenvalues (ascending [3])."""
    return 12.0 * jnp.sqrt(jnp.maximum(evals[1] * evals[2], 0.0))


@partial(jax.jit, static_argnames=("bins",))
def polygon_area(
    pts: jax.Array,  # [N, 3]
    mask: jax.Array,  # [N] bool (plane inliers)
    normal: jax.Array,  # [3] unit plane normal
    bins: int = 64,
) -> jax.Array:
    """Shoelace area of the angular-binned boundary polygon of the inliers.

    Equals the convex hull area for convex inlier regions; boundary points
    are the farthest inlier per angular bin about the centroid.
    """
    dtype = pts.dtype
    m = mask.astype(dtype)
    n_in = jnp.maximum(jnp.sum(m), 1.0)
    c = jnp.sum(pts * m[:, None], axis=0) / n_in
    u, v = plane_basis(normal)
    rel = pts - c
    x = rel @ u
    y = rel @ v
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(y, x)  # [-pi, pi)
    b = jnp.clip(((theta + jnp.pi) / (2 * jnp.pi) * bins).astype(jnp.int32), 0, bins - 1)

    # farthest inlier radius per bin (masked scatter-max)
    r_masked = jnp.where(mask, r, -1.0)
    rmax = jnp.full((bins,), -1.0, dtype).at[b].max(r_masked)
    occupied = rmax > 0

    # shoelace over the bin-center polygon; empty bins contribute zero by
    # carrying radius 0
    ang = (jnp.arange(bins) + 0.5) / bins * 2 * jnp.pi - jnp.pi
    rr = jnp.where(occupied, rmax, 0.0)
    px = rr * jnp.cos(ang)
    py = rr * jnp.sin(ang)
    nx = jnp.roll(px, -1)
    ny = jnp.roll(py, -1)
    return 0.5 * jnp.abs(jnp.sum(px * ny - py * nx))
