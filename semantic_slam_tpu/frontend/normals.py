"""Integral-image surface normals for organized RGB-D clouds.

TPU re-design of PCL's ``IntegralImageNormalEstimation`` in COVARIANCE_MATRIX
mode as configured by the reference
(``/root/reference/src/planar_segmentation/plane_segmentation.cpp:84-106``:
smoothing size 20, max depth change 0.03): per-pixel covariance of the 3-D
points inside a box window, computed with 2-D prefix sums (cumsum along both
image axes — pure VPU/HBM streaming, no gather), then the smallest
eigenvector via closed-form symmetric 3x3 eigen-analysis.

Divergences from PCL (documented):
  * PCL adaptively shrinks the smoothing window near depth discontinuities
    (MaxDepthChangeFactor); here a depth-compatibility weight keeps the fixed
    window but discards pixels whose depth differs from the center by more
    than ``max_depth_change_factor * z_center`` — same intent, branch-free.
    Implemented as a post-filter on covariance validity rather than per-pixel
    window resizing (which is hostile to vectorization).
  * Normals are computed on the full image once, not per bbox crop; crop
    borders therefore see true neighborhoods (strictly better data).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from semantic_slam_tpu.core import linalg3


def _box_sum(ii: jax.Array, r: int) -> jax.Array:
    """Box-filter sums from an inclusive 2-D integral image.

    ii: [H+1, W+1, C] zero-padded prefix sums. Returns [H, W, C] sums over
    the (2r+1)^2 window clipped to the image.

    The window clip (index ``clip(i±r, 0, H)``) is realized by EDGE-padding
    the integral image and taking four STATIC slices: clipped advanced
    indexing lowers to TPU gathers, which are latency-bound and dominated
    the whole frontend (measured 8.2 ms of a 10 ms 640x480 detection tick;
    identical values either way — same elements, different access pattern).
    """
    H = ii.shape[0] - 1
    W = ii.shape[1] - 1
    # J[i + r + d] == ii[clip(i + d, 0, H)] for d in [-r, r+1]
    J = jnp.pad(ii, ((r, r + 1), (r, r + 1), (0, 0)), mode="edge")
    s = 2 * r + 1
    a = J[s : s + H, s : s + W]
    b = J[0:H, s : s + W]
    c = J[s : s + H, 0:W]
    d = J[0:H, 0:W]
    return a - b - c + d


@partial(jax.jit, static_argnames=("smoothing_size", "min_points"))
def compute_normals(
    points: jax.Array,
    valid: jax.Array,
    smoothing_size: int = 20,
    min_points: int = 4,
) -> tuple[jax.Array, jax.Array]:
    """Per-pixel unit normals (oriented toward the camera) + validity mask.

    points: [H, W, 3] camera-frame points; valid: [H, W] bool.
    Returns (normals [H, W, 3], normal_valid [H, W]).
    """
    dtype = points.dtype
    v = valid.astype(dtype)[..., None]
    p = jnp.where(valid[..., None], points, 0.0)

    x, y, z = p[..., 0:1], p[..., 1:2], p[..., 2:3]
    feats = jnp.concatenate(
        [p, x * x, x * y, x * z, y * y, y * z, z * z, v], axis=-1
    )  # [H, W, 10]
    feats = feats * v  # zero out invalid contributions

    ii = jnp.cumsum(jnp.cumsum(feats, axis=0), axis=1)
    ii = jnp.pad(ii, ((1, 0), (1, 0), (0, 0)))

    r = smoothing_size // 2
    s = _box_sum(ii, r)
    n = s[..., 9:10]
    n_safe = jnp.maximum(n, 1.0)
    mean = s[..., 0:3] / n_safe
    mx, my, mz = mean[..., 0], mean[..., 1], mean[..., 2]
    sxx, sxy, sxz = s[..., 3], s[..., 4], s[..., 5]
    syy, syz, szz = s[..., 6], s[..., 7], s[..., 8]
    nn = n_safe[..., 0]
    c00 = sxx / nn - mx * mx
    c01 = sxy / nn - mx * my
    c02 = sxz / nn - mx * mz
    c11 = syy / nn - my * my
    c12 = syz / nn - my * mz
    c22 = szz / nn - mz * mz
    C = jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=-1),
            jnp.stack([c01, c11, c12], axis=-1),
            jnp.stack([c02, c12, c22], axis=-1),
        ],
        axis=-2,
    )

    normal, evals = linalg3.sym33_smallest_eig(C)

    # orient toward viewpoint at the origin (PCL flipNormalTowardsViewpoint)
    flip = jnp.sum(normal * points, axis=-1, keepdims=True) > 0
    normal = jnp.where(flip, -normal, normal)

    # depth-discontinuity rejection: window z-variance vs allowed change
    max_dz = 0.03 * jnp.abs(points[..., 2]) + 0.02
    depth_ok = jnp.sqrt(jnp.maximum(c22, 0.0)) < max_dz * 3.0

    normal_valid = valid & (n[..., 0] >= min_points) & depth_ok
    return normal, normal_valid


@partial(jax.jit, static_argnames=("smoothing_size", "min_points", "num_scales"))
def compute_normals_adaptive(
    points: jax.Array,
    valid: jax.Array,
    smoothing_size: int = 20,
    min_points: int = 4,
    num_scales: int = 3,
    max_depth_change_factor: float = 0.03,
) -> tuple[jax.Array, jax.Array]:
    """PCL-faithful adaptive-window variant of ``compute_normals``.

    PCL's ``IntegralImageNormalEstimation`` shrinks the smoothing window near
    depth discontinuities (distance-map / MaxDepthChangeFactor logic). The
    branch-free TPU analog: evaluate the SAME integral image at
    ``num_scales`` radii (full, half, quarter, ...), count depth-edge pixels
    inside each window via a second integral image, and per pixel select the
    LARGEST window containing no discontinuity (smallest otherwise). Cost is
    ``num_scales`` box-sum reads of one prefix-sum tensor — no gathers, no
    data-dependent control flow.
    """
    dtype = points.dtype
    v = valid.astype(dtype)[..., None]
    p = jnp.where(valid[..., None], points, 0.0)

    x, y, z = p[..., 0:1], p[..., 1:2], p[..., 2:3]
    feats = jnp.concatenate([p, x * x, x * y, x * z, y * y, y * z, z * z, v], axis=-1)
    feats = feats * v
    ii = jnp.cumsum(jnp.cumsum(feats, axis=0), axis=1)
    ii = jnp.pad(ii, ((1, 0), (1, 0), (0, 0)))

    # depth-edge map (PCL's depth change map): neighbor |dz| above
    # factor * z, or a validity transition
    zz = points[..., 2]
    thr = max_depth_change_factor * jnp.abs(zz) + 0.02
    dz_x = jnp.abs(jnp.diff(zz, axis=1, prepend=zz[:, :1]))
    dz_y = jnp.abs(jnp.diff(zz, axis=0, prepend=zz[:1, :]))
    # edge-replicate like dz above — jnp.roll would wrap border columns/rows
    # around and compare opposite image borders
    vdiff_x = valid != jnp.concatenate([valid[:, :1], valid[:, :-1]], axis=1)
    vdiff_y = valid != jnp.concatenate([valid[:1, :], valid[:-1, :]], axis=0)
    edge = (dz_x > thr) | (dz_y > thr) | vdiff_x | vdiff_y
    ii_e = jnp.cumsum(jnp.cumsum(edge.astype(dtype)[..., None], axis=0), axis=1)
    ii_e = jnp.pad(ii_e, ((1, 0), (1, 0), (0, 0)))

    radii = [max(1, (smoothing_size // 2) >> k) for k in range(num_scales)]
    s_stack = jnp.stack([_box_sum(ii, r) for r in radii])  # [R, H, W, 10]
    e_stack = jnp.stack([_box_sum(ii_e, r)[..., 0] for r in radii])  # [R, H, W]

    clean = e_stack <= 0.5  # window free of discontinuities
    # index of the first (largest-radius) clean scale; fall back to smallest
    first_clean = jnp.argmax(clean, axis=0)
    any_clean = jnp.any(clean, axis=0)
    sel = jnp.where(any_clean, first_clean, len(radii) - 1)  # [H, W]
    # per-pixel scale pick as R selects, not a take_along_axis gather
    # (TPU gathers are latency-bound; R is tiny)
    s = s_stack[len(radii) - 1]
    for k in range(len(radii) - 2, -1, -1):
        s = jnp.where((sel == k)[..., None], s_stack[k], s)

    n = s[..., 9:10]
    n_safe = jnp.maximum(n, 1.0)
    mean = s[..., 0:3] / n_safe
    mx, my, mz = mean[..., 0], mean[..., 1], mean[..., 2]
    nn = n_safe[..., 0]
    c00 = s[..., 3] / nn - mx * mx
    c01 = s[..., 4] / nn - mx * my
    c02 = s[..., 5] / nn - mx * mz
    c11 = s[..., 6] / nn - my * my
    c12 = s[..., 7] / nn - my * mz
    c22 = s[..., 8] / nn - mz * mz
    C = jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=-1),
            jnp.stack([c01, c11, c12], axis=-1),
            jnp.stack([c02, c12, c22], axis=-1),
        ],
        axis=-2,
    )
    normal, _ = linalg3.sym33_smallest_eig(C)
    flip = jnp.sum(normal * points, axis=-1, keepdims=True) > 0
    normal = jnp.where(flip, -normal, normal)

    # windows that shrank to the smallest radius AND still contain an edge
    # keep the fixed-window variance rejection as a safety net
    max_dz = max_depth_change_factor * jnp.abs(zz) + 0.02
    depth_ok = any_clean | (jnp.sqrt(jnp.maximum(c22, 0.0)) < max_dz * 3.0)
    normal_valid = valid & (n[..., 0] >= min_points) & depth_ok
    return normal, normal_valid
