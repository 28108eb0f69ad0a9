"""Batched multi-plane extraction inside a detection bounding box.

TPU re-design of PCL's ``OrganizedMultiPlaneSegmentation`` as used by the
reference (``plane_segmentation.cpp:108-259``: min inliers, 2 deg angular /
2 cm distance thresholds, per-region centroid + coefficients, area gate,
horizontal/vertical classification against the gravity normal rotated into
the camera frame, normal-sign canonicalization).

Instead of connected-component region growing (pointer-chasing, hostile to
SIMD), extraction is hypothesis-scored RANSAC over the pixel-normal field:

  for each of P rounds:
    1. S plane hypotheses are seeded from evenly-spread candidate pixels
       (point + its integral-image normal),
    2. all N pixels score all S hypotheses in one [N,3]x[3,S] MXU matmul
       (distance gate) AND'd with a normal-alignment gate,
    3. the best hypothesis is refined by closed-form PCA over its inliers,
       re-scored, and its inliers are removed from the pool.

Per-region quantities the reference consumes downstream are reproduced:
centroid, oriented coefficients [nx,ny,nz,d], horizontal/vertical flag with
the reference's exact (quirky, one-sided) classification test, and the
normal-sign canonicalization rules. The polygon-area gate uses a PCA moment
estimator (area ~ 12*sqrt(lambda1*lambda2), exact for uniform rectangles)
instead of a convex-hull walk — documented divergence.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from semantic_slam_tpu.core import linalg3


class PlaneSet(NamedTuple):
    centroid: jax.Array  # [P, 3] cam frame
    coeffs: jax.Array  # [P, 4] oriented [nx, ny, nz, d]
    hv_flag: jax.Array  # [P] i32: 0 horizontal, 1 vertical (cpp:204/229)
    num_points: jax.Array  # [P] estimated true inlier count (scaled)
    area: jax.Array  # [P] m^2 (PCA estimate)
    valid: jax.Array  # [P] bool


def classify_and_canonicalize(m: jax.Array, d: jax.Array, h: jax.Array):
    """Reference h/v classification + normal-sign canonicalization
    (plane_segmentation.cpp:195-253), pinned to compiled-reference goldens
    (tests/test_ref_oracle_frontend.py).

    ``m`` [3] plane normal, ``d`` scalar offset, ``h`` [3] the horizontal
    plane's normal rotated into the cam frame. Returns
    (coeffs4 canonicalized, hv flag 0=horizontal/1=vertical, is_h_or_v).
    Quirks reproduced: the per-component test is ONE-SIDED
    (``fabs(m_i)-fabs(h_i) < 0.3``, no absolute value on the difference);
    vertical additionally needs ``dot(h, m) < 0.5``; horizontal planes flip
    sign when ``m[1] > 0`` (cpp:210-220), vertical when ``m[0] > 0``
    (cpp:235-247) — the WHOLE 4-vector flips, offset included."""
    is_horizontal = (
        (jnp.abs(m[0]) - jnp.abs(h[0]) < 0.3)
        & (jnp.abs(m[1]) - jnp.abs(h[1]) < 0.3)
        & (jnp.abs(m[2]) - jnp.abs(h[2]) < 0.3)
    )
    dot_hm = jnp.sum(h * m)
    is_vertical = jnp.logical_not(is_horizontal) & (dot_hm < 0.5)
    hv = jnp.where(is_horizontal, 0, 1).astype(jnp.int32)

    coeffs = jnp.concatenate([m, jnp.reshape(d, (1,))])
    flip_h = is_horizontal & (m[1] > 0)
    flip_v = is_vertical & (m[0] > 0)
    coeffs = jnp.where(flip_h | flip_v, -coeffs, coeffs)
    return coeffs, hv, is_horizontal | is_vertical


def _masked_pca(pts: jax.Array, w: jax.Array):
    """Weighted centroid + covariance over [N,3] with weights [N]."""
    n = jnp.maximum(jnp.sum(w), 1e-6)
    c = jnp.sum(pts * w[:, None], axis=0) / n
    d = (pts - c) * w[:, None]
    C = (d.T @ (pts - c)) / n
    return c, C, n


@partial(
    jax.jit,
    static_argnames=("max_planes", "num_hypotheses"),
)
def extract_planes(
    pts: jax.Array,  # [N, 3]
    nrm: jax.Array,  # [N, 3]
    cand0: jax.Array,  # [N] bool: valid point AND valid normal AND in-bbox
    horiz_normal_cam: jax.Array,  # [3] gravity normal in cam frame
    count_scale: jax.Array,  # scalar: bbox_pixels / N  (sampling correction)
    min_inliers: jax.Array,  # num_point_seg
    min_area: jax.Array,  # planar_area
    distance_thres: jax.Array,  # 0.02 m
    cos_angular_thres: jax.Array,  # cos(2 deg)
    max_planes: int = 4,
    num_hypotheses: int = 128,
) -> PlaneSet:
    N = pts.shape[0]
    dtype = pts.dtype
    S = num_hypotheses
    hyp_idx = (jnp.arange(S) * N) // S + N // (2 * S)

    import os

    from semantic_slam_tpu.frontend import pallas_kernels as pk

    use_pallas = pk.use_pallas_default() and not os.environ.get(
        "SEMANTIC_SLAM_TPU_NO_PALLAS"
    )

    def round_body(assigned):
        cand = cand0 & jnp.logical_not(assigned)

        h_pts = pts[hyp_idx]  # [S, 3]
        h_nrm = nrm[hyp_idx]
        h_ok = cand[hyp_idx]
        h_d = -jnp.sum(h_nrm * h_pts, axis=-1)  # [S]

        # per-hypothesis inlier counts: fused Pallas kernel on TPU (tiled
        # VMEM matmuls, no [N,S] materialization), jnp fallback elsewhere
        score_fn = pk.score_hypotheses_pallas if use_pallas else pk.score_hypotheses_ref
        counts = score_fn(
            pts, nrm, cand, h_nrm, h_d,
            jnp.asarray(distance_thres, dtype), jnp.asarray(cos_angular_thres, dtype),
        )
        counts = jnp.where(h_ok, counts, -1.0)  # invalid hypotheses lose
        best = jnp.argmax(counts)

        # inlier mask of the winning hypothesis only ([N] ops)
        nb, db = h_nrm[best], h_d[best]
        inl_best = (
            (jnp.abs(pts @ nb + db) < distance_thres)
            & (nrm @ nb > cos_angular_thres)
            & cand
            & h_ok[best]
        )

        # refine best hypothesis by PCA over its inliers
        w = inl_best.astype(dtype)
        c, C, n_in = _masked_pca(pts, w)
        n_ref, evals = linalg3.sym33_smallest_eig(C)
        # orient toward the camera (PCL convention for organized clouds)
        n_ref = jnp.where(jnp.sum(n_ref * c) > 0, -n_ref, n_ref)
        d_ref = -jnp.sum(n_ref * c)

        # re-score with the refined plane
        dist2 = jnp.abs(pts @ n_ref + d_ref)
        align2 = nrm @ n_ref
        inl2 = (dist2 < distance_thres) & (jnp.abs(align2) > cos_angular_thres) & cand
        w2 = inl2.astype(dtype)
        c2, C2, n2 = _masked_pca(pts, w2)
        n_fin, evals2 = linalg3.sym33_smallest_eig(C2)
        n_fin = jnp.where(jnp.sum(n_fin * c2) > 0, -n_fin, n_fin)
        d_fin = -jnp.sum(n_fin * c2)

        true_count = n2 * count_scale
        # in-plane second moments -> area (exact for uniform rectangles)
        area = 12.0 * jnp.sqrt(jnp.maximum(evals2[1] * evals2[2], 0.0))

        coeffs, hv, is_h_or_v = classify_and_canonicalize(
            n_fin, d_fin, horiz_normal_cam
        )

        valid = (
            (true_count >= min_inliers)
            & (area >= min_area)
            & is_h_or_v
            & (counts[best] > 0)
        )

        return c2, coeffs, hv, true_count, area, valid, inl2

    def body(i, carry):
        assigned, out = carry
        c2, coeffs, hv, tc, area, valid, inl2 = round_body(assigned)
        out = PlaneSet(
            centroid=out.centroid.at[i].set(c2),
            coeffs=out.coeffs.at[i].set(coeffs),
            hv_flag=out.hv_flag.at[i].set(hv),
            num_points=out.num_points.at[i].set(tc),
            area=out.area.at[i].set(area),
            valid=out.valid.at[i].set(valid),
        )
        assigned = assigned | inl2
        return assigned, out

    out0 = PlaneSet(
        centroid=jnp.zeros((max_planes, 3), dtype),
        coeffs=jnp.zeros((max_planes, 4), dtype),
        hv_flag=jnp.zeros((max_planes,), jnp.int32),
        num_points=jnp.zeros((max_planes,), dtype),
        area=jnp.zeros((max_planes,), dtype),
        valid=jnp.zeros((max_planes,), bool),
    )
    _, out = jax.lax.fori_loop(0, max_planes, body, (jnp.zeros((N,), bool), out0))
    return out
