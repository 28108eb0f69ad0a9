"""Synthetic window-tick inputs for the mesh-sharded engine step.

Shared by ``__graft_entry__.dryrun_multichip`` (fifth dryrun line) and
``tests/test_sharded_window.py`` (single-chip parity), so the two always
exercise the same program. Builds B detection-bearing keyframes: each row
carries an organized cam-frame cloud containing a camera-facing plane at
z ~= 2 m inside one whitelisted bounding box — enough for the frontend to
extract a plane and association to map landmarks.
"""

from __future__ import annotations

import numpy as np


def make_window_inputs(B: int, n_devices: int, dtype, H: int = 32, W: int = 32):
    """Returns (graph, table, args, statics) where ``args`` is the
    positional tail of ``parallel.sharded.sharded_window_step`` after
    ``table`` (ending at ``lm_info3``) and ``statics`` its keyword statics.
    Capacities are sized so every edge array divides ``n_devices``."""
    import jax.numpy as jnp

    from semantic_slam_tpu.assoc import association as assoc_mod
    from semantic_slam_tpu.config import CLASS_TO_ID
    from semantic_slam_tpu.graph import state as gs

    def _cap(n: int) -> int:
        # smallest multiple of n_devices >= n
        return ((n + n_devices - 1) // n_devices) * n_devices

    K = max(16, _cap(B + 2))
    graph = gs.make_graph(K, 8, _cap(K), _cap(4 * K), dtype=dtype)
    table = assoc_mod.make_table(8, dtype)

    # keyframes along +x, 0.5 m apart (identity orientation)
    ident = np.array([0, 0, 0, 1, 0, 0, 0], np.float64)
    odoms = np.tile(ident, (B, 1))
    odoms[:, 0] = 0.5 * np.arange(B)
    robot_xyzrpy = np.zeros((B, 6))
    robot_xyzrpy[:, 0] = odoms[:, 0]

    # organized cloud: camera-facing plane at z = 2 (deterministic ripple so
    # normals aren't degenerate-exact); the box covers the center
    u = (np.arange(W) - W / 2) / (W / 2) * 1.5
    v = (np.arange(H) - H / 2) / (H / 2) * 1.5
    xx, yy = np.meshgrid(u, v)
    zz = 2.0 + 0.002 * np.sin(3 * xx) * np.cos(2 * yy)
    cloud = np.stack([xx, yy, zz], axis=-1)
    points = np.tile(cloud[None], (B, 1, 1, 1))
    cloud_valid = np.ones((B, H, W), bool)

    boxes = np.tile(
        np.array([[4.0, 4.0, W - 8.0, H - 8.0]]), (B, 1, 1)
    )  # [B,1,4] tl_x, tl_y, w, h
    class_ids = np.full((B, 1), CLASS_TO_ID["chair"], np.int32)
    probs = np.full((B, 1), 0.9)

    npdt = np.float64 if dtype == jnp.float64 else np.float32
    args = (
        jnp.asarray(odoms, dtype),
        jnp.asarray(np.ones(B, bool)),
        jnp.asarray(ident, dtype),
        jnp.asarray(False),
        jnp.asarray(np.eye(6) * 100.0, dtype),
        jnp.asarray(points, dtype),
        jnp.asarray(cloud_valid),
        jnp.asarray(boxes, dtype),
        jnp.asarray(class_ids),
        jnp.asarray(probs, dtype),
        jnp.asarray(robot_xyzrpy, dtype),
        jnp.asarray(npdt(0.0)),  # cam_angle
        jnp.asarray(np.int32(20)),  # num_point_seg
        jnp.asarray(np.int32(50)),  # norm_point_thres
        jnp.asarray(npdt(0.0)),  # planar_area
        jnp.asarray(npdt(0.05)),  # distance_thres
        jnp.asarray(npdt(np.cos(np.deg2rad(5.0)))),  # cos_angular_thres
        jnp.asarray(False),  # use_maha
        jnp.asarray(npdt(1.5)),  # maha_thres
        jnp.asarray(npdt(1.5)),  # eq_thres
        jnp.asarray(npdt(0.1)),  # land_noise
        jnp.asarray(False),  # use_plane_gate
        jnp.asarray(npdt(0.9)),  # plane_cos_thres
        jnp.asarray(npdt(0.5)),  # plane_offset_thres
        jnp.asarray(np.eye(3) * 10.0, dtype),  # lm_info3
    )
    statics = dict(
        samp_h=24, samp_w=24, max_planes=1, num_hypotheses=16,
        smoothing_size=5, strict_frames=True, use_rtabmap_offset=False,
        max_iterations=4, min_edges=1, rel_tol=1e-6, max_cg_iters=16,
    )
    return graph, table, args, statics
