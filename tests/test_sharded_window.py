"""Engine-level sharded window step (parallel/sharded.sharded_window_step):
the FULL keyframe pipeline — ingest, data-parallel frontend, sequential
association, edge-sharded PCG solve — under the virtual mesh, pinned against
the single-chip window program."""

import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.parallel import sharded as sh
from semantic_slam_tpu.parallel.window_inputs import make_window_inputs


def test_sharded_window_matches_single_chip():
    n = 4
    B = 4
    mesh = sh.make_mesh(n)
    graph, table, args, statics = make_window_inputs(B, n, jnp.float64)

    g_sh, t_sh, stats_sh = sh.sharded_window_step(
        graph, table, *args, mesh, **statics
    )

    # single-chip reference: the engine's own window program + the
    # single-chip PCG solve over the same inputs
    from semantic_slam_tpu.runtime import engine as eng
    from semantic_slam_tpu.solver import pcg as pcg_mod

    (odoms, row_valid, prev_odom7, has_prev, info6, points, cloud_valid,
     boxes, class_ids, probs, robot_xyzrpy, cam_angle, num_point_seg,
     norm_point_thres, planar_area, distance_thres, cos_angular_thres,
     use_maha, maha_thres, eq_thres, land_noise, use_plane_gate,
     plane_cos_thres, plane_offset_thres, lm_info3) = args
    g1, t1, _ = eng._process_keyframes_window(
        graph, table, odoms, row_valid, jnp.asarray(B - 1, jnp.int32),
        prev_odom7, has_prev, info6, points, cloud_valid,
        jnp.zeros((3, 3), points.dtype), jnp.asarray(1e-3, points.dtype),
        boxes, class_ids, probs, robot_xyzrpy, cam_angle, num_point_seg,
        norm_point_thres, planar_area, distance_thres, cos_angular_thres,
        use_maha, maha_thres, eq_thres, land_noise, use_plane_gate,
        plane_cos_thres, plane_offset_thres, lm_info3,
        samp_h=statics["samp_h"], samp_w=statics["samp_w"],
        max_planes=statics["max_planes"],
        num_hypotheses=statics["num_hypotheses"],
        smoothing_size=statics["smoothing_size"],
        strict_frames=statics["strict_frames"],
        use_rtabmap_offset=statics["use_rtabmap_offset"],
        depth_input=False, adaptive_normals=False,
    )
    g1, stats1 = pcg_mod.lm_optimize_pcg(
        g1, max_iterations=statics["max_iterations"],
        min_edges=statics["min_edges"], rel_tol=statics["rel_tol"],
        max_cg_iters=statics["max_cg_iters"],
    )

    # the pipeline actually mapped something (the synthetic plane is seen)
    assert int(t1.count) > 0
    assert int(t_sh.count) == int(t1.count)
    assert int(g_sh.num_poses) == int(g1.num_poses)
    assert int(g_sh.num_lme) == int(g1.num_lme)
    np.testing.assert_allclose(
        np.asarray(g_sh.poses), np.asarray(g1.poses), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(t_sh.world), np.asarray(t1.world), atol=1e-7
    )
    np.testing.assert_allclose(
        float(stats_sh.chi2_final), float(stats1.chi2_final),
        rtol=1e-6, atol=1e-9,
    )


def test_sharded_window_uneven_rows_masked():
    """Padding rows (row_valid False) must not create poses/landmarks."""
    n = 4
    B = 4
    mesh = sh.make_mesh(n)
    graph, table, args, statics = make_window_inputs(B, n, jnp.float64)
    row_valid = jnp.asarray([True, True, True, False])
    args = (args[0], row_valid) + args[2:]
    g_sh, t_sh, _ = sh.sharded_window_step(graph, table, *args, mesh, **statics)
    assert int(g_sh.num_poses) == 3
