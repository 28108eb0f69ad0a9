"""Deterministic replay regression: the canonical lab session must reproduce
the stored golden trajectory and landmark map (CPU float64 — deterministic).

The reference's de-facto validation is replaying a recorded bag and eyeballing
rviz (SURVEY.md §4); this is the automated equivalent: any unintended change
to gating, latest-wins pairing, the frontend, association, or the solver
shifts the trajectory and fails here. Intentional changes regenerate via
``python tests/golden/regen.py`` (diff reviewed like a code change).
"""

import os

import numpy as np

from semantic_slam_tpu.io import tum as tum_mod

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


class TestGoldenReplay:
    def test_trajectory_matches_golden(self):
        import sys

        sys.path.insert(0, GOLDEN)
        from regen import build

        eng = build()
        t_g, p_g = tum_mod.read_tum(os.path.join(GOLDEN, "lab_robot_pose.txt"))
        kf_t = np.array([k.stamp for k in eng.keyframes])
        poses = eng.get_keyframe_poses()
        assert len(kf_t) == len(t_g)
        np.testing.assert_allclose(kf_t, t_g, atol=1e-9)
        # TUM text carries ~17 significant digits; solver is deterministic on
        # CPU f64, so this is effectively byte-level
        np.testing.assert_allclose(poses, p_g, rtol=0, atol=1e-9)

        z = np.load(os.path.join(GOLDEN, "lab_landmarks.npz"))
        lms = eng.get_mapped_landmarks()
        assert len(lms["pose"]) == len(z["pose"])
        np.testing.assert_allclose(lms["pose"], z["pose"], atol=1e-9)
        np.testing.assert_array_equal(lms["class_id"], z["class_id"])
        np.testing.assert_array_equal(lms["plane_type"], z["plane_type"])
