"""Regenerate the golden replay trajectory.

Run from the repo root AFTER an intentional behavior change:
    python tests/golden/regen.py
The golden pins the END-TO-END behavioral contract (gating, latest-wins
pairing, frontend, association, solver) on the canonical lab session; any
unintended drift fails tests/test_golden_replay.py.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from semantic_slam_tpu.io import replay as replay_mod
from semantic_slam_tpu.io import synthetic as synth_mod
from semantic_slam_tpu.io import tum as tum_mod
from semantic_slam_tpu.runtime.engine import SlamEngine

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from test_e2e import e2e_config  # noqa: E402


def build():
    log = synth_mod.make_synthetic_log(
        seed=3, n_steps=360, sensor_every=5, drift_noise=0.008, loops=2.0
    )
    eng = SlamEngine(e2e_config())
    replay_mod.replay(log, eng)
    return eng


if __name__ == "__main__":
    eng = build()
    here = os.path.dirname(__file__)
    kf_t = np.array([k.stamp for k in eng.keyframes])
    tum_mod.write_tum(os.path.join(here, "lab_robot_pose.txt"), kf_t, eng.get_keyframe_poses())
    lms = eng.get_mapped_landmarks()
    np.savez(
        os.path.join(here, "lab_landmarks.npz"),
        pose=lms["pose"], class_id=lms["class_id"], plane_type=lms["plane_type"],
    )
    print(f"golden regenerated: {len(kf_t)} keyframes, {len(lms['pose'])} landmarks")
