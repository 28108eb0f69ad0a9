"""The open-trajectory ATE regression is the problem's optimum, not ours.

Pins the independent-optimizer evidence (VERDICT r1 task 3): scipy
least_squares — its own parameterization, numerical Jacobians, zero shared
code with solver/lm.py — re-optimizing the identical kitti graph from the
reference's initial values must land at the same optimum our solver finds
(same ATE, same chi2), even though that optimum is WORSE than raw VIO.
Full detail: benchmarks/independent_solver_check.py and the README note.
"""

import numpy as np

from benchmarks.independent_solver_check import run_scene
from benchmarks.accuracy_sweep import SCENES


def test_scipy_agrees_with_ours_on_open_kitti():
    r = run_scene(SCENES["kitti"]["gen"], steps=240, seed=3)
    # the regression exists: full-batch optimum loses to raw VIO here
    assert r["ate_ours"] > r["ate_vio"]
    # and an independent optimizer agrees it IS the optimum
    np.testing.assert_allclose(r["ate_scipy"], r["ate_ours"], rtol=0.05)
    np.testing.assert_allclose(r["chi2_scipy"], r["chi2_ours"], rtol=0.05)
    # relative regression guard (mirrors benchmarks/accuracy_sweep.py)
    assert r["ate_ours"] <= 3.0 * r["ate_vio"]
