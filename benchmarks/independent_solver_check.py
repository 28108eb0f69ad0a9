"""Independent-optimizer check for the open-trajectory ATE regression.

The KITTI/corridor scenes show full-batch optimization producing a WORSE
trajectory than raw VIO (README accuracy table; VERDICT r1 weak #1). This
script demonstrates the degradation is a property of the PROBLEM the
reference poses — full-batch LM over reference-faithful edge weights on an
open (no-loop-closure) trajectory — and not an artifact of our solver:

  1. run the engine normally (reference per-tick semantics) and extract the
     final graph: exact edges, measurements, information matrices;
  2. re-optimize THE SAME graph with scipy.optimize.least_squares (TRF,
     numerical Jacobians, its own parameterization — zero shared code with
     solver/lm.py) from the reference's initial values (poses at raw VIO
     odometry, graph_slam quirk; landmarks back-projected from their first
     observation);
  3. compare ATE-vs-GT of the scipy solution, our solution, and raw VIO.

If scipy lands at the same (degraded) ATE, any full-batch optimizer —
including the reference's g2o lm_var — redistributes the drift the same
way, because the optimum itself is what disagrees with ground truth.

Usage: python benchmarks/independent_solver_check.py [--steps 360] [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
from scipy.optimize import least_squares  # noqa: E402
from scipy.spatial.transform import Rotation  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.accuracy_sweep import SCENES, sweep_config  # noqa: E402
from semantic_slam_tpu.eval import ate as ate_mod  # noqa: E402
from semantic_slam_tpu.io import replay as replay_mod  # noqa: E402
from semantic_slam_tpu.io import synthetic as synth_mod  # noqa: E402
from semantic_slam_tpu.runtime.engine import SlamEngine  # noqa: E402


# --- independent SE(3) helpers (scipy Rotation, no project geometry code) --


def _pose_to_Rt(pose7):
    # pose7 = [t, q_wxyz]
    q = np.asarray(pose7[3:], float)
    R = Rotation.from_quat([q[1], q[2], q[3], q[0]]).as_matrix()
    return R, np.asarray(pose7[:3], float)


def _se3_log(R, t):
    """log of SE(3): [rho, w] with translation first (matches the residual
    convention r = log(Z^-1 Xi^-1 Xj), graph/residuals.py docstring)."""
    rot = Rotation.from_matrix(R)
    w = rot.as_rotvec()
    th = np.linalg.norm(w)
    if th < 1e-9:
        V_inv = np.eye(3) - 0.5 * _hat(w)
    else:
        k = w / th
        K = _hat(k)
        half = th / 2.0
        cot = 1.0 / np.tan(half)
        V_inv = (
            half * cot * np.eye(3)
            + (1 - half * cot) * np.outer(k, k)
            - half * K
        )
    return np.concatenate([V_inv @ t, w])


def _hat(w):
    return np.array(
        [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]], float
    )


def extract_graph(eng):
    g = eng.graph
    nO = int(g.num_odom)
    nL = int(g.num_lme)
    nP = int(g.num_poses)
    nLm = int(g.num_landmarks)
    return dict(
        n_poses=nP,
        n_lms=nLm,
        odom=(
            np.asarray(g.odom_i[:nO]),
            np.asarray(g.odom_j[:nO]),
            np.asarray(g.odom_meas[:nO], float),
            np.asarray(g.odom_info[:nO], float),
        ),
        lme=(
            np.asarray(g.lme_k[:nL]),
            np.asarray(g.lme_l[:nL]),
            np.asarray(g.lme_meas[:nL], float),
            np.asarray(g.lme_info[:nL], float),
        ),
    )


def scipy_solve(gd, init_poses7, init_lms):
    """Full-batch nonlinear least squares on the extracted graph."""
    nP, nLm = gd["n_poses"], gd["n_lms"]
    oi, oj, om, oinfo = gd["odom"]
    lk, ll, lm_meas, linfo = gd["lme"]

    # parameters: poses 1..nP-1 as [t, rotvec] (pose 0 fixed = gauge),
    # landmarks as xyz
    def pack(poses_Rt, lms):
        v = []
        for R, t in poses_Rt[1:]:
            v.append(t)
            v.append(Rotation.from_matrix(R).as_rotvec())
        v.append(lms.reshape(-1))
        return np.concatenate(v)

    def unpack(x):
        poses = [init_Rt[0]]
        for i in range(nP - 1):
            t = x[i * 6 : i * 6 + 3]
            w = x[i * 6 + 3 : i * 6 + 6]
            poses.append((Rotation.from_rotvec(w).as_matrix(), t))
        lms = x[(nP - 1) * 6 :].reshape(nLm, 3)
        return poses, lms

    init_Rt = [_pose_to_Rt(p) for p in init_poses7]
    meas_Rt = [_pose_to_Rt(m) for m in om]
    W_o = [np.linalg.cholesky(info).T for info in oinfo]
    W_l = [np.linalg.cholesky(info).T for info in linfo]

    def residuals(x):
        poses, lms = unpack(x)
        out = []
        for e in range(len(oi)):
            Ri, ti = poses[oi[e]]
            Rj, tj = poses[oj[e]]
            Rz, tz = meas_Rt[e]
            # E = Z^-1 Xi^-1 Xj
            R_rel = Ri.T @ Rj
            t_rel = Ri.T @ (tj - ti)
            R_e = Rz.T @ R_rel
            t_e = Rz.T @ (t_rel - tz)
            out.append(W_o[e] @ _se3_log(R_e, t_e))
        for e in range(len(lk)):
            Rk, tk = poses[lk[e]]
            r = Rk.T @ (lms[ll[e]] - tk) - lm_meas[e]
            out.append(W_l[e] @ r)
        return np.concatenate(out)

    x0 = pack(init_Rt, init_lms)
    sol = least_squares(residuals, x0, method="trf", max_nfev=400)
    poses, lms = unpack(sol.x)
    pos = np.stack([t for _, t in poses])
    chi2 = float(np.sum(sol.fun**2))
    return pos, lms, chi2, sol.nfev


def run_scene(scene_kw, steps, seed=3):
    log = synth_mod.make_synthetic_log(seed=seed, n_steps=steps, **scene_kw)
    eng = SlamEngine(sweep_config(False, "none"))
    replay_mod.replay(log, eng)

    gt_t = np.array([e.t for e in log.gt])
    gt_xyz = np.stack([e.pose7[:3] for e in log.gt])
    kf_t = np.array([k.stamp for k in eng.keyframes])

    gd = extract_graph(eng)
    assert gd["n_poses"] == len(eng.keyframes)

    # reference initial values: keyframe nodes at RAW VIO odometry
    # (semantic_graph_slam.cpp:121 quirk); landmarks back-projected from
    # their first observation at that initial pose
    init_poses = [np.asarray(k.odom, float) for k in eng.keyframes]
    lk, ll, lm_meas, _ = gd["lme"]
    init_lms = np.zeros((gd["n_lms"], 3))
    seen = set()
    for e in range(len(lk)):
        l = int(ll[e])
        if l in seen:
            continue
        seen.add(l)
        R, t = _pose_to_Rt(init_poses[int(lk[e])])
        init_lms[l] = R @ lm_meas[e] + t

    scipy_pos, _, scipy_chi2, nfev = scipy_solve(gd, init_poses, init_lms)

    ours_xyz = np.asarray(eng.get_keyframe_poses())[:, :3]
    vio_t = np.array([t for t, _ in eng.vio_traj])
    vio_xyz = np.stack([p[:3] for _, p in eng.vio_traj])

    from semantic_slam_tpu.graph.residuals import graph_chi2

    return {
        "keyframes": gd["n_poses"],
        "landmarks": gd["n_lms"],
        "edges": int(len(gd["odom"][0]) + len(lk)),
        "ate_vio": float(ate_mod.ate_rmse(vio_t, vio_xyz, gt_t, gt_xyz, align=False)),
        "ate_ours": float(ate_mod.ate_rmse(kf_t, ours_xyz, gt_t, gt_xyz, align=False)),
        "ate_scipy": float(ate_mod.ate_rmse(kf_t, scipy_pos, gt_t, gt_xyz, align=False)),
        "chi2_ours": float(graph_chi2(eng.graph)),
        "chi2_scipy": scipy_chi2,
        "scipy_nfev": int(nfev),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=360)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--json", action="store_true")
    ap.add_argument(
        "--scenes", nargs="*", default=["kitti", "corridor", "lab"],
    )
    args = ap.parse_args()

    results = {}
    for name in args.scenes:
        r = run_scene(SCENES[name]["gen"], args.steps, args.seed)
        results[name] = r
        print(
            f"[{name:>9s}] vio {r['ate_vio']:.3f} | ours {r['ate_ours']:.3f} | "
            f"scipy {r['ate_scipy']:.3f}   chi2 ours {r['chi2_ours']:.1f} "
            f"scipy {r['chi2_scipy']:.1f}  (kf={r['keyframes']} lm={r['landmarks']})",
            flush=True,
        )

    if args.json:
        print(json.dumps(results, indent=1))

    # the claim under test: an independent optimizer agrees with ours about
    # the optimum — where ours degrades vs VIO, scipy degrades alike
    for name, r in results.items():
        agree = abs(r["ate_scipy"] - r["ate_ours"]) <= 0.15 * max(
            r["ate_ours"], 0.1
        )
        print(f"{name}: independent optimizer agrees with ours: {agree}")


if __name__ == "__main__":
    main()
