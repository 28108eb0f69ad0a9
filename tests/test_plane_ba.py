"""Experimental plane-landmark BA tests (the paper's full formulation)."""

import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.core import geometry as geo
from semantic_slam_tpu.solver import plane_ba


def build_plane_graph(rng, n_poses=8, noise=0.03, plane_noise=0.0):
    dtype = jnp.float64
    K, P, E1, E2 = 16, 4, 16, 64

    gt = [geo.pose_identity(dtype)]
    for i in range(n_poses - 1):
        gt.append(geo.pose_retract(gt[-1], jnp.asarray([0.6, 0, 0, 0, 0, 0.15], dtype)))
    gt = jnp.stack(gt)

    planes_gt = jnp.asarray(
        [
            [1.0, 0.0, 0.0, -4.0],
            [0.0, 1.0, 0.0, -2.5],
            [0.0, 0.0, 1.0, -0.0],
        ],
        dtype,
    )
    nP = planes_gt.shape[0]

    ident = np.array([0, 0, 0, 1, 0, 0, 0.0])
    poses = np.tile(ident, (K, 1))
    cur = gt[0]
    poses[0] = np.asarray(cur)
    oi, oj, om = [], [], []
    for i in range(1, n_poses):
        rel = geo.pose_mul(geo.pose_inv(gt[i - 1]), gt[i])
        reln = geo.pose_retract(rel, jnp.asarray(rng.normal(size=6) * noise, dtype))
        cur = geo.pose_mul(cur, reln)
        poses[i] = np.asarray(cur)
        oi.append(i - 1)
        oj.append(i)
        om.append(np.asarray(reln))

    pk, pp, pm = [], [], []
    for k in range(n_poses):
        for p in range(nP):
            z = plane_ba.observe_plane(gt[k], planes_gt[p])
            if plane_noise > 0:
                z = z + jnp.asarray(rng.normal(size=4) * plane_noise, dtype)
            pk.append(k)
            pp.append(p)
            pm.append(np.asarray(z))

    def pad(a, n):
        a = np.asarray(a, np.float64)
        out = np.zeros((n,) + a.shape[1:])
        out[: len(a)] = a
        return out

    # initialize planes from the FIRST (noisy-pose) observation
    init_planes = np.zeros((P, 4))
    init_planes[:, 2] = 1.0
    for p in range(nP):
        z = pm[p]  # pose 0 == identity: sensor frame == world
        init_planes[p] = z

    g = plane_ba.PlaneGraph(
        poses=jnp.asarray(poses, dtype),
        planes=jnp.asarray(init_planes, dtype),
        num_poses=jnp.asarray(n_poses, jnp.int32),
        num_planes=jnp.asarray(nP, jnp.int32),
        odom_i=jnp.asarray(pad(oi, E1), jnp.int32).reshape(E1),
        odom_j=jnp.asarray(pad(oj, E1), jnp.int32).reshape(E1),
        odom_meas=jnp.asarray(
            np.concatenate([np.stack(om), np.tile(ident, (E1 - len(om), 1))]), dtype
        ),
        odom_info=jnp.asarray(np.tile(np.eye(6) * 100.0, (E1, 1, 1)), dtype),
        num_odom=jnp.asarray(len(oi), jnp.int32),
        pe_k=jnp.asarray(pad(pk, E2), jnp.int32).reshape(E2),
        pe_p=jnp.asarray(pad(pp, E2), jnp.int32).reshape(E2),
        pe_meas=jnp.asarray(pad(pm, E2), dtype),
        pe_info=jnp.asarray(np.tile(np.eye(3) * 100.0, (E2, 1, 1)), dtype),
        num_pe=jnp.asarray(len(pk), jnp.int32),
    )
    return g, gt, planes_gt


class TestPlaneRetract:
    def test_keeps_normal_unit(self, rng):
        p = jnp.asarray([0.6, 0.8, 0.0, 1.5], jnp.float64)
        out = plane_ba.plane_retract(p, jnp.asarray(rng.normal(size=3), jnp.float64))
        np.testing.assert_allclose(np.linalg.norm(np.asarray(out[:3])), 1.0, atol=1e-12)

    def test_offset_dof(self):
        p = jnp.asarray([0.0, 0.0, 1.0, 2.0], jnp.float64)
        out = plane_ba.plane_retract(p, jnp.asarray([0.0, 0.0, 0.5], jnp.float64))
        np.testing.assert_allclose(np.asarray(out), [0, 0, 1, 2.5], atol=1e-12)


class TestObservationModel:
    def test_round_trip_consistency(self, rng):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        pose = jnp.asarray(np.concatenate([rng.normal(size=3), q]), jnp.float64)
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        plane = jnp.asarray(np.append(n, 1.3), jnp.float64)
        z = plane_ba.observe_plane(pose, plane)
        from semantic_slam_tpu.graph import residuals as res

        r = res.se3_plane_residual(pose, plane, z)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)


class TestPlaneBA:
    def test_perfect_observations_pull_poses_to_gt(self, rng):
        g, gt, planes_gt = build_plane_graph(rng, noise=0.04)
        n = int(g.num_poses)
        err0 = np.linalg.norm(np.asarray(g.poses[:n, :3] - gt[:, :3]), axis=1).mean()
        out, chi0, chif = plane_ba.plane_bundle_adjust(g)
        assert float(chif) < float(chi0) * 0.1
        err1 = np.linalg.norm(np.asarray(out.poses[:n, :3] - gt[:, :3]), axis=1).mean()
        assert err1 < err0 * 0.7

    def test_planes_recovered(self, rng):
        g, gt, planes_gt = build_plane_graph(rng, noise=0.03)
        out, _, _ = plane_ba.plane_bundle_adjust(g)
        P = planes_gt.shape[0]
        got = np.asarray(out.planes[:P])
        want = np.asarray(planes_gt)
        for p in range(P):
            sign = np.sign(got[p, :3] @ want[p, :3])
            np.testing.assert_allclose(got[p, :3] * sign, want[p, :3], atol=0.05)
            np.testing.assert_allclose(got[p, 3] * sign, want[p, 3], atol=0.15)
