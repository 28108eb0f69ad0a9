import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from semantic_slam_tpu.core import geometry as geo


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return q


def to_scipy(q_wxyz):
    # scipy uses xyzw
    return Rotation.from_quat(np.roll(np.asarray(q_wxyz), -1, axis=-1))


class TestQuat:
    def test_mul_matches_scipy(self, rng):
        a, b = random_quats(rng, 64), random_quats(rng, 64)
        got = np.asarray(geo.quat_mul(jnp.asarray(a), jnp.asarray(b)))
        want = (to_scipy(a) * to_scipy(b)).as_quat()  # xyzw
        want = np.roll(want, 1, axis=-1)
        # sign-insensitive comparison
        sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
        np.testing.assert_allclose(got, want * sign, atol=1e-12)

    def test_rotate_matches_rotmat(self, rng):
        q = random_quats(rng, 64)
        v = rng.normal(size=(64, 3))
        got = np.asarray(geo.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
        want = np.einsum("nij,nj->ni", to_scipy(q).as_matrix(), v)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_rotmat_round_trip(self, rng):
        q = random_quats(rng, 128)
        R = geo.quat_to_rotmat(jnp.asarray(q))
        q2 = np.asarray(geo.rotmat_to_quat(R))
        sign = np.sign(np.sum(q * q2, axis=-1, keepdims=True))
        np.testing.assert_allclose(q2 * sign, q, atol=1e-9)

    def test_rotmat_matches_scipy(self, rng):
        q = random_quats(rng, 64)
        got = np.asarray(geo.quat_to_rotmat(jnp.asarray(q)))
        np.testing.assert_allclose(got, to_scipy(q).as_matrix(), atol=1e-12)


class TestExpLog:
    def test_so3_round_trip(self, rng):
        # keep |w| < pi: log returns the shortest-arc rotation vector
        w = rng.normal(size=(128, 3))
        w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0, 3.0, size=(128, 1))
        q = geo.so3_exp_quat(jnp.asarray(w))
        w2 = np.asarray(geo.quat_log(q))
        np.testing.assert_allclose(w2, w, atol=1e-9)

    def test_so3_exp_matches_scipy(self, rng):
        w = rng.normal(size=(64, 3)) * 2.0
        got = np.asarray(geo.quat_to_rotmat(geo.so3_exp_quat(jnp.asarray(w))))
        want = Rotation.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-10)

    def test_so3_small_angle(self):
        w = jnp.array([[1e-10, -1e-11, 1e-10], [0.0, 0.0, 0.0]])
        q = geo.so3_exp_quat(w)
        assert np.all(np.isfinite(np.asarray(q)))
        np.testing.assert_allclose(np.asarray(geo.quat_log(q)), np.asarray(w), atol=1e-15)

    def test_se3_round_trip(self, rng):
        xi = rng.normal(size=(128, 6))
        w = xi[:, 3:]
        xi[:, 3:] = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0, 3.0, size=(128, 1))
        p = geo.se3_exp(jnp.asarray(xi))
        xi2 = np.asarray(geo.se3_log(p))
        np.testing.assert_allclose(xi2, xi, atol=1e-8)

    def test_se3_exp_zero(self):
        p = geo.se3_exp(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(p), [0, 0, 0, 1, 0, 0, 0], atol=1e-15)


class TestPose:
    def test_mul_inv(self, rng):
        a = geo.pose_make(jnp.asarray(rng.normal(size=(32, 3))), jnp.asarray(random_quats(rng, 32)))
        ident = geo.pose_mul(a, geo.pose_inv(a))
        np.testing.assert_allclose(np.asarray(geo.pose_t(ident)), 0, atol=1e-12)
        np.testing.assert_allclose(np.abs(np.asarray(geo.pose_q(ident))[:, 0]), 1, atol=1e-12)

    def test_apply_matches_mat44(self, rng):
        p = geo.pose_make(jnp.asarray(rng.normal(size=(16, 3))), jnp.asarray(random_quats(rng, 16)))
        x = rng.normal(size=(16, 3))
        got = np.asarray(geo.pose_apply(p, jnp.asarray(x)))
        T = np.asarray(geo.pose_to_mat44(p))
        xh = np.concatenate([x, np.ones((16, 1))], axis=-1)
        want = np.einsum("nij,nj->ni", T, xh)[:, :3]
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_mat44_round_trip(self, rng):
        p = np.concatenate([rng.normal(size=(16, 3)), random_quats(rng, 16)], axis=-1)
        p2 = np.asarray(geo.mat44_to_pose(geo.pose_to_mat44(jnp.asarray(p))))
        sign = np.sign(np.sum(p[:, 3:] * p2[:, 3:], axis=-1, keepdims=True))
        np.testing.assert_allclose(p2[:, :3], p[:, :3], atol=1e-12)
        np.testing.assert_allclose(p2[:, 3:] * sign, p[:, 3:], atol=1e-9)

    def test_retract_composition(self, rng):
        p = geo.pose_make(jnp.asarray(rng.normal(size=3)), jnp.asarray(random_quats(rng, 1)[0]))
        xi = jnp.asarray(rng.normal(size=6) * 0.1)
        r = geo.pose_retract(p, xi)
        # log(p^-1 r) == xi
        rel = geo.pose_mul(geo.pose_inv(p), r)
        np.testing.assert_allclose(np.asarray(geo.se3_log(rel)), np.asarray(xi), atol=1e-9)


class TestEuler:
    def test_rpy_matches_scipy_zyx(self, rng):
        rpy = rng.uniform(-1.4, 1.4, size=(64, 3))
        got = np.asarray(geo.rpy_to_rotmat(jnp.asarray(rpy)))
        want = Rotation.from_euler("ZYX", rpy[:, ::-1]).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_round_trip(self, rng):
        rpy = rng.uniform(-1.4, 1.4, size=(64, 3))
        rpy2 = np.asarray(geo.rotmat_to_rpy(geo.rpy_to_rotmat(jnp.asarray(rpy))))
        np.testing.assert_allclose(rpy2, rpy, atol=1e-9)

    def test_pose_to_xyzrpy(self, rng):
        rpy = rng.uniform(-1.0, 1.0, size=3)
        t = rng.normal(size=3)
        q = geo.rpy_to_quat(jnp.asarray(rpy))
        v = np.asarray(geo.pose_to_xyzrpy(geo.pose_make(jnp.asarray(t), q)))
        np.testing.assert_allclose(v[:3], t, atol=1e-12)
        np.testing.assert_allclose(v[3:], rpy, atol=1e-9)
