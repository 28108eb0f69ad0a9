"""Parity tests: the numpy host-path geometry must match the jnp versions."""

import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.core import frames, geometry as geo, np_geometry as npg


def rand_pose(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return np.concatenate([rng.normal(size=3), q])


class TestParity:
    def test_pose_ops(self, rng):
        for _ in range(20):
            a, b = rand_pose(rng), rand_pose(rng)
            np.testing.assert_allclose(
                npg.pose_mul(a, b),
                np.asarray(geo.pose_mul(jnp.asarray(a), jnp.asarray(b))),
                atol=1e-12,
            )
            np.testing.assert_allclose(
                npg.pose_inv(a), np.asarray(geo.pose_inv(jnp.asarray(a))), atol=1e-12
            )

    def test_retract(self, rng):
        for _ in range(10):
            p = rand_pose(rng)
            xi = rng.normal(size=6)
            got = npg.pose_retract(p, xi)
            want = np.asarray(geo.pose_retract(jnp.asarray(p), jnp.asarray(xi)))
            sign = np.sign(np.dot(got[3:], want[3:]))
            np.testing.assert_allclose(got[:3], want[:3], atol=1e-9)
            np.testing.assert_allclose(got[3:] * sign, want[3:], atol=1e-9)

    def test_euler(self, rng):
        rpy = rng.uniform(-1.4, 1.4, size=(16, 3))
        np.testing.assert_allclose(
            npg.rpy_to_rotmat(rpy), np.asarray(geo.rpy_to_rotmat(jnp.asarray(rpy))), atol=1e-12
        )
        q = npg.rpy_to_quat(rpy)
        want_q = np.asarray(geo.rpy_to_quat(jnp.asarray(rpy)))
        sign = np.sign(np.sum(q * want_q, axis=-1, keepdims=True))
        np.testing.assert_allclose(q * sign, want_q, atol=1e-9)

    def test_pose_to_xyzrpy(self, rng):
        p = rand_pose(rng)
        np.testing.assert_allclose(
            npg.pose_to_xyzrpy(p), np.asarray(geo.pose_to_xyzrpy(jnp.asarray(p))), atol=1e-9
        )

    def test_frame_chains(self, rng):
        for strict in (True, False):
            xyzrpy = rng.uniform(-1, 1, size=6)
            pitch = 0.37
            np.testing.assert_allclose(
                npg.t_cam_world(xyzrpy, pitch, strict),
                np.asarray(frames.t_cam_world(jnp.asarray(xyzrpy), pitch, strict=strict)),
                atol=1e-6,
            )

    def test_fixups(self, rng):
        p = rand_pose(rng)
        for np_fn, jx_fn in [
            (npg.pose_ned_to_enu, frames.pose_ned_to_enu),
            (npg.pose_cam_to_robot_odom, frames.pose_cam_to_robot_odom),
        ]:
            got = np_fn(p)
            want = np.asarray(jx_fn(jnp.asarray(p)))
            sign = np.sign(np.dot(got[3:], want[3:]))
            np.testing.assert_allclose(got[:3], want[:3], atol=1e-6)
            np.testing.assert_allclose(got[3:] * sign, want[3:], atol=1e-6)
        got = npg.rot_pose_z(p, 0.3)
        want = np.asarray(frames.rot_pose_z(jnp.asarray(p), 0.3))
        sign = np.sign(np.dot(got[3:], want[3:]))
        np.testing.assert_allclose(got[:3], want[:3], atol=1e-6)
        np.testing.assert_allclose(got[3:] * sign, want[3:], atol=1e-6)
