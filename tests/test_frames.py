"""Frame-chain parity tests: numpy double-precision oracles transcribed from
the reference formulas (tools.h / ros_utils.hpp) vs our jnp implementations."""

import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.core import frames, geometry as geo


def ref_t_robot_world(rpy, strict=True):
    """Oracle: tools.h:76-92 verbatim (incl. the (0,2) typo when strict)."""
    r, p, y = rpy
    T = np.zeros((4, 4))
    T[0, 0] = np.cos(y) * np.cos(p)
    T[0, 1] = np.cos(y) * np.sin(p) * np.sin(r) - np.sin(y) * np.cos(r)
    if strict:
        T[0, 2] = np.cos(y) * np.sin(p) * np.cos(r) + np.sin(y) * np.sin(p)
    else:
        T[0, 2] = np.cos(y) * np.sin(p) * np.cos(r) + np.sin(y) * np.sin(r)
    T[1, 0] = np.sin(y) * np.cos(p)
    T[1, 1] = np.sin(y) * np.sin(p) * np.sin(r) + np.cos(y) * np.cos(r)
    T[1, 2] = np.sin(y) * np.sin(p) * np.cos(r) - np.cos(y) * np.sin(r)
    T[2, 0] = -np.sin(p)
    T[2, 1] = np.cos(p) * np.sin(r)
    T[2, 2] = np.cos(p) * np.cos(r)
    T[3, 3] = 1
    return T


def ref_rot_x(a):
    T = np.zeros((4, 4))
    T[0, 0] = 1
    T[1, 1] = np.cos(a)
    T[1, 2] = -np.sin(a)
    T[2, 1] = np.sin(a)
    T[2, 2] = np.cos(a)
    T[3, 3] = 1
    return T


def ref_rot_z(a):
    T = np.zeros((4, 4))
    T[0, 0] = np.cos(a)
    T[0, 1] = -np.sin(a)
    T[1, 0] = np.sin(a)
    T[1, 1] = np.cos(a)
    T[2, 2] = 1
    T[3, 3] = 1
    return T


def ref_cam_world(xyzrpy, pitch, strict=True):
    """Oracle: semantic_tools::transformNormalsToWorld chain (tools.h:18-102)."""
    Trw = ref_t_robot_world(xyzrpy[3:6], strict)
    return Trw @ ref_rot_z(-1.5708) @ ref_rot_x(-1.5708) @ ref_rot_x(-pitch)


class TestCamWorldChain:
    def test_matches_reference_formula(self, rng):
        for _ in range(20):
            xyzrpy = rng.uniform(-1, 1, size=6)
            pitch = rng.uniform(0, 0.8)
            got = np.asarray(frames.t_cam_world(jnp.asarray(xyzrpy), pitch))
            np.testing.assert_allclose(got, ref_cam_world(xyzrpy, pitch), atol=1e-6)

    def test_strict_flag_differs_only_in_02(self, rng):
        xyzrpy = rng.uniform(-1, 1, size=6)
        a = np.asarray(frames.t_robot_world_reference(jnp.asarray(xyzrpy[3:6]), strict=True))
        b = np.asarray(frames.t_robot_world_reference(jnp.asarray(xyzrpy[3:6]), strict=False))
        diff = np.abs(a - b) > 1e-12
        assert diff[0, 2] or np.allclose(a, b)
        diff[0, 2] = False
        assert not diff.any()

    def test_identity_pose_chain(self):
        # At rpy=0, cam->world = Rz(-90)Rx(-90)Rx(-pitch): cam z-fwd maps to world x-fwd
        T = np.asarray(frames.t_cam_world(jnp.zeros(6), 0.0))
        z_cam = np.array([0, 0, 1, 0.0])
        np.testing.assert_allclose(T @ z_cam, [1, 0, 0, 0], atol=1e-4)
        # cam x (right) -> world -y; cam y (down) -> world -z
        np.testing.assert_allclose(T @ np.array([1, 0, 0, 0.0]), [0, -1, 0, 0], atol=1e-4)
        np.testing.assert_allclose(T @ np.array([0, 1, 0, 0.0]), [0, 0, -1, 0], atol=1e-4)

    def test_convert_pose_to_world_adds_translation_after(self, rng):
        xyzrpy = rng.uniform(-1, 1, size=6)
        pitch = 0.3
        p_cam = rng.uniform(-1, 1, size=3)
        got = np.asarray(
            frames.convert_pose_to_world(jnp.asarray(xyzrpy), pitch, jnp.asarray(p_cam))
        )
        T = ref_cam_world(xyzrpy, pitch)
        want = (T @ np.append(p_cam, 1.0))[:3] + xyzrpy[:3]
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_normal_to_world_keeps_d(self, rng):
        xyzrpy = rng.uniform(-1, 1, size=6)
        n4 = rng.uniform(-1, 1, size=4)
        got = np.asarray(frames.convert_normal_to_world(jnp.asarray(xyzrpy), 0.2, jnp.asarray(n4)))
        want = ref_cam_world(xyzrpy, 0.2) @ n4
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_horizontal_normal_in_cam(self, rng):
        xyzrpy = rng.uniform(-1, 1, size=6)
        got = np.asarray(frames.horizontal_plane_normal_in_cam(jnp.asarray(xyzrpy), 0.1))
        want = ref_cam_world(xyzrpy, 0.1).T @ np.array([0, 0, 1, 0.0])
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestIngestionFixups:
    def test_ned_to_enu_translation(self):
        # Rx(-3.14) ~ flip y,z (up to the 3.14-vs-pi error the reference bakes in)
        p = jnp.array([1.0, 2.0, 3.0, 1.0, 0.0, 0.0, 0.0])
        out = np.asarray(frames.pose_ned_to_enu(p))
        np.testing.assert_allclose(out[:3], [1.0, -2.0, -3.0], atol=0.02)

    def test_cam_to_robot_odom_translation(self):
        # Rz(-90)Rx(-90): cam (x,y,z) -> robot (z, -x... ) check: M = Rz@Rx
        p = jnp.array([1.0, 2.0, 3.0, 1.0, 0.0, 0.0, 0.0])
        out = np.asarray(frames.pose_cam_to_robot_odom(p))
        a = -1.5708
        rot_x = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])
        rot_z = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])
        want = rot_z @ rot_x @ np.array([1.0, 2.0, 3.0])
        np.testing.assert_allclose(out[:3], want, atol=1e-6)

    def test_rot_pose_z_rebases_yaw(self):
        q = geo.rpy_to_quat(jnp.array([0.0, 0.0, 0.7]))
        p = geo.pose_make(jnp.array([1.0, 0.0, 0.0]), q)
        out = frames.rot_pose_z(p, 0.2)
        rpy = np.asarray(geo.quat_to_rpy(out[3:]))
        # The reference rotates the Euler-angle VECTOR by Rz(1.57): the z
        # (yaw) component is unchanged by a z-rotation, so the output yaw is
        # simply the rebased yaw 0.7-0.2 (roll/pitch being zero).
        np.testing.assert_allclose(rpy[2], 0.5, atol=1e-6)
        # translation rotated by Rz(1.57)
        np.testing.assert_allclose(out[:3], [np.cos(1.57), np.sin(1.57), 0.0], atol=1e-6)

    def test_rebase_to_origin(self):
        p = jnp.array([5.0, 6.0, 7.0, 1.0, 0.0, 0.0, 0.0])
        out = np.asarray(frames.rebase_to_origin(p, jnp.array([5.0, 6.0, 7.0])))
        np.testing.assert_allclose(out[:3], 0.0, atol=1e-12)
