"""Channelwise SE3-SE3 chain linearize (solver/chain_soa.py): exact-math
parity with the AoS analytic path (graph/residuals.se3_edge_residual_jac +
the ell_linearize einsum products) it re-expresses."""

import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.core import geometry as geo
from semantic_slam_tpu.graph import residuals as res
from semantic_slam_tpu.solver import chain_soa as ch


def _random_poses(rng, K, dtype=jnp.float64, big_rot=False):
    t = rng.normal(size=(K, 3)) * 2.0
    w = rng.normal(size=(K, 3)) * (1.5 if big_rot else 0.2)
    q = np.asarray(jax.vmap(geo.so3_exp_quat)(jnp.asarray(w, dtype)))
    return jnp.asarray(np.concatenate([t, q], axis=1), dtype)


def _chain_inputs(rng, K, dtype=jnp.float64, big_rot=False):
    poses = _random_poses(rng, K, dtype, big_rot)
    pj = jnp.roll(poses, -1, axis=0)
    meas = _random_poses(rng, K, dtype, big_rot)
    A = rng.normal(size=(K, 6, 6))
    O = jnp.asarray(A @ A.transpose(0, 2, 1) + 3 * np.eye(6), dtype)
    O = O * (rng.random(K) > 0.2)[:, None, None]  # some masked rows
    return poses, pj, meas, O


class TestChainChannelParity:
    def test_residual_matches_aos(self, rng):
        poses, pj, meas, _ = _chain_inputs(rng, 33)
        r_a = jax.vmap(res.se3_edge_residual)(poses, pj, meas)
        rv, rw, _, _ = ch.chain_residual_ch(
            jnp.transpose(poses[:, :3]), jnp.transpose(poses[:, 3:]),
            jnp.transpose(pj[:, :3]), jnp.transpose(pj[:, 3:]),
            jnp.transpose(meas[:, :3]), jnp.transpose(meas[:, 3:]),
        )
        r_c = jnp.transpose(jnp.concatenate([rv, rw], axis=0))
        np.testing.assert_allclose(np.asarray(r_c), np.asarray(r_a), atol=1e-11)

    def test_residual_big_rotations(self, rng):
        """Large rotation increments exercise the non-Taylor branches."""
        poses, pj, meas, _ = _chain_inputs(rng, 17, big_rot=True)
        r_a = jax.vmap(res.se3_edge_residual)(poses, pj, meas)
        rv, rw, _, _ = ch.chain_residual_ch(
            jnp.transpose(poses[:, :3]), jnp.transpose(poses[:, 3:]),
            jnp.transpose(pj[:, :3]), jnp.transpose(pj[:, 3:]),
            jnp.transpose(meas[:, :3]), jnp.transpose(meas[:, 3:]),
        )
        r_c = jnp.transpose(jnp.concatenate([rv, rw], axis=0))
        np.testing.assert_allclose(np.asarray(r_c), np.asarray(r_a), atol=1e-10)

    def test_linearize_matches_aos(self, rng):
        poses, pj, meas, O = _chain_inputs(rng, 29)
        r_o, Ji, Jj = jax.vmap(res.se3_edge_residual_jac)(poses, pj, meas)
        JiT_O = jnp.einsum("kai,kab->kib", Ji, O)
        JjT_O = jnp.einsum("kai,kab->kib", Jj, O)
        H_ii = jnp.einsum("kia,kaj->kij", JiT_O, Ji)
        H_ij = jnp.einsum("kia,kaj->kij", JiT_O, Jj)
        H_jj = jnp.einsum("kia,kaj->kij", JjT_O, Jj)
        g_i = jnp.einsum("kia,ka->ki", JiT_O, r_o)
        g_j = jnp.einsum("kia,ka->ki", JjT_O, r_o)
        chi = jnp.einsum("ka,kab,kb->k", r_o, O, r_o)

        Hii_c, Hij_c, Hjj_c, gi_c, gj_c, chi_c = ch.chain_linearize_ch(
            jnp.transpose(poses[:, :3]), jnp.transpose(poses[:, 3:]),
            jnp.transpose(pj[:, :3]), jnp.transpose(pj[:, 3:]),
            jnp.transpose(meas[:, :3]), jnp.transpose(meas[:, 3:]),
            jnp.transpose(O, (1, 2, 0)),
        )
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(Hii_c, (2, 0, 1))), np.asarray(H_ii),
            atol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(Hij_c, (2, 0, 1))), np.asarray(H_ij),
            atol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(Hjj_c, (2, 0, 1))), np.asarray(H_jj),
            atol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(gi_c)), np.asarray(g_i), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(gj_c)), np.asarray(g_j), atol=1e-9
        )
        np.testing.assert_allclose(np.asarray(chi_c), np.asarray(chi), atol=1e-9)

    def test_chi2_matches_linearize(self, rng):
        poses, pj, meas, O = _chain_inputs(rng, 21)
        args = (
            jnp.transpose(poses[:, :3]), jnp.transpose(poses[:, 3:]),
            jnp.transpose(pj[:, :3]), jnp.transpose(pj[:, 3:]),
            jnp.transpose(meas[:, :3]), jnp.transpose(meas[:, 3:]),
            jnp.transpose(O, (1, 2, 0)),
        )
        *_, chi_lin = ch.chain_linearize_ch(*args)
        chi_only = ch.chain_chi2_ch(*args)
        np.testing.assert_allclose(
            np.asarray(chi_only), np.asarray(chi_lin), rtol=1e-12
        )

    def test_retract_matches_aos(self, rng):
        poses = _random_poses(rng, 25)
        xi = jnp.asarray(rng.normal(size=(25, 6)) * 0.3, jnp.float64)
        p_a = jax.vmap(geo.pose_retract)(poses, xi)
        t_c, q_c = ch.retract_ch(
            jnp.transpose(poses[:, :3]), jnp.transpose(poses[:, 3:]),
            jnp.transpose(xi[:, :3]), jnp.transpose(xi[:, 3:]),
        )
        p_c = jnp.transpose(jnp.concatenate([t_c, q_c], axis=0))
        np.testing.assert_allclose(np.asarray(p_c), np.asarray(p_a), atol=1e-12)

    def test_roll_up_matches_roll(self, rng):
        poses = _random_poses(rng, 13)
        rolled = jnp.roll(poses, -1, axis=0)
        ch_roll = jnp.transpose(ch.roll_up_pose_ch(jnp.transpose(poses)))
        np.testing.assert_array_equal(np.asarray(ch_roll), np.asarray(rolled))
