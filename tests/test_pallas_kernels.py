"""Pallas kernel correctness (interpret mode on CPU) vs the jnp reference."""

import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.frontend import pallas_kernels as pk


class TestScoreHypotheses:
    def make_inputs(self, rng, N=4096, S=128):
        pts = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
        nrm = rng.normal(size=(N, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        nrm = jnp.asarray(nrm)
        cand = jnp.asarray(rng.random(N) > 0.3)
        hn = rng.normal(size=(S, 3)).astype(np.float32)
        hn /= np.linalg.norm(hn, axis=-1, keepdims=True)
        hd = rng.normal(size=S).astype(np.float32)
        return pts, nrm, cand, jnp.asarray(hn), jnp.asarray(hd)

    def test_matches_reference(self, rng):
        pts, nrm, cand, hn, hd = self.make_inputs(rng)
        dt = jnp.float32(0.5)
        ct = jnp.float32(0.2)
        ref = np.asarray(pk.score_hypotheses_ref(pts, nrm, cand, hn, hd, dt, ct))
        got = np.asarray(
            pk.score_hypotheses_pallas(pts, nrm, cand, hn, hd, dt, ct, interpret=True)
        )
        np.testing.assert_allclose(got, ref, atol=0)

    def test_zero_candidates(self, rng):
        pts, nrm, _, hn, hd = self.make_inputs(rng, N=2048)
        cand = jnp.zeros(2048, bool)
        got = np.asarray(
            pk.score_hypotheses_pallas(
                pts, nrm, cand, hn, hd, jnp.float32(0.5), jnp.float32(0.0), interpret=True
            )
        )
        assert (got == 0).all()
