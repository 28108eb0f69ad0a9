"""Horizontal/vertical classification parity fuzzing.

``reference_classify`` transcribes the decision table of
``plane_segmentation::multiPlaneSegmentation``
(``plane_segmentation.cpp:195-253``): the one-sided horizontal test, the
``dot < 0.5`` vertical test, rejection when neither, and the normal-sign
canonicalization flips. The jitted logic inside ``frontend/planes.py`` must
agree on random (plane-normal, gravity-normal) pairs.
"""

import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.frontend import planes as planes_mod
from semantic_slam_tpu.core import linalg3


def reference_classify(model, h_cam):
    """Transcription of cpp:195-253. Returns (kind, coeffs) with kind in
    {'horizontal','vertical',None}; coeffs sign-canonicalized."""
    m = np.asarray(model, float)
    h = np.asarray(h_cam, float)
    if (
        abs(m[0]) - abs(h[0]) < 0.3
        and abs(m[1]) - abs(h[1]) < 0.3
        and abs(m[2]) - abs(h[2]) < 0.3
    ):
        out = -m if m[1] > 0 else m.copy()
        return "horizontal", out
    dot = float(h[:3] @ m[:3])
    if dot < 0.5:
        out = -m if m[0] > 0 else m.copy()
        return "vertical", out
    return None, m


def ours_classify(model4, h_cam):
    """Evaluate the same expressions planes.py uses (kept in sync by this
    test; extract_planes embeds them in the jitted round body)."""
    m = jnp.asarray(model4[:3])
    h = jnp.asarray(h_cam)
    is_h = (
        (jnp.abs(m[0]) - jnp.abs(h[0]) < 0.3)
        & (jnp.abs(m[1]) - jnp.abs(h[1]) < 0.3)
        & (jnp.abs(m[2]) - jnp.abs(h[2]) < 0.3)
    )
    dot = jnp.sum(h * m)
    is_v = jnp.logical_not(is_h) & (dot < 0.5)
    coeffs = jnp.asarray(model4)
    flip = (is_h & (m[1] > 0)) | (is_v & (m[0] > 0))
    coeffs = jnp.where(flip, -coeffs, coeffs)
    kind = "horizontal" if bool(is_h) else ("vertical" if bool(is_v) else None)
    return kind, np.asarray(coeffs)


class TestClassificationFuzz:
    def test_decision_table_parity(self, rng):
        for _ in range(500):
            m = rng.normal(size=3)
            m /= np.linalg.norm(m)
            d = rng.normal()
            h = rng.normal(size=3)
            h /= np.linalg.norm(h)
            want_kind, want_coeffs = reference_classify(np.append(m, d), h)
            got_kind, got_coeffs = ours_classify(np.append(m, d), h)
            assert got_kind == want_kind, (m, h)
            np.testing.assert_allclose(got_coeffs, want_coeffs, atol=1e-12)

    def test_extractor_uses_same_rules(self, rng):
        """End-to-end: a synthetic plane through the extractor lands in the
        class the transcription predicts."""
        from semantic_slam_tpu.frontend import normals as nrm_mod

        # fronto-parallel wall: cam normal ~ (0,0,-1)
        H, W = 64, 64
        z = np.full((H, W), 2.0)
        u = (np.arange(W) - W / 2) / 100.0
        v = (np.arange(H) - H / 2) / 100.0
        pts = np.stack([np.tile(u, (H, 1)) * 2, np.tile(v[:, None], (1, W)) * 2, z], axis=-1)
        valid = np.ones((H, W), bool)
        n, nv = nrm_mod.compute_normals(jnp.asarray(pts, jnp.float64), jnp.asarray(valid), smoothing_size=8)
        h_cam = np.array([0.0, -1.0, 0.0])  # gravity in cam at level pose
        ps = planes_mod.extract_planes(
            jnp.asarray(pts.reshape(-1, 3), jnp.float64),
            n.reshape(-1, 3),
            (valid.reshape(-1)) & np.asarray(nv.reshape(-1)),
            jnp.asarray(h_cam, jnp.float64),
            jnp.asarray(1.0, jnp.float64),
            jnp.asarray(50.0, jnp.float64),
            jnp.asarray(0.001, jnp.float64),
            jnp.asarray(0.05, jnp.float64),
            jnp.asarray(np.cos(np.deg2rad(8.0)), jnp.float64),
            max_planes=1,
            num_hypotheses=32,
        )
        assert bool(ps.valid[0])
        want_kind, _ = reference_classify(np.asarray(ps.coeffs[0]), h_cam)
        got = "horizontal" if int(ps.hv_flag[0]) == 0 else "vertical"
        assert want_kind == got
