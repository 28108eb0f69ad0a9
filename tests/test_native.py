"""Native (C++) runtime core tests: SLOG round trip, event ordering, and
keyframe-gate parity with the Python implementation."""

import numpy as np
import pytest

from semantic_slam_tpu import native
from semantic_slam_tpu.io import synthetic as synth_mod
from semantic_slam_tpu.runtime.keyframe_gate import KeyframeGate

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


class TestSlog:
    def test_round_trip(self, tmp_path):
        log = synth_mod.make_synthetic_log(seed=2, n_steps=40, sensor_every=8, H=60, W=80)
        p = str(tmp_path / "log.slog")
        native.write_slog(p, log, height=60, width=80, max_det=8)
        r = native.SlogReader(p)
        assert r.n_odom == len(log.odom)
        assert r.n_cloud == len(log.clouds)
        assert r.n_det == len(log.detections)
        assert r.n_gt == len(log.gt)
        t, src, pose, cov = r.odom(3)
        assert t == pytest.approx(log.odom[3].t)
        assert src == log.odom[3].source
        np.testing.assert_allclose(pose, log.odom[3].pose7)
        tc, xyz, valid = r.cloud(0)
        assert tc == pytest.approx(log.clouds[0].t)
        np.testing.assert_allclose(xyz, log.clouds[0].points)
        np.testing.assert_array_equal(valid, log.clouds[0].valid)
        td, boxes, cids, probs = r.detections(0)
        np.testing.assert_allclose(boxes, log.detections[0].boxes, rtol=1e-6)
        np.testing.assert_array_equal(cids, log.detections[0].class_ids)
        tg, pg = r.gt(5)
        np.testing.assert_allclose(pg, log.gt[5].pose7)
        r.close()

    def test_event_order(self, tmp_path):
        log = synth_mod.make_synthetic_log(seed=2, n_steps=30, sensor_every=6, H=60, W=80)
        p = str(tmp_path / "log.slog")
        native.write_slog(p, log, height=60, width=80)
        r = native.SlogReader(p)
        evs = list(r.events())
        assert len(evs) == r.n_odom + r.n_cloud + r.n_det + r.n_gt
        # time-ordered with cloud(0) < det(1) < odom(2) < gt(3) priority
        times = []
        for kind, idx in evs:
            t = [
                r.cloud(idx)[0] if kind == 0 else None,
                r.detections(idx)[0] if kind == 1 else None,
                r.odom(idx)[0] if kind == 2 else None,
                r.gt(idx)[0] if kind == 3 else None,
            ][kind]
            times.append((t, kind))
        assert times == sorted(times)
        r.close()


class TestNativeGate:
    def test_parity_with_python(self):
        rng = np.random.default_rng(7)
        py = KeyframeGate(0.4, 0.3, 1.0)
        cc = native.NativeKeyframeGate(0.4, 0.3, 1.0)
        pose = np.array([0, 0, 0, 1, 0, 0, 0.0])
        t = 0.0
        for _ in range(200):
            step = rng.normal(size=3) * 0.1
            ang = rng.normal() * 0.1
            pose = pose.copy()
            pose[:3] += step
            q = pose[3:] + np.concatenate([[0], rng.normal(size=3) * ang * 0.5])
            pose[3:] = q / np.linalg.norm(q)
            t += float(rng.uniform(0.01, 0.4))
            assert py.update(pose, t) == cc.update(pose, t)
        assert cc.accum_distance == pytest.approx(py.accum_distance, rel=1e-9)
