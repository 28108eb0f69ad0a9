"""Observability utilities: Metrics scopes/counters and the reference's
verbose optimize print (graph_slam.cpp:188-216 transcription)."""

import json

from semantic_slam_tpu.utils.profiling import Metrics, log_optimize


class _Stats:
    def __init__(self, iterations, chi2_initial, chi2_final):
        self.iterations = iterations
        self.chi2_initial = chi2_initial
        self.chi2_final = chi2_final


class TestMetrics:
    def test_scope_accumulates(self):
        m = Metrics()
        with m.scope("solve"):
            pass
        with m.scope("solve"):
            pass
        m.count("keyframes", 3)
        s = m.summary()
        assert s["solve"]["count"] == 2
        assert s["solve"]["total_s"] >= 0.0
        assert s["solve"]["mean_ms"] == 1e3 * s["solve"]["total_s"] / 2
        assert s["keyframes"]["count"] == 3

    def test_scope_records_on_exception(self):
        m = Metrics()
        try:
            with m.scope("boom"):
                raise RuntimeError("x")
        except RuntimeError:
            pass
        assert m.summary()["boom"]["count"] == 1

    def test_dump(self, tmp_path):
        m = Metrics()
        m.count("a")
        p = tmp_path / "metrics.json"
        m.dump(str(p))
        assert json.loads(p.read_text())["a"]["count"] == 1


class TestLogOptimize:
    def test_prints_reference_format(self, capsys):
        log_optimize(True, _Stats(5, 100.0, 1.5), 0.012, 10, 20)
        out = capsys.readouterr().out
        assert "--- pose graph optimization ---" in out
        assert "nodes: 10   edges: 20" in out
        assert "iterations: 5" in out
        assert "(before)100 -> (after)1.5" in out
        assert "time: 0.012[sec]" in out

    def test_silent_when_not_verbose_or_no_iters(self, capsys):
        log_optimize(False, _Stats(5, 1.0, 1.0), 0.0, 1, 1)
        log_optimize(True, _Stats(0, 1.0, 1.0), 0.0, 1, 1)
        assert capsys.readouterr().out == ""
