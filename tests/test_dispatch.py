"""Solver dispatch crossovers (runtime/engine._soa_dispatch /
_mesh_dispatch): the trace-time rules that decide which solver family a
tick runs. These are pure functions of (backend, size, config) — pin the
boundaries so a future edit cannot silently hand a size to the wrong
family (r4's verdict was exactly such a gap: the mesh forfeited the
kernel path at every size)."""

import jax
import pytest

from semantic_slam_tpu.runtime.engine import _mesh_dispatch, _soa_dispatch

ROWS = (1, 1, 8)


class TestSoaDispatch:
    def test_cpu_always_pcg(self):
        # CPU backend (the test env): portable path at every size
        for K in (64, 1024, 4096, 8192):
            assert _soa_dispatch("pcg", None, ROWS, K) == "pcg"

    def test_forced_values(self, monkeypatch):
        monkeypatch.setenv("SLAM_SOLVER_IMPL", "soa")
        assert _soa_dispatch("pcg", None, ROWS, 64) == "soa"
        monkeypatch.setenv("SLAM_SOLVER_IMPL", "tiled")
        assert _soa_dispatch("pcg", None, ROWS, 64) == "tiled"
        monkeypatch.setenv("SLAM_SOLVER_IMPL", "pcg")
        assert _soa_dispatch("pcg", None, ROWS, 4096) == "pcg"

    def test_non_pcg_and_mesh_keep_pcg(self):
        assert _soa_dispatch("dense", None, ROWS, 4096) == "pcg"
        assert _soa_dispatch("pcg", object(), ROWS, 4096) == "pcg"
        assert _soa_dispatch("pcg", None, None, 4096) == "pcg"

    def test_tpu_crossovers(self, monkeypatch):
        # pin the size boundaries independent of the actual backend
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert _soa_dispatch("pcg", None, ROWS, 512) == "pcg"
        assert _soa_dispatch("pcg", None, ROWS, 1024) == "soa"
        assert _soa_dispatch("pcg", None, ROWS, 4096) == "soa"
        assert _soa_dispatch("pcg", None, ROWS, 8192) == "tiled"


class TestMeshDispatch:
    def test_cpu_defaults_to_ell(self):
        assert not _mesh_dispatch(ROWS, "jacobi", 4096, 4)

    def test_forced(self, monkeypatch):
        monkeypatch.setenv("SLAM_SOLVER_IMPL", "soa_dist")
        assert _mesh_dispatch(ROWS, "jacobi", 64, 4)
        # force cannot override structural ineligibility
        assert not _mesh_dispatch(ROWS, "tridiag", 64, 4)
        assert not _mesh_dispatch(ROWS, "jacobi", 66, 4)  # K % n != 0
        assert not _mesh_dispatch(None, "jacobi", 64, 4)
        monkeypatch.setenv("SLAM_SOLVER_IMPL", "ell")
        assert not _mesh_dispatch(ROWS, "jacobi", 4096, 4)

    def test_tpu_crossover_mirrors_single_chip(self, monkeypatch):
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert not _mesh_dispatch(ROWS, "jacobi", 512, 4)
        assert _mesh_dispatch(ROWS, "jacobi", 1024, 4)
        assert _mesh_dispatch(ROWS, "jacobi", 8192, 8)
        assert not _mesh_dispatch(ROWS, "tridiag", 8192, 8)
