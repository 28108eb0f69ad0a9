#!/usr/bin/env bash
# CI entry (the reference's travis_build.sh analog, but with real tests:
# the reference CI only checked compile success — SURVEY.md §4).
set -euo pipefail
cd "$(dirname "$0")"

echo "== native build =="
g++ -O3 -shared -fPIC -std=c++17 \
    semantic_slam_tpu/native/slamlog.cpp -o semantic_slam_tpu/native/libslamlog.so

echo "== unit + integration tests (CPU, virtual 8-device mesh) =="
python -m pytest tests/ -q

echo "== accuracy regression sweep =="
python benchmarks/accuracy_sweep.py --steps 360

echo "== compiled-TPU kernel value check =="
# pins the COMPILED Pallas kernels against the XLA path on the real chip
# (tools/tpu_kernel_check.py self-skips when the backend is not TPU);
# one process only — the TPU tunnel serializes a single client
python tools/tpu_kernel_check.py

echo "== wheel =="
pip wheel . --no-deps --no-build-isolation -w dist/ >/dev/null
ls dist/*.whl
echo "CI OK"
