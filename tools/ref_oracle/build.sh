#!/usr/bin/env bash
# Build + run the reference-code parity oracle, regenerating
# tests/golden/ref_oracle.json from the UNMODIFIED reference headers.
#
# Eigen: the container has no system Eigen; the tensorflow wheel vendors a
# full Eigen header tree, which we use via an `eigen3/` symlink shim (the
# reference includes both "Eigen/Dense" and "eigen3/Eigen/Eigen").
# Flags mirror the reference's catkin Release build (-O2/-O3 -DNDEBUG,
# C++14): NDEBUG matters — several reference quirks (VectorXf::resize(6,6),
# 4-vs-3 vector subtraction) only "work" with Eigen assertions off.
set -euo pipefail

HERE="$(cd "$(dirname "$0")" && pwd)"
REPO="$(cd "$HERE/../.." && pwd)"
REF_INC="/root/reference/include"
TF_INC="$(python3 -c 'import tensorflow, os; print(os.path.join(os.path.dirname(tensorflow.__file__), "include"))' 2>/dev/null || true)"
if [ -z "$TF_INC" ] || [ ! -d "$TF_INC/Eigen" ]; then
  # fallback: locate without importing (importing TF is slow)
  TF_INC="$(python3 -c 'import importlib.util, os; s=importlib.util.find_spec("tensorflow"); print(os.path.join(os.path.dirname(s.origin), "include"))')"
fi
if [ ! -d "$TF_INC/Eigen" ]; then
  echo "ERROR: no Eigen headers found (looked in $TF_INC)" >&2
  exit 2
fi

BUILD="$HERE/build"
mkdir -p "$BUILD/eigenshim"
ln -sfn "$TF_INC" "$BUILD/eigenshim/eigen3"

g++ -std=c++14 -O2 -DNDEBUG \
  -I "$HERE/stubs" \
  -I "$REF_INC" \
  -I "$TF_INC" \
  -I "$BUILD/eigenshim" \
  -o "$BUILD/ref_oracle" "$HERE/oracle_main.cpp"

"$BUILD/ref_oracle" "$REPO/tests/golden/ref_oracle.json"
python3 -c "import json; d=json.load(open('$REPO/tests/golden/ref_oracle.json')); print('golden OK:', sorted(d.keys()))"

# ---- frontend oracle: real point_cloud_segmentation.h +
# plane_segmentation.cpp over stubbed PCL/OpenCV ------------------------------
g++ -std=c++14 -O2 -DNDEBUG \
  -I "$HERE/stubs_frontend" \
  -I "$HERE/stubs" \
  -I "$REF_INC" \
  -I "$TF_INC" \
  -I "$BUILD/eigenshim" \
  -o "$BUILD/ref_oracle_frontend" \
  "$HERE/oracle_frontend.cpp" \
  /root/reference/src/planar_segmentation/plane_segmentation.cpp

"$BUILD/ref_oracle_frontend" "$REPO/tests/golden/ref_oracle_frontend.json"
python3 -c "import json; d=json.load(open('$REPO/tests/golden/ref_oracle_frontend.json')); print('frontend golden OK:', sorted(d.keys()))"
