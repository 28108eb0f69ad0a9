"""Wheel build with the native runtime core pre-compiled.

`pip wheel .` / `python -m build` produce a wheel whose
``semantic_slam_tpu/native/libslamlog.so`` is already built, so installed
environments never need a toolchain (the package still falls back to
building from the bundled .cpp on first use if the .so is missing —
semantic_slam_tpu/native/__init__.py).
"""

import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        src = Path(__file__).parent / "semantic_slam_tpu" / "native" / "slamlog.cpp"
        out = src.with_name("libslamlog.so")
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(src), "-o", str(out)],
                check=True,
            )
            print(f"built native extension: {out}")
        except Exception as e:  # toolchain-less build hosts still get a wheel
            print(f"WARNING: native extension not pre-built ({e}); "
                  "it will compile lazily on first use")
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
