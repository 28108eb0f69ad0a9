"""Test harness: force an 8-device virtual CPU platform before JAX import.

Multi-chip sharding paths are validated on a virtual CPU mesh per the
project's test strategy (SURVEY.md §4): no TPU pod is available in CI, so
`xla_force_host_platform_device_count=8` stands in for an 8-chip slice.
"""

import os

# NOTE: the container pins JAX_PLATFORMS=axon (TPU tunnel) and the axon
# sitecustomize re-forces it inside register(), so the env var alone is not
# enough — the jax.config update below is the authoritative override. Tests
# run on a virtual multi-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# Each XLA:CPU compile leaves LLVM-JIT code mappings behind; a full-suite run
# accumulates >65530 of them and the kernel's vm.max_map_count limit turns
# the next mmap failure into a hard SIGSEGV inside backend_compile_and_load.
# Dropping the executable cache releases the mappings, so flush it whenever
# the process map table gets close to the limit (costs a few recompiles).
_MAP_GUARD_THRESHOLD = 30_000


@pytest.fixture(autouse=True)
def _jit_map_guard():
    yield
    try:
        with open("/proc/self/maps") as f:
            n = sum(1 for _ in f)
    except OSError:
        return
    if n > _MAP_GUARD_THRESHOLD:
        jax.clear_caches()
