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
