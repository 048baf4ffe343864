"""Test configuration: force CPU backend with 8 virtual devices.

Must run before the first ``import jax`` anywhere in the test session so that
mesh/sharding tests exercise real multi-device code paths without TPU
hardware (SURVEY.md section 4: multi-host tests on CPU mesh).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's site module pins jax_platforms to the hardware TPU; the
# config update (which beats the env var) forces the CPU backend for tests.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"

# tests that read the mounted reference repo (goldens etc.) skip when absent
requires_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DIR), reason="reference repo not mounted"
)


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(42)


@pytest.fixture(scope="session")
def small_problem(rng):
    """A small random NMF problem (M, K, N odd-sized on purpose)."""
    m, k, n = 96, 12, 130
    x = rng.rand(m, n).astype(np.float32)
    w = rng.rand(m, k).astype(np.float32)
    h = rng.rand(k, n).astype(np.float32)
    return x, w, h
