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

# Persistent compile cache for the test programs (platform-keyed, so sharing
# the TPU cache dir is safe).  With one CPU core, XLA compiles dominate the
# suite's wall time; caching EVERY program (min_compile_time 0, not the 1 s
# default) makes warm gate runs ~2.5x faster (measured: test_quant 13.8 s
# cold -> 3.9 s warm).  Opt out with NMF_TEST_NO_COMPILE_CACHE=1 (e.g. to
# measure cold-compile behavior).
if not os.environ.get("NMF_TEST_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"
    )
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except (OSError, AttributeError):
        pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"

# tests that read the mounted reference repo (goldens etc.) skip when absent
requires_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DIR), reason="reference repo not mounted"
)


def pytest_collection_modifyitems(config, items):
    """Default gate excludes -m slow; explicit selections override.

    The exclusion is NOT in addopts because that also deselects slow tests
    when their file is named on the command line (``pytest tests/test_fuzz.py``
    would collect nothing and exit 5).  Here the slow tier is skipped only
    for directory-level runs: passing any ``-m`` expression (``-m ""`` = the
    full suite) or naming a slow test's file keeps it.
    """
    inv = [str(a) for a in config.invocation_params.args]
    user_gave_markexpr = any(
        a == "-m" or a.startswith("--markexpr")
        or (a.startswith("-m") and not a.startswith("--"))
        for a in inv
    )
    if user_gave_markexpr:
        return
    import pathlib

    explicit_files = set()
    for a in config.args:
        p = pathlib.Path(str(a).split("::")[0])
        if p.suffix == ".py" and p.exists():
            explicit_files.add(p.resolve())
    deselected = [
        it for it in items
        if it.get_closest_marker("slow")
        and pathlib.Path(str(it.fspath)).resolve() not in explicit_files
    ]
    if deselected:
        drop = {id(it) for it in deselected}
        config.hook.pytest_deselected(items=deselected)
        items[:] = [it for it in items if id(it) not in drop]


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
