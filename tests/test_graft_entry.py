"""Driver-contract tests: __graft_entry__.entry and dryrun_multichip."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import __graft_entry__ as ge

# slow: dryrun_multichip compiles the whole multi-solver matrix; the outage
# tests subprocess-probe with real timeouts.  The driver exercises these
# entries directly every round; the default gate relies on that.
pytestmark = pytest.mark.slow


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    w, h = jax.block_until_ready(out)
    assert w.shape == (2048, 256) and h.shape == (256, 2048)
    assert np.all(np.isfinite(np.asarray(w)))


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)  # conftest provides 8 CPU devices


def test_dryrun_multichip_nonpow2():
    ge.dryrun_multichip(6)


# --- outage hardening (VERDICT r03 weak #1) -------------------------------
# MULTICHIP_r03 failed rc=124 because _ensure_devices touched the default
# (axon/TPU) backend while the tunnel was down and hung.  These tests
# simulate an unavailable default backend in a SUBPROCESS (env-forced bogus
# platform / zero probe budget) and assert the driver entries still complete.

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_outage_subprocess(code: str, timeout: float = 600.0):
    import subprocess

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "bogus_platform_xyz"  # default backend cannot init
    env["NMF_TPU_BACKEND_PROBE_TIMEOUT"] = "5"
    env.pop("XLA_FLAGS", None)  # no pre-granted CPU devices either
    return subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
        env=env,
    )


def test_entry_survives_backend_outage():
    out = _run_outage_subprocess(
        "import __graft_entry__ as ge\n"
        "fn, args = ge.entry()\n"  # probe fails fast -> CPU forced
        "print('ENTRY_ARGS_OK', args[0].shape)\n"
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ENTRY_ARGS_OK" in out.stdout


def test_ensure_devices_survives_backend_outage():
    out = _run_outage_subprocess(
        "import __graft_entry__ as ge\n"
        "ge._ensure_devices(4)\n"
        "import jax\n"
        "assert len(jax.devices()) >= 4, jax.devices()\n"
        "assert jax.devices()[0].platform == 'cpu'\n"
        "print('ENSURE_OK')\n"
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ENSURE_OK" in out.stdout


def test_dryrun_survives_backend_outage():
    """The full driver dryrun completes with the default backend dead."""
    out = _run_outage_subprocess(
        "import __graft_entry__ as ge\n"
        "ge.dryrun_multichip(4)\n",
        timeout=1200.0,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip OK" in out.stdout
