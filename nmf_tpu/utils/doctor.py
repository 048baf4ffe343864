"""Environment diagnosis — ``python -m nmf_tpu doctor``.

The reference assumes a healthy local GPU (its only diagnostics are the
abort-on-error CUDA macros, error-check.hpp:8-16).  A tunneled-accelerator
deployment fails in ways a local device never does, and each mode below was
MEASURED on this attachment (docs/ROUND5.md, CLAUDE.md):

* backend init or execute hangs forever (tunnel outage) — so every
  device-touching probe here runs in a BOUNDED SUBPROCESS: a hung init
  dies with the subprocess and this process's jax stays untouched;
* device enumeration answers while dispatch is wedged (measured
  2026-08-19: ``jax.devices()`` in 3-12 s while a trivial matmul queued
  >300 s behind another job) — so "up" is defined as "this process can
  run a program and fetch the result NOW", never "devices are listed";
* the remote compile service degrades from ~20 s to 5+ min per program —
  so the report surfaces whether ``JAX_COMPILATION_CACHE_DIR`` is set and
  how warm the cache is, the single biggest lever on wall time;
* the PJRT plugin rejects host callbacks at execute time — probed inside
  the same bounded subprocess (live metrics fall back to the chunked host
  loop when false, models/solver.py);
* the host<->device link runs at ~0.01-0.05 GB/s and fluctuates 2-3x
  minute to minute — a quick paired H2D/D2H probe gives the number that
  bounds every out-of-core / serving workload.

Everything device-facing happens in the child; the parent only parses the
sentinel JSON line and joins it with host-side facts (versions, cache
stats, the ChipSpec peak table row).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from typing import Optional

__all__ = ["diagnose", "format_report"]

# Runs inside the bounded subprocess.  One sentinel JSON line on success;
# any hang/crash is the parent's to classify.  The matmul check value is
# exact in f32 (3*3*128 = 1152 is representable), so `v == 1152.0` proves a
# real round trip through the device, not a cached zero.
_CHILD = r"""
import json, os, time
if PLAT:
    import jax
    jax.config.update("jax_platforms", PLAT)
import jax, jax.numpy as jnp, numpy as np

t0 = time.time()
devs = jax.devices()
enum_s = time.time() - t0

t0 = time.time()
x = jnp.full((8, 128), 3.0, jnp.float32)
v = float(np.asarray(jax.device_get((x @ x.T)[:1, :1])))
dispatch_s = time.time() - t0

# host-callback support (some PJRT plugins reject send/recv at execute
# time — jit + fetch, same probe shape as models/solver.py)
cb = True
try:
    import jax.debug as jdbg
    def f(a):
        jdbg.callback(lambda _: None, a[0, 0])
        return a + 1
    np.asarray(jax.device_get(jax.jit(f)(x)[:1, :1]))
except Exception:
    cb = False

# paired link probe: one ~8 MiB H2D then D2H, synced by scalar fetch.
# Small on purpose — doctor must stay cheap; per-transfer latency
# dominates tiny transfers on this link anyway, which is itself the fact
# a user needs to know.
mb = 8.0
host = np.ones((1024, 2048), np.float32)  # 8 MiB
# warm the transfer path first (tiny array): the timed probe must measure
# the link, not the one-off first-dispatch stall this platform shows
np.asarray(jax.device_get(jnp.asarray(host[:8, :8])[:1, :1]))
t0 = time.time()
dev = jnp.asarray(host)
np.asarray(jax.device_get(dev[:1, :1]))
h2d_s = time.time() - t0
t0 = time.time()
back = np.asarray(jax.device_get(dev))
d2h_s = time.time() - t0

print("NMFDOC=" + json.dumps({
    "n_devices": len(devs),
    "platform": devs[0].platform,
    "device_kind": getattr(devs[0], "device_kind", ""),
    "enumerate_s": round(enum_s, 3),
    "dispatch_s": round(dispatch_s, 3),
    "matmul_ok": v == 3.0 * 3.0 * 128,
    "host_callbacks": cb,
    "h2d_gbps": round(mb / 1024.0 / max(h2d_s, 1e-9), 4),
    "d2h_gbps": round(mb / 1024.0 / max(d2h_s, 1e-9), 4),
}))
"""


def _cache_stats(path: Optional[str]) -> dict:
    """Entry count / total bytes of the persistent compile cache dir."""
    out = {"dir": path, "set": bool(path)}
    if not path or not os.path.isdir(path):
        out["entries"] = 0
        out["bytes"] = 0
        return out
    n = total = 0
    try:
        for name in os.listdir(path):
            fp = os.path.join(path, name)
            if os.path.isfile(fp):
                n += 1
                total += os.path.getsize(fp)
    except OSError:
        pass
    out["entries"] = n
    out["bytes"] = total
    return out


def diagnose(
    platform: Optional[str] = None,
    timeout: float = 180.0,
    _run=subprocess.run,
) -> dict:
    """Probe the environment and return a structured report.

    ``report["up"]`` is the headline: True iff a bounded subprocess
    initialized the backend, EXECUTED a matmul, and fetched the verified
    result within ``timeout`` seconds.  ``platform=None`` probes the
    default backend chain; pass ``"cpu"`` to check the fallback path.
    ``_run`` is injection for tests (the real probe needs no devices to
    test its down-path).
    """
    import jax  # importing is safe even when execution hangs
    import numpy as np

    report: dict = {
        "artifact": "nmf_tpu-doctor",
        "requested_platform": platform,
        "timeout_s": timeout,
        "versions": {
            "python": sys.version.split()[0],
            "jax": jax.__version__,
            "numpy": np.__version__,
        },
        "compile_cache": _cache_stats(os.environ.get("JAX_COMPILATION_CACHE_DIR")),
    }
    t0 = time.time()
    try:
        # prefix-line injection, not str.format: the child source is full of
        # literal braces (dicts, json.dumps)
        child = f"PLAT = {platform!r}\n" + _CHILD
        proc = _run(
            [sys.executable, "-c", child],
            capture_output=True,
            text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        report["up"] = False
        report["error"] = (
            f"backend init/execute hung >{timeout:.0f}s — tunnel outage, a "
            "busy single-job chip, or a compile service degraded past the "
            "timeout.  Device enumeration succeeding does NOT mean usable: "
            "'up' requires a completed dispatch (docs/ROUND5.md)."
        )
        report["probe_s"] = round(time.time() - t0, 1)
        return report
    report["probe_s"] = round(time.time() - t0, 1)
    if proc.returncode != 0:
        report["up"] = False
        report["error"] = "probe subprocess crashed: " + proc.stderr[-400:]
        return report
    sentinel = [l for l in proc.stdout.splitlines() if l.startswith("NMFDOC=")]
    if not sentinel:
        report["up"] = False
        report["error"] = "probe printed no sentinel: " + proc.stdout[-400:]
        return report
    backend = json.loads(sentinel[-1][len("NMFDOC="):])
    report["backend"] = backend
    report["up"] = bool(backend.get("matmul_ok"))
    # peak table row — pure host-side lookup, honest None for unknown kinds
    from .device import chip_spec_for

    spec = chip_spec_for(backend.get("device_kind", ""))
    report["chip_spec"] = {
        "device_kind": backend.get("device_kind", ""),
        "bf16_tflops": spec.peak_tflops("bfloat16"),
        "f32_tflops": spec.peak_tflops("float32"),
    }
    return report


def format_report(report: dict) -> str:
    """Human-readable rendering of :func:`diagnose`'s dict."""
    lines = []
    up = report.get("up")
    lines.append(f"nmf_tpu doctor — {'UP' if up else 'DOWN'}"
                 f" (probe {report.get('probe_s', '?')}s)")
    v = report["versions"]
    lines.append(f"  versions: python {v['python']}, jax {v['jax']}, "
                 f"numpy {v['numpy']}")
    cc = report["compile_cache"]
    if cc["set"]:
        lines.append(
            f"  compile cache: {cc['dir']} — {cc['entries']} entries, "
            f"{cc['bytes'] / 1e6:.1f} MB"
        )
    else:
        lines.append(
            "  compile cache: JAX_COMPILATION_CACHE_DIR is NOT set — every "
            "process recompiles from scratch (10-60s per program on a "
            "remote compile service; set it)"
        )
    if not up:
        lines.append(f"  error: {report.get('error', 'unknown')}")
        return "\n".join(lines)
    b = report["backend"]
    lines.append(
        f"  backend: {b['platform']} x{b['n_devices']} ({b['device_kind']}) "
        f"— enumerate {b['enumerate_s']}s, first dispatch {b['dispatch_s']}s"
    )
    spec = report["chip_spec"]
    if spec["bf16_tflops"]:
        lines.append(
            f"  peaks: bf16 {spec['bf16_tflops']:.0f} TF/s, "
            f"f32-HIGHEST {spec['f32_tflops']:.0f} TF/s"
        )
    lines.append(
        f"  link: H2D {b['h2d_gbps']} GB/s, D2H {b['d2h_gbps']} GB/s "
        "(single 8 MiB probe; this link fluctuates 2-3x minute to minute)"
    )
    if not b["host_callbacks"]:
        lines.append(
            "  host callbacks: REJECTED by this PJRT plugin — live metrics "
            "use the chunked host loop (automatic)"
        )
    else:
        lines.append("  host callbacks: supported")
    return "\n".join(lines)
