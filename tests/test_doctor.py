"""`nmf_tpu doctor` — the environment diagnostic (utils/doctor.py).

The reference's only diagnostics are abort-on-error macros
(error-check.hpp:8-16); a tunneled accelerator needs a real probe.  The
up-path test runs the genuine subprocess probe against the CPU backend;
the failure paths inject a stub runner (no devices, no waiting)."""

import json
import subprocess

import pytest

from nmf_tpu.cli import build_parser, main
from nmf_tpu.utils import doctor


def test_diagnose_up_on_cpu():
    report = doctor.diagnose(platform="cpu", timeout=300.0)
    assert report["up"] is True
    b = report["backend"]
    assert b["platform"] == "cpu" and b["n_devices"] >= 1
    assert b["matmul_ok"] is True
    assert isinstance(b["host_callbacks"], bool)
    assert b["h2d_gbps"] > 0 and b["d2h_gbps"] > 0
    # honest None peaks for an unknown device kind (CPU)
    assert report["chip_spec"]["bf16_tflops"] is None
    assert report["versions"]["jax"]
    # renders without KeyError and carries the headline
    text = doctor.format_report(report)
    assert "UP" in text and "cpu" in text


def test_diagnose_timeout_is_structured_down():
    def hang(*a, **kw):
        raise subprocess.TimeoutExpired(cmd="x", timeout=kw.get("timeout", 1))

    report = doctor.diagnose(platform="cpu", timeout=0.01, _run=hang)
    assert report["up"] is False
    # the error must teach the enumeration-vs-dispatch distinction — the
    # operationally crucial fact (a listed device is not a usable device)
    assert "enumeration" in report["error"].lower()
    assert "DOWN" in doctor.format_report(report)


def test_diagnose_crash_and_missing_sentinel():
    class R:
        def __init__(self, rc, out="", err=""):
            self.returncode, self.stdout, self.stderr = rc, out, err

    rep = doctor.diagnose(_run=lambda *a, **k: R(1, err="boom"))
    assert rep["up"] is False and "boom" in rep["error"]
    rep = doctor.diagnose(_run=lambda *a, **k: R(0, out="chatter only\n"))
    assert rep["up"] is False and "sentinel" in rep["error"]


def test_diagnose_tpu_kind_gets_peak_row():
    """A v5e device_kind resolves to real peak numbers (ChipSpec table)."""
    class R:
        returncode = 0
        stderr = ""
        stdout = "NMFDOC=" + json.dumps({
            "n_devices": 1, "platform": "axon", "device_kind": "TPU v5 lite",
            "enumerate_s": 1.0, "dispatch_s": 2.0, "matmul_ok": True,
            "host_callbacks": False, "h2d_gbps": 0.03, "d2h_gbps": 0.02,
        })

    rep = doctor.diagnose(_run=lambda *a, **k: R())
    assert rep["up"] is True
    assert rep["chip_spec"]["bf16_tflops"] == pytest.approx(197.0, abs=10)
    text = doctor.format_report(rep)
    assert "REJECTED" in text  # callback-less plugin is called out


def test_cache_stats(tmp_path, monkeypatch):
    (tmp_path / "a").write_bytes(b"x" * 100)
    (tmp_path / "b").write_bytes(b"y" * 50)
    st = doctor._cache_stats(str(tmp_path))
    assert st == {"dir": str(tmp_path), "set": True, "entries": 2, "bytes": 150}
    assert doctor._cache_stats(None)["set"] is False


def test_cli_doctor_json(capsys):
    rc = main(["doctor", "--platform", "cpu", "--timeout", "300", "--json"])
    out = capsys.readouterr().out
    report = json.loads(out.strip().splitlines()[-1])
    assert rc == 0 and report["up"] is True
    assert report["artifact"] == "nmf_tpu-doctor"


def test_cli_doctor_parser_defaults():
    args = build_parser().parse_args(["doctor"])
    assert args.platform is None and args.timeout == 180.0 and not args.json
