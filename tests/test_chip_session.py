"""The unattended chip-session driver promotes artifacts step by step.

Round 3 lost its hardware artifacts to infrastructure (VERDICT r03): the
capture pipeline itself must be as tested as the code it certifies.  These
tests run the WHOLE driver loop with stub steps — no chip, no JAX — and
assert the property that matters under a flaky link: every artifact is
promoted the moment its step passes, so a later hang/kill/outage cannot
strand evidence already captured (the discipline of the reference's own
device-executed test, test_output.sh:5-18, applied under failure).
"""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_chip_session():
    spec = importlib.util.spec_from_file_location(
        "chip_session", os.path.join(REPO, "benchmarks", "chip_session.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _bench_stub(value):
    return ("import json; print('warmup line'); print(json.dumps("
            "{'metric': 'mu_iters_per_sec[flagship]', 'value': %r, "
            "'unit': 'iters/s', 'vs_baseline': %r}))" % (value, value / 0.65))


def _stub_queue(py, e2e_json):
    """Stub steps covering pass, JSON-emitting pass, fail, and timeout."""
    hw = ("import json; print(json.dumps("
          "{'artifact': 'hwparity', 'ok': True, 'cells': 7}))")
    e2e = ("import json, sys; json.dump({'ok': True, 'stages': ['run']}, "
           f"open({e2e_json!r}, 'w')); print('e2e done')")
    return [
        ("bench_flagship", [py, "-c", _bench_stub(840.0)], 60),
        ("hwparity", [py, "-c", hw], 60),
        ("e2e", [py, "-c", e2e], 60),
        ("bench_flagship_2", [py, "-c", _bench_stub(860.0)], 60),
        ("failing", [py, "-c", "import sys; sys.exit(3)"], 60),
        ("bench_flagship_3", [py, "-c", _bench_stub(850.0)], 60),
        ("sleepy", [py, "-c", "import time; time.sleep(30)"], 1),
    ]


def test_promotes_artifacts_per_step_and_survives_failures(tmp_path, monkeypatch):
    cs = _load_chip_session()
    monkeypatch.setattr(
        cs, "probe",
        lambda timeout=0: {"up": True, "platform": "tpu", "device_kind": "stub"},
    )
    monkeypatch.setattr(
        cs, "build_queue",
        lambda py, quick, e2e_json: _stub_queue(py, e2e_json),
    )

    rc = cs.main(["--round", "99", "--root", str(tmp_path)])
    assert rc == 1  # failing + sleepy steps fail the session overall...

    # ...but the artifacts captured BEFORE the failures are promoted.
    with open(tmp_path / "HWPARITY_r99.json") as f:
        hw = json.load(f)
    assert hw == {"artifact": "hwparity", "ok": True, "cells": 7}
    with open(tmp_path / "E2E_r99.json") as f:
        assert json.load(f)["ok"] is True

    # VERDICT r04 weak #4: flagship BENCH promotion happens from the queue
    # itself — median-of-3 of the passing flagship runs, updated per step,
    # so a post-capture tunnel drop cannot strand the round's perf number.
    with open(tmp_path / "BENCH_session_r99.json") as f:
        bench = json.load(f)
    assert bench["value"] == 850.0  # median of 840/860/850
    assert bench["n_runs"] == 3
    assert sorted(bench["values"]) == [840.0, 850.0, 860.0]
    assert bench["artifact"] == "bench_session"
    assert bench["round"] == "r99"

    sessions = list((tmp_path / "benchmarks" / "sessions").iterdir())
    assert len(sessions) == 1
    with open(sessions[0] / "summary.json") as f:
        summary = json.load(f)
    assert summary["HWPARITY_r99"] is True
    assert summary["E2E_r99"] is True
    assert summary["BENCH_session_r99"] == 850.0
    assert summary["ok"] is False
    by_name = {s["step"]: s for s in summary["steps"]}
    assert by_name["bench_flagship"]["ok"] is True
    assert by_name["failing"]["rc"] == 3
    assert by_name["sleepy"]["rc"] == -1
    assert "timed out" in by_name["sleepy"]["error"]
    # per-step stdout/stderr logs exist for postmortems
    assert (sessions[0] / "hwparity.out").exists()
    assert (sessions[0] / "failing.err").exists()


def test_promote_bench_requires_a_passing_valued_run(tmp_path):
    """No flagship run with a numeric value -> nothing promoted (a crashed
    bench that still printed a JSON preamble must not become the round's
    headline number)."""
    cs = _load_chip_session()
    summary = {"steps": [
        {"step": "bench_flagship", "ok": True, "json": {"note": "no value"}},
        {"step": "bench_flagship_2", "ok": False, "json": {"value": 9.9}},
        {"step": "hwparity", "ok": True, "json": {"value": 1.0}},
    ]}
    assert cs.promote_bench(summary, str(tmp_path), "r05", "stamp") is None
    assert not (tmp_path / "BENCH_session_r05.json").exists()


def test_probe_down_writes_structured_summary(tmp_path, monkeypatch):
    cs = _load_chip_session()
    monkeypatch.setattr(
        cs, "probe",
        lambda timeout=0: {"up": False, "error": "backend init hung >1s"},
    )
    rc = cs.main(["--root", str(tmp_path)])
    assert rc == 1
    sessions = list((tmp_path / "benchmarks" / "sessions").iterdir())
    with open(sessions[0] / "summary.json") as f:
        summary = json.load(f)
    assert summary["ok"] is False
    assert summary["steps"] == []
    assert "hung" in summary["probe"]["error"]


def test_only_and_skip_filter_the_queue(tmp_path, monkeypatch):
    cs = _load_chip_session()
    monkeypatch.setattr(
        cs, "probe",
        lambda timeout=0: {"up": True, "platform": "tpu", "device_kind": "stub"},
    )
    monkeypatch.setattr(
        cs, "build_queue",
        lambda py, quick, e2e_json: [
            ("a", [py, "-c", "print('a')"], 60),
            ("b", [py, "-c", "print('b')"], 60),
            ("c", [py, "-c", "import sys; sys.exit(1)"], 60),
        ],
    )
    rc = cs.main(["--root", str(tmp_path), "--only", "a,c", "--skip", "c"])
    assert rc == 0  # only 'a' ran, and it passed
    sessions = list((tmp_path / "benchmarks" / "sessions").iterdir())
    with open(sessions[0] / "summary.json") as f:
        summary = json.load(f)
    assert [s["step"] for s in summary["steps"]] == ["a"]


def test_real_queue_commands_parse():
    """Every real queue command's flags exist (a typo here would burn the
    round's only tunnel window).  One --help subprocess per unique script —
    the queue repeats bench.py/tile_sparse_tune.py many times and each
    spawn pays a full interpreter+jax import."""
    cs = _load_chip_session()
    queue = cs.build_queue(sys.executable, True, "/tmp/e2e.json")
    import subprocess

    usage_by_script = {}
    for name, cmd, _tmo in queue:
        script, flags = cmd[1], cmd[2:]
        if script not in usage_by_script:
            out = subprocess.run(
                [sys.executable, os.path.join(REPO, script), "--help"],
                capture_output=True, text=True, timeout=120, cwd=REPO,
            )
            assert out.returncode == 0, (name, out.stderr[-500:])
            usage_by_script[script] = out.stdout
        for flag in flags:
            if flag.startswith("--"):
                assert flag in usage_by_script[script], (name, flag)


def test_env_always_prepends_repo(monkeypatch):
    """The production host sets PYTHONPATH=/root/.axon_site, so an
    "only if axon missing" guard would skip the REPO prepend exactly
    there; _env must put the repo root first in every case."""
    cs = _load_chip_session()

    monkeypatch.setenv("PYTHONPATH", "/root/.axon_site")
    pp = cs._env()["PYTHONPATH"].split(":")
    assert pp[0] == REPO and "/root/.axon_site" in pp

    monkeypatch.delenv("PYTHONPATH", raising=False)
    pp = cs._env()["PYTHONPATH"].split(":")
    assert pp[0] == REPO and "/root/.axon_site" in pp

    # idempotent: REPO already present is not duplicated
    monkeypatch.setenv("PYTHONPATH", f"{REPO}:/root/.axon_site:/x")
    pp = cs._env()["PYTHONPATH"].split(":")
    assert pp.count(REPO) == 1 and pp[-1] == "/x"


def test_write_log_swallows_oserror(tmp_path, capsys):
    """run_step's 'never raise' contract covers its log writes: a vanished
    log_dir / full disk must not abort the remaining queue."""
    cs = _load_chip_session()
    cs._write_log(str(tmp_path / "missing_dir" / "x.out"), "text")
    assert "log write failed" in capsys.readouterr().err


def test_retune_advisor(tmp_path):
    """benchmarks/retune.py decides the two VERDICT-r03 rule disputes
    mechanically: 'insufficient' below the >=3-session policy, 'retune'
    only when the winner beats the rule's pick with the loser outside the
    winner's pooled IQR, 'keep' when the rule already picks the winner."""
    import importlib.util as ilu

    spec = ilu.spec_from_file_location(
        "retune", os.path.join(REPO, "benchmarks", "retune.py")
    )
    rt = ilu.module_from_spec(spec)
    spec.loader.exec_module(rt)

    path = str(tmp_path / "archive.jsonl")
    metric = "mu_iters_per_sec[regression 4096x350 rank 128 bfloat16]"

    def row(backend, reps):
        return json.dumps({
            "metric": metric, "backend": backend,
            "device_kind": "TPU v5 lite", "repeat_iters_per_sec": reps,
        })

    # 2 sessions per side -> insufficient
    with open(path, "w") as f:
        for reps in ([100, 110], [105, 95]):
            f.write(row("jnp", reps) + "\n")
            f.write(row("pallas", [v * 0.7 for v in reps]) + "\n")
    out = rt.decide(metric, "pallas", ("jnp", "pallas"), "TPU v5 lite", path)
    assert out["verdict"] == "insufficient"

    # 3 sessions, jnp clearly faster than the rule's pallas -> retune
    with open(path, "a") as f:
        f.write(row("jnp", [102, 108]) + "\n")
        f.write(row("pallas", [70, 72]) + "\n")
    out = rt.decide(metric, "pallas", ("jnp", "pallas"), "TPU v5 lite", path)
    assert out["verdict"] == "retune" and out["winner"] == "jnp"
    assert out["margin"] > 1.3

    # same data but the rule already picks the winner -> keep
    out = rt.decide(metric, "jnp", ("jnp", "pallas"), "TPU v5 lite", path)
    assert out["verdict"] == "keep"

    # overlapping distributions (loser median inside winner IQR) -> keep
    path2 = str(tmp_path / "a2.jsonl")
    with open(path2, "w") as f:
        for reps in ([100, 110], [105, 95], [98, 112]):
            f.write(row("jnp", reps) + "\n")
            f.write(row("pallas", [v * 0.99 for v in reps]) + "\n")
    out = rt.decide(metric, "pallas", ("jnp", "pallas"), "TPU v5 lite", path2)
    assert out["verdict"] == "keep" and "noise band" in out["why"]
