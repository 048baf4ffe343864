"""One-sitting hardware evidence capture (the round-4 certification queue).

Round 3's failure mode was *evidence capture under degraded infrastructure*:
the code was certified on the CPU mesh, but the chip outage left the round
without committed hardware artifacts.  This driver makes the capture itself
unattended and unkillable: probe the backend with a bound, then run the
whole certification queue SEQUENTIALLY (two chip jobs contend and poison
each other's timings — benchmarks/RESULTS.md), each step in its own
subprocess with its own timeout, tolerating per-step failures and logging
everything under ``benchmarks/sessions/<stamp>/``.

Priority order mirrors VERDICT r03 "next round" #2: the headline bench,
the full numerics gate, and the complete CLI e2e (now incl. serving +
selection + quantized-input serving) come first — those are the round's
committed artifacts; the benchmark matrix and tune campaigns (archive
feeders for the ≥3-session retune rules) follow.

Steps that pass write round artifacts at the repo root (``HWPARITY_rNN``,
``E2E_rNN``) ready to commit.  Usage:

    python benchmarks/chip_session.py [--round 4] [--quick]
        [--only step1,step2] [--skip step1,...]

The reference's only test is a device-executed file-in/file-out script
(test_output.sh:5-18); this is that discipline applied to the whole
framework, repeatedly, under a flaky link.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    # ALWAYS prepend the repo root (steps under benchmarks/ import nmf_tpu)
    # and keep the axon plugin importable and the cross-process compile
    # cache warm (CLAUDE.md: cuts repeat compiles from minutes to seconds).
    # On the production host PYTHONPATH already carries /root/.axon_site —
    # an "only if axon missing" guard would skip the REPO prepend exactly
    # there (same logic as e2e_cli._env).
    parts = [p for p in env.get("PYTHONPATH", "").split(":") if p]
    if "/root/.axon_site" not in parts:
        parts.insert(0, "/root/.axon_site")
    env["PYTHONPATH"] = ":".join([REPO] + [p for p in parts if p != REPO])
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    return env


def _write_log(path, text):
    """Best-effort log write: a full disk or vanished log_dir must not
    crash the unattended queue (run_step's contract is 'never raise')."""
    try:
        with open(path, "w") as f:
            f.write(text)
    except OSError as exc:
        print(f"[chip_session] log write failed ({path}): {exc}",
              file=sys.stderr)


def probe(timeout=600.0) -> dict:
    """Bounded backend probe in a subprocess (a hung init dies with it).

    The probe EXECUTES a tiny program and fetches a scalar — device
    enumeration alone is not "up" on this platform.  Measured 2026-08-19:
    ``jax.devices()`` answered in 3-12 s while a trivial matmul queued
    behind another process's long-running chip job (the orphaned e2e of
    session 20260819_042017) for its entire duration.  "Up" must mean
    "this process can run a program NOW": the execute probe folds the
    one-job-at-a-time rule (CLAUDE.md) into the watcher — a busy chip
    reads as down, so the queue never double-books it and poisons both
    jobs' timings.  The timeout must also absorb a degraded compile
    service: the same day, the probe matmul took 76.7 s on a cold cache
    (the subprocess shares ``JAX_COMPILATION_CACHE_DIR`` via ``_env()``,
    so repeats are seconds).  The scalar fetch uses the platform's only
    reliable sync idiom (``np.asarray(jax.device_get(arr[:1, :1]))`` —
    CLAUDE.md: this platform's ``block_until_ready`` does not block).
    """
    t0 = time.time()
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp, numpy as np; "
             "d=jax.devices()[0]; "
             "x=jnp.full((8, 128), 3.0, jnp.float32); "
             "v=float(np.asarray(jax.device_get((x @ x.T)[:1, :1]))); "
             "assert v == 3.0 * 3.0 * 128, v; "
             "print('NMFPROBE=%s|%s' % (d.platform, d.device_kind))"],
            capture_output=True, text=True, timeout=timeout, env=_env(),
        )
    except subprocess.TimeoutExpired:
        return {"up": False, "error": f"backend init/execute hung "
                f">{timeout:.0f}s (tunnel outage, busy chip, or degraded "
                "compile service)"}
    if out.returncode != 0:
        return {"up": False, "error": f"init crashed: {out.stderr[-300:]}"}
    # scan for the sentinel line — jax/plugin init may print informational
    # lines to stdout, which must not make a healthy chip look down (same
    # defense as __graft_entry__'s probe)
    plat, kind = "", ""
    for line in out.stdout.splitlines():
        if line.startswith("NMFPROBE="):
            plat, kind = (line[len("NMFPROBE="):].split("|") + [""])[:2]
            break
    return {"up": plat == "tpu", "platform": plat, "device_kind": kind,
            "probe_seconds": round(time.time() - t0, 1)}


def promote_bench(summary, root, rn, stamp):
    """Write ``BENCH_session_rNN.json`` from the flagship runs so far.

    VERDICT r04 weak #4: the queue measured the flagship three times in
    round 4's design but only HWPARITY/E2E were promoted to the repo root —
    if the tunnel closed again before the driver's end-of-round capture,
    the round would have no committed BENCH-grade perf file despite the
    queue having measured it.  Called after EVERY passing ``bench_flagship*``
    step (median-of-what-exists), so even a one-flagship session strands
    nothing.  Returns the promoted record (or None if no flagship passed).
    """
    runs = [r["json"] for r in summary["steps"]
            if r["step"].startswith("bench_flagship")
            and r["ok"] and isinstance(r.get("json"), dict)
            and "value" in r["json"]]
    if not runs:
        return None
    ordered = sorted(runs, key=lambda j: j["value"])
    median = dict(ordered[(len(ordered) - 1) // 2])  # lower median of evens
    median.update({
        "artifact": "bench_session",
        "round": rn,
        "n_runs": len(runs),
        "values": [j["value"] for j in runs],
        "session_stamp": stamp,
        "session_log": f"benchmarks/sessions/{stamp}",
    })
    with open(os.path.join(root, f"BENCH_session_{rn}.json"), "w") as f:
        json.dump(median, f, indent=2)
    summary[f"BENCH_session_{rn}"] = median["value"]
    return median


def run_step(name, cmd, timeout, log_dir):
    """Run one queue step; capture stdout/stderr; never raise."""
    t0 = time.time()
    rec = {"step": name, "cmd": " ".join(cmd)}
    try:
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout,
            cwd=REPO, env=_env(),
        )
        rec["rc"] = out.returncode
        rec["stdout_tail"] = out.stdout[-2000:]
        _write_log(os.path.join(log_dir, f"{name}.out"), out.stdout)
        _write_log(os.path.join(log_dir, f"{name}.err"), out.stderr)
        # last JSON line of stdout, if any (bench.py prints exactly one)
        for line in reversed(out.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    rec["json"] = json.loads(line)
                except ValueError:
                    pass
                break
    except subprocess.TimeoutExpired as exc:
        rec["rc"] = -1
        rec["error"] = f"timed out after {timeout} s"
        # TimeoutExpired carries whatever the step printed before hanging —
        # exactly the postmortem evidence this driver exists to keep
        for stream, suffix in ((exc.stdout, "out"), (exc.stderr, "err")):
            if stream:
                text = (
                    stream.decode("utf-8", "replace")
                    if isinstance(stream, bytes) else stream
                )
                _write_log(os.path.join(log_dir, f"{name}.{suffix}"), text)
                if suffix == "out":
                    rec["stdout_tail"] = text[-2000:]
    rec["seconds"] = round(time.time() - t0, 1)
    rec["ok"] = rec.get("rc") == 0
    return rec


def build_queue(py, quick, e2e_json):
    """The certification queue: (name, cmd, timeout_s) in priority order.

    Compiles can degrade to 5+ min/program on this platform, hence the
    generous bounds.  Module-level so tests can substitute stub steps.
    """
    q = ["--quick"] if quick else []
    # Scarcest artifact first: tunnel windows keep truncating sessions
    # (both 2026-08-19 sessions died inside the first three steps), so the
    # queue leads with whatever the round still lacks.  Round 5 has a
    # committed flagship BENCH + archive rows but NO passing on-chip E2E
    # (session 20260819_042017's e2e ran to completion as an orphan and
    # FAILED ok=false — the quantized-input stages 7b-7d diverged from
    # their in-program twins, the TPU boundary-code bug ops/quant.py now
    # fixes) and its HWPARITY predates the quant_twins bitwise gate.
    queue = [
        ("e2e", [py, "benchmarks/e2e_cli.py", *q, "--out", e2e_json], 10800),
        ("hwparity", [py, "bench.py", "--check", *q], 7200),
        ("bench_flagship", [py, "bench.py"], 5400),
        ("bench_flagship_2", [py, "bench.py"], 3600),
    ]
    # VERDICT r03 #3: the disputed regression-dims bf16 rule (jnp vs pallas
    # at 4096x350 k=128) needs >= 3 archived sessions per backend; one
    # bench.py invocation = one archive session, interleaved so chip drift
    # cancels across the pair.  These feeders (and the tile-sparse ones
    # below) run BEFORE the long matrix/oocore/serving refreshes: the
    # retune dispute is two rounds old and each feeder is short, while a
    # truncated tunnel window that dies inside the 4h matrix bound would
    # leave the dispute unsettled for a third round.
    for i in (1, 2, 3):
        for backend in ("jnp", "pallas"):
            queue.append((
                f"reg_bf16_{backend}_{i}",
                [py, "bench.py", "--workload", "regression",
                 "--dtype", "bfloat16", "--backend", backend],
                2400,
            ))
    # VERDICT r03 #5: the tile-sparse bf16 k-crossover (k < 384 loses to the
    # scan) — the pre-rename occ labels can't be pooled (benchmarks/RESULTS.md),
    # so capture 3 fresh sessions per k cell under the current labeling,
    # k-interleaved; plus the round-3 session-4 queued campaigns (t256, o1875)
    for rep in ("a", "b", "c"):
        for kk in ("128", "256", "384"):
            queue.append((
                f"tune_bf16_k{kk}_{rep}",
                [py, "benchmarks/tile_sparse_tune.py", "--occ", "0.125",
                 "--k", kk, "--dtype", "bfloat16", "--rounds", "3"],
                5400,
            ))
    queue += [
        ("tune_t256_bf16", [py, "benchmarks/tile_sparse_tune.py",
                            "--occ", "0.25", "--tile", "256",
                            "--dtype", "bfloat16", "--rounds", "3"], 5400),
        ("tune_o1875_k256", [py, "benchmarks/tile_sparse_tune.py",
                             "--occ", "0.1875", "--k", "256",
                             "--dtype", "bfloat16", "--rounds", "3"], 5400),
        # retune provenance snapshot: the pooled per-cell medians this
        # session's rows feed (saved to the session log by run_step)
        ("archive_report", [py, "benchmarks/archive_report.py"], 600),
        # mechanical adjudication of the two disputed rules from the rows
        # this very session just archived (>=3-session policy enforced)
        ("retune_report", [py, "benchmarks/retune.py"], 600),
        # long refresh sweeps LAST (results.json + workload rows already
        # exist from earlier rounds; a fresh capture is strictly
        # nice-to-have next to the artifacts and feeders above)
        ("bench_flagship_3", [py, "bench.py"], 3600),
        ("bench_oocore", [py, "bench.py", "--workload", "oocore"], 3600),
        # VERDICT r03 #8: round-stamped serving-throughput rows (plain f32
        # wire + quantized-input int8 wire — the link-bound paths this
        # environment actually stresses)
        ("bench_serving", [py, "bench.py", "--workload", "serving"], 3600),
        ("bench_serving_int8", [py, "bench.py", "--workload", "serving",
                                "--x-dtype", "int8"], 3600),
        ("bench_converge", [py, "bench.py", "--workload", "converge"], 5400),
        ("matrix", [py, "benchmarks/run_all.py", *q,
                    "--out", "benchmarks/results.json"], 14400),
    ]
    return queue


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--round", type=int, default=4)
    ap.add_argument("--quick", action="store_true",
                    help="shrink the gate/e2e dims (smoke the queue itself)")
    ap.add_argument("--only", default="", help="comma-separated step subset")
    ap.add_argument("--skip", default="", help="comma-separated steps to skip")
    ap.add_argument("--probe-timeout", type=float, default=300.0)
    ap.add_argument("--root", default=REPO,
                    help="where round artifacts + session logs land "
                         "(tests point this at a tmpdir)")
    args = ap.parse_args(argv)

    stamp = time.strftime("%Y%m%d_%H%M%S")
    log_dir = os.path.join(args.root, "benchmarks", "sessions", stamp)
    os.makedirs(log_dir, exist_ok=True)
    summary = {"artifact": "chip_session", "stamp": stamp, "steps": []}

    p = probe(args.probe_timeout)
    summary["probe"] = p
    if not p.get("up"):
        summary["ok"] = False
        print(json.dumps(summary))
        _write_log(os.path.join(log_dir, "summary.json"),
                   json.dumps(summary, indent=2))
        return 1
    print(f"[chip_session] TPU up ({p['device_kind']}); logs -> {log_dir}",
          file=sys.stderr)

    rn = f"r{args.round:02d}"
    e2e_json = os.path.join(log_dir, "e2e.json")
    queue = build_queue(sys.executable, args.quick, e2e_json)
    only = {s for s in args.only.split(",") if s}
    skip = {s for s in args.skip.split(",") if s}
    for name, cmd, tmo in queue:
        if (only and name not in only) or name in skip:
            continue
        print(f"[chip_session] {name}: {' '.join(cmd)}", file=sys.stderr)
        rec = run_step(name, cmd, tmo, log_dir)
        summary["steps"].append(rec)
        print(f"[chip_session] {name}: "
              f"{'ok' if rec['ok'] else 'FAIL'} in {rec['seconds']}s",
              file=sys.stderr)
        # promote round artifacts the moment their step passes (a later
        # hang/kill must not strand evidence already captured)
        if rec["ok"] and name == "hwparity" and "json" in rec:
            dst = os.path.join(args.root, f"HWPARITY_{rn}.json")
            with open(dst, "w") as f:
                json.dump(rec["json"], f, indent=2)
            summary[f"HWPARITY_{rn}"] = rec["json"].get("ok")
        if rec["ok"] and name.startswith("bench_flagship"):
            promote_bench(summary, args.root, rn, stamp)
        if rec["ok"] and name == "e2e" and os.path.exists(e2e_json):
            shutil.copyfile(e2e_json, os.path.join(args.root, f"E2E_{rn}.json"))
            with open(e2e_json) as f:
                summary[f"E2E_{rn}"] = json.load(f).get("ok")
        _write_log(os.path.join(log_dir, "summary.json"),
                   json.dumps(summary, indent=2))

    summary["ok"] = all(r["ok"] for r in summary["steps"]) and bool(
        summary["steps"]
    )
    _write_log(os.path.join(log_dir, "summary.json"),
               json.dumps(summary, indent=2))
    print(json.dumps({k: v for k, v in summary.items() if k != "steps"}))
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
