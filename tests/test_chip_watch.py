"""The chip watcher's retry/backoff/lock contract, bash-harness tested.

VERDICT r04 weak #3: the watcher is the round's single point of evidence
capture — a flapping tunnel must never exhaust a fixed attempt budget and
leave the rest of the round unwatched, and a second watcher must never
start alongside (two chip jobs poison each other's timings).  These tests
run the REAL script against a sandbox repo dir (``CHIP_WATCH_REPO``) with
a stub ``python`` on PATH, so they exercise the actual bash, not a model
of it.
"""

import os
import stat
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "benchmarks", "chip_watch.sh")

# stub `python`: the probe (-c ...) reports the chip up; chip_session
# fails twice (tunnel drop mid-queue) then succeeds — the watcher must
# ride through both failures and exit 0 on the third attempt.
_STUB = """#!/bin/bash
case "$*" in
  *chip_session.py*)
    n=$(cat "$STATE" 2>/dev/null || echo 0)
    n=$((n + 1)); echo "$n" > "$STATE"
    [ "$n" -ge 3 ] && exit 0 || exit 1 ;;
  *probe*) exit 0 ;;
  *) exit 0 ;;
esac
"""


def _sandbox(tmp_path):
    repo = tmp_path / "repo"
    (repo / "benchmarks").mkdir(parents=True)
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    stub = bin_dir / "python"
    stub.write_text(_STUB)
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    env = dict(
        os.environ,
        PATH=f"{bin_dir}:{os.environ['PATH']}",
        CHIP_WATCH_REPO=str(repo),
        CHIP_WATCH_SLEEP_BASE="0",
        CHIP_WATCH_MAX_SLEEP="1",
        STATE=str(tmp_path / "attempts"),
    )
    return repo, env


def test_watcher_retries_failed_queues_until_success(tmp_path):
    repo, env = _sandbox(tmp_path)
    out = subprocess.run(
        ["bash", SCRIPT, "7"], env=env, capture_output=True, text=True,
        timeout=60,
    )
    assert out.returncode == 0, out.stderr
    log = (repo / "benchmarks" / "sessions" / "chip_watch_r07.log").read_text()
    # two failed attempts with escalating backoff, then success — and the
    # round number lands in the committable log name, zero-padded
    assert log.count("queue incomplete") == 2
    assert "fail #1" in log and "fail #2" in log
    assert "queue complete; watcher done" in log
    assert (tmp_path / "attempts").read_text().strip() == "3"


def test_second_watcher_refused_while_lock_held(tmp_path):
    repo, env = _sandbox(tmp_path)
    (repo / "benchmarks" / ".chip_watch.lock").touch()
    import fcntl

    with open(repo / "benchmarks" / ".chip_watch.lock", "w") as held:
        fcntl.flock(held, fcntl.LOCK_EX | fcntl.LOCK_NB)
        out = subprocess.run(
            ["bash", SCRIPT, "7"], env=env, capture_output=True, text=True,
            timeout=30,
        )
    assert out.returncode == 2
    assert "refusing to start" in out.stderr


def test_round_arg_required(tmp_path):
    _, env = _sandbox(tmp_path)
    out = subprocess.run(
        ["bash", SCRIPT], env=env, capture_output=True, text=True, timeout=30
    )
    assert out.returncode != 0
    assert "usage" in out.stderr
