"""Real multi-process distributed solve (jax.distributed over local TCP).

Two OS processes x 4 virtual CPU devices = an 8-device global mesh spanning
processes: the same mechanism (minus ICI) a multi-host TPU pod uses for
BASELINE.json config 5.  Validates that solve_sharded's collectives cross
process boundaries and that the replicated convergence scalar agrees.
"""

import os
import socket
import subprocess
import sys

import pytest

# slow: each test launches 2 coordinated subprocesses with fresh compiles
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
proc, port = int(sys.argv[1]), sys.argv[2]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=proc
)
import numpy as np
sys.path.insert(0, "@@REPO@@")
import nmf_tpu as nt
from nmf_tpu.parallel import make_mesh
rng = np.random.RandomState(0)
x = rng.rand(128, 160).astype(np.float32)
w = rng.rand(128, 16).astype(np.float32)
h = rng.rand(16, 160).astype(np.float32)
mesh = make_mesh()
res = nt.solve_sharded(x, w, h, nt.SolveConfig(max_iter=20, check_every=5), mesh=mesh)
# accelerated variant: the block-acceptance predicate is the SAME replicated
# psum scalar as the convergence predicate — every process must take the
# same accept/reject branches and land on identical costs
acc = nt.solve_sharded(
    x, w, h,
    nt.SolveConfig(max_iter=20, check_every=5, accelerate=True),
    mesh=mesh,
)
hist = np.asarray(acc.cost_history)[: int(acc.num_checks)]
mono = bool(np.all(np.diff(hist) <= 1e-6 * np.abs(hist[:-1])))
print(
    f"RESULT proc={proc} global={len(jax.devices())} "
    f"local={len(jax.local_devices())} iters={int(res.iterations)} "
    f"cost={float(res.cost):.6f} acost={float(acc.cost):.6f} amono={mono}"
)
""".replace("@@REPO@@", REPO)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


_CKPT_WORKER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
proc, port, ckdir, max_iter = int(sys.argv[1]), sys.argv[2], sys.argv[3], int(sys.argv[4])
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=proc
)
import numpy as np
sys.path.insert(0, "@@REPO@@")
import nmf_tpu as nt
from nmf_tpu.parallel import make_mesh
from nmf_tpu.utils import checkpoint as ckpt
rng = np.random.RandomState(0)
x = rng.rand(128, 160).astype(np.float32)
w = rng.rand(128, 16).astype(np.float32)
h = rng.rand(16, 160).astype(np.float32)
mesh = make_mesh()
cfg = nt.SolveConfig(max_iter=max_iter, check_every=5)
state = ckpt.solve_with_checkpoints(
    x, w, h, cfg, ckdir, every=10, mesh=mesh, sharded_checkpoints=True
)
print(
    f"RESULT proc={proc} iter={state.iteration} "
    f"nhist={len(state.cost_history)} labels={','.join(map(str, state.check_iterations))} "
    f"cost={float(state.cost_history[-1]):.6f}"
)
""".replace("@@REPO@@", REPO)


def _run_pair(script, args, timeout=240):
    env = {k: v for k, v in os.environ.items() if not k.startswith("XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(i), *args],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process run timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(out)
    results = {}
    for out in outs:
        line = next(l for l in out.splitlines() if l.startswith("RESULT"))
        kv = dict(item.split("=") for item in line.split()[1:])
        results[kv["proc"]] = kv
    return results


def test_two_process_sharded_checkpoint_resume(tmp_path):
    """Pod-safe orbax checkpointing: two processes write a sharded checkpoint
    (meta by process 0 only, after the arrays, behind a barrier), die, and a
    fresh process pair resumes from it to completion."""
    ckdir = str(tmp_path / "ck")
    # phase 1: run to iteration 10, checkpoint, exit (the "kill")
    r1 = _run_pair(_CKPT_WORKER, [str(_free_port()), ckdir, "10"])
    assert r1["0"]["iter"] == r1["1"]["iter"] == "10"
    step = os.path.join(ckdir, "step_00000010")
    assert os.path.exists(os.path.join(step, "meta.json"))
    assert os.path.isdir(step + ".arrays")

    # phase 2: fresh processes resume 10 -> 30
    r2 = _run_pair(_CKPT_WORKER, [str(_free_port()), ckdir, "30"])
    assert r2["0"]["iter"] == r2["1"]["iter"] == "30"
    assert r2["0"]["nhist"] == "6"  # 2 checks per 10-iter segment, 3 segments
    assert r2["0"]["labels"] == "5,10,15,20,25,30"
    assert r2["0"]["cost"] == r2["1"]["cost"]

    # the resumed run matches an uninterrupted single-process solve
    import numpy as np

    import nmf_tpu as nt

    rng = np.random.RandomState(0)
    x = rng.rand(128, 160).astype(np.float32)
    w = rng.rand(128, 16).astype(np.float32)
    h = rng.rand(16, 160).astype(np.float32)
    ref = nt.solve(x, w, h, nt.SolveConfig(max_iter=30, check_every=5))
    assert float(r2["0"]["cost"]) == pytest.approx(float(ref.cost), rel=1e-4)


def test_two_process_distributed_solve(tmp_path):
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items() if not k.startswith("XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i), port],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process solve timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(out)

    results = {}
    for out in outs:
        line = next(l for l in out.splitlines() if l.startswith("RESULT"))
        kv = dict(item.split("=") for item in line.split()[1:])
        results[kv["proc"]] = kv
    assert results["0"]["global"] == results["1"]["global"] == "8"
    assert results["0"]["local"] == results["1"]["local"] == "4"
    assert results["0"]["iters"] == results["1"]["iters"] == "20"
    # the psum-replicated convergence scalar is identical across processes
    assert results["0"]["cost"] == results["1"]["cost"]
    # ...and so is the accelerated solver's (its acceptance predicate is the
    # same replicated scalar; divergent branch decisions would deadlock or
    # split the costs)
    assert results["0"]["acost"] == results["1"]["acost"]
    assert results["0"]["amono"] == results["1"]["amono"] == "True"
