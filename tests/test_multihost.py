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
print(
    f"RESULT proc={proc} global={len(jax.devices())} "
    f"local={len(jax.local_devices())} iters={int(res.iterations)} "
    f"cost={float(res.cost):.6f}"
)
""".replace("@@REPO@@", REPO)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


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
