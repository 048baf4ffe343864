"""Basic usage: factorize a matrix, reference-compatible end to end.

    python examples/basic_usage.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import nmf_tpu as nt

# NMF_TPU_EXAMPLE_QUICK=1 shrinks sizes/iterations so the test suite can
# execute this example as a smoke test (tests/test_examples.py) — the code
# paths are identical
QUICK = bool(os.environ.get("NMF_TPU_EXAMPLE_QUICK"))


def main():
    # A random low-rank-ish problem (or read your own .bin files with
    # nt.read_matrix — the format is byte-compatible with the CUDA tools).
    rng = np.random.RandomState(0)
    m, k, n = (256, 16, 200) if QUICK else (2048, 64, 1024)
    iters = 30 if QUICK else 200
    x = rng.rand(m, n).astype(np.float32)

    # Option A: bring your own init (the reference pipeline)
    w0, h0 = rng.rand(m, k).astype(np.float32), rng.rand(k, n).astype(np.float32)
    res = nt.solve(x, w0, h0, nt.SolveConfig(max_iter=iters, thresh=1e-4, check_every=25))
    print(
        f"A: {int(res.iterations)} iterations, converged={bool(res.converged)}, "
        f"KL cost {float(res.cost):.4e}"
    )

    # Option B: the estimator API with NNDSVD init
    model = nt.NMF(n_components=k, init="nndsvda", max_iter=iters, tol=1e-4)
    w = model.fit_transform(x)
    print(f"B: {model.n_iter_} iterations, KL cost {model.reconstruction_err_:.4e}")

    # project new data onto the learned dictionary (H-only solve)
    x_new = rng.rand(m, 100).astype(np.float32)
    h_new = model.transform(x_new)
    print(f"   transform: H_new {h_new.shape}")

    # write results in the reference .bin format
    nt.write_matrix(np.asarray(res.w), "/tmp/Wout.bin")
    nt.write_matrix(np.asarray(res.h), "/tmp/Hout.bin")
    print("   wrote /tmp/Wout.bin /tmp/Hout.bin")


if __name__ == "__main__":
    main()
