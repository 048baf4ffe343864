"""Randomized sweep: solver vs oracle across shapes, seeds, and configs."""

import numpy as np
import pytest

from nmf_tpu import SolveConfig, solve

from oracle import np_solve


@pytest.mark.parametrize("trial", range(12))
def test_fuzz_solver_against_oracle(trial):
    rng = np.random.RandomState(1000 + trial)
    m = int(rng.randint(2, 200))
    k = int(rng.randint(1, min(m, 24) + 1))
    n = int(rng.randint(2, 220))
    iters = int(rng.randint(1, 12))
    scale = float(10.0 ** rng.uniform(-2, 2))
    x = (rng.rand(m, n) * scale).astype(np.float32)
    w = rng.rand(m, k).astype(np.float32)
    h = rng.rand(k, n).astype(np.float32)

    res = solve(x, w, h, SolveConfig(max_iter=iters, check_every=max(1, iters)))
    wn, hn = np_solve(x, w, h, iters)
    assert int(res.iterations) == iters
    np.testing.assert_allclose(
        np.asarray(res.w), wn, rtol=5e-4, atol=1e-6 * scale,
        err_msg=f"shape=({m},{k},{n}) iters={iters} scale={scale:.3g}",
    )
    np.testing.assert_allclose(
        np.asarray(res.h), hn, rtol=5e-4, atol=1e-6 * scale,
        err_msg=f"shape=({m},{k},{n}) iters={iters} scale={scale:.3g}",
    )
