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


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_rank_sweep_members_equal_solo_solves(trial):
    """Random shapes + random rank lists: every embedded member must equal
    the standalone solve at its true rank (the exact-zero-embedding
    contract), including ragged non-tile-aligned dims."""
    from nmf_tpu import solve_rank_sweep
    from nmf_tpu.models.selection import _member_inits

    rng = np.random.RandomState(2000 + trial)
    m = int(rng.randint(4, 120))
    n = int(rng.randint(4, 150))
    kmax = int(rng.randint(2, min(m, n, 16) + 1))
    ranks = sorted(
        int(r) for r in rng.randint(1, kmax + 1, size=int(rng.randint(2, 5)))
    )
    iters = int(rng.randint(1, 15))
    x = rng.rand(m, n).astype(np.float32)
    cfg = SolveConfig(max_iter=iters, check_every=max(1, iters))
    res = solve_rank_sweep(x, ranks, config=cfg, seed=trial)
    w0s, h0s = _member_inits(x, np.asarray(ranks), "scaled", trial)
    for i, k in enumerate(ranks):
        ref = solve(x, w0s[i, :, :k], h0s[i, :k, :], cfg)
        wi = np.asarray(res.results.w[i])
        np.testing.assert_allclose(
            wi[:, :k], np.asarray(ref.w), rtol=5e-5, atol=1e-7,
            err_msg=f"shape=({m},{n}) ranks={ranks} member={i} iters={iters}",
        )
        assert np.all(wi[:, k:] == 0.0)
        np.testing.assert_allclose(
            res.costs[i], float(ref.cost), rtol=1e-5,
            err_msg=f"shape=({m},{n}) ranks={ranks} member={i}",
        )


@pytest.mark.parametrize("trial", range(4))
def test_fuzz_cross_solver_consistency(trial):
    """The same problem through four independent code paths — in-memory,
    streamed, mesh-sharded, and semi(n_frozen=0) — lands on the same
    factors (block/collective summation-order noise only)."""
    from nmf_tpu import solve_out_of_core, solve_semi
    from nmf_tpu.parallel import solve_sharded
    from nmf_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(3000 + trial)
    # dims divisible by the 4x2 mesh; ragged streaming blocks on purpose
    m = 8 * int(rng.randint(2, 16))
    n = 4 * int(rng.randint(8, 60))
    k = int(rng.randint(2, 12))
    iters = int(rng.randint(2, 12))
    x = rng.rand(m, n).astype(np.float32)
    w = rng.rand(m, k).astype(np.float32)
    h = rng.rand(k, n).astype(np.float32)
    cfg = SolveConfig(max_iter=iters, check_every=max(1, iters))
    ref = solve(x, w, h, cfg)
    outs = {
        "streamed": solve_out_of_core(x, w, h, cfg, block_n=max(4, n // 3)),
        "sharded": solve_sharded(x, w, h, cfg, mesh=make_mesh(shape=(4, 2))),
        "semi0": solve_semi(x, w, h, cfg, n_frozen=0),
    }
    for name, res in outs.items():
        np.testing.assert_allclose(
            np.asarray(res.w), np.asarray(ref.w), rtol=5e-5, atol=1e-7,
            err_msg=f"{name} diverged at ({m},{k},{n}) iters={iters}",
        )
        np.testing.assert_allclose(
            np.asarray(res.h), np.asarray(ref.h), rtol=5e-5, atol=1e-7,
            err_msg=f"{name} diverged at ({m},{k},{n}) iters={iters}",
        )
