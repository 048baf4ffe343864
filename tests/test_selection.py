"""Model selection: multi-restart and rank-sweep batched solves."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from nmf_tpu import (
    SolveConfig,
    solve,
    solve_rank_sweep,
    solve_restarts,
)
from nmf_tpu.models.init import scaled_random_init
from nmf_tpu.models.selection import _member_inits


@pytest.fixture(scope="module")
def problem():
    rng = np.random.RandomState(11)
    m, n = 64, 80
    # planted rank-8 structure + noise: restarts/ranks have something to find
    w = rng.rand(m, 8).astype(np.float32)
    h = rng.rand(8, n).astype(np.float32)
    x = (w @ h + 0.01 * rng.rand(m, n)).astype(np.float32)
    return x


CFG = SolveConfig(max_iter=40, thresh=0.0, check_every=10)


def test_restart_members_match_individual_solves(problem):
    x = problem
    res = solve_restarts(x, rank=8, n_restarts=3, config=CFG, seed=5)
    assert res.n_members == 3
    for i in range(3):
        w0, h0 = scaled_random_init(x, 8, seed=5 + i)
        ref = solve(x, w0, h0, CFG)
        w_i, h_i = res.factors(i)
        np.testing.assert_allclose(np.asarray(w_i), np.asarray(ref.w), rtol=2e-6)
        np.testing.assert_allclose(np.asarray(h_i), np.asarray(ref.h), rtol=2e-6)
        np.testing.assert_allclose(res.costs[i], float(ref.cost), rtol=1e-6)


def test_restarts_pick_lowest_cost(problem):
    res = solve_restarts(problem, rank=4, n_restarts=4, config=CFG, init="random")
    assert res.best_index == int(np.argmin(res.costs))
    assert res.best_cost == pytest.approx(float(res.costs.min()))
    w, h = res.best
    assert w.shape == (64, 4) and h.shape == (4, 80)


def test_restarts_explicit_inits(problem):
    rng = np.random.RandomState(0)
    w0s = rng.rand(2, 64, 6).astype(np.float32)
    h0s = rng.rand(2, 6, 80).astype(np.float32)
    res = solve_restarts(problem, w0s=w0s, h0s=h0s, config=CFG)
    ref = solve(problem, w0s[1], h0s[1], CFG)
    np.testing.assert_allclose(res.costs[1], float(ref.cost), rtol=1e-6)


def test_rank_sweep_member_equals_lower_rank_solve(problem):
    x = problem
    ranks = [4, 8, 16]
    res = solve_rank_sweep(x, ranks, config=CFG, seed=3)
    for i, k in enumerate(ranks):
        # the same member seed at the true (uncropped) rank
        w0s, h0s = _member_inits(x, np.asarray(ranks), "scaled", 3)
        ref = solve(x, w0s[i, :, :k], h0s[i, :k, :], CFG)
        w_i, h_i = res.factors(i)
        np.testing.assert_allclose(np.asarray(w_i), np.asarray(ref.w), rtol=2e-6)
        np.testing.assert_allclose(res.costs[i], float(ref.cost), rtol=1e-6)
        # the embedding slots stayed exactly zero
        full_w = np.asarray(res.results.w[i])
        assert np.all(full_w[:, k:] == 0.0)
        assert np.all(np.asarray(res.results.h[i])[k:, :] == 0.0)


def test_rank_sweep_cost_curve_decreases_with_rank(problem):
    # same seed family, more capacity, same iterations -> lower-or-equal cost
    res = solve_rank_sweep(problem, [2, 8, 24], config=CFG, seed=7)
    c = res.costs
    assert c[0] > c[1] > c[2]


def test_rank_sweep_hals_member_equals_lower_rank_solve(problem):
    """HALS rank sweeps are exact: a masked rank's CD gradient is exactly
    zero (both factors' masked slots are zero), so the embedded member IS
    the lower-rank HALS problem (selection.py module docstring)."""
    x = problem
    ranks = [3, 6]
    cfg = SolveConfig(max_iter=12, check_every=12, beta=2.0, algorithm="hals")
    res = solve_rank_sweep(x, ranks, config=cfg, seed=3)
    for i, k in enumerate(ranks):
        w0s, h0s = _member_inits(x, np.asarray(ranks), "scaled", 3)
        ref = solve(x, w0s[i, :, :k], h0s[i, :k, :], cfg)
        w_i, h_i = res.factors(i)
        np.testing.assert_allclose(
            np.asarray(w_i), np.asarray(ref.w), rtol=5e-5, atol=1e-6
        )
        np.testing.assert_allclose(res.costs[i], float(ref.cost), rtol=1e-5)
        # the embedding slots stayed exactly zero through the in-place sweeps
        assert np.all(np.asarray(res.results.w[i])[:, k:] == 0.0)
        assert np.all(np.asarray(res.results.h[i])[k:, :] == 0.0)
    # restarts (no masking) keep working under HALS too
    rr = solve_restarts(problem, rank=4, n_restarts=2, config=cfg)
    assert np.all(np.isfinite(rr.costs))


def test_restarts_with_thresh_stop_per_member(problem):
    cfg = SolveConfig(max_iter=200, thresh=0.15, check_every=10)
    res = solve_restarts(problem, rank=8, n_restarts=3, config=cfg, init="random")
    # each member stops at ITS OWN convergence point: same outcome as a solo
    # run with the same init, member by member
    for i in range(3):
        from nmf_tpu.models.init import random_init

        w0, h0 = random_init(64, 8, 80, seed=0 + i)
        ref = solve(problem, w0, h0, cfg)
        assert int(res.iterations[i]) == int(ref.iterations)
        assert bool(res.converged[i]) == bool(ref.converged)
        np.testing.assert_allclose(res.costs[i], float(ref.cost), rtol=1e-6)
    assert np.any(res.converged)


def test_restarts_on_mesh_match_single_device(problem):
    mesh = Mesh(np.array(jax.devices()[:4]), ("b",))
    cfg = SolveConfig(max_iter=20, check_every=10)
    single = solve_restarts(problem, rank=4, n_restarts=4, config=cfg, seed=2)
    meshed = solve_restarts(
        problem, rank=4, n_restarts=4, config=cfg, seed=2, mesh=mesh
    )
    np.testing.assert_allclose(meshed.costs, single.costs, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(meshed.results.w), np.asarray(single.results.w), rtol=2e-6
    )


def test_rank_sweep_on_mesh(problem):
    mesh = Mesh(np.array(jax.devices()[:2]), ("b",))
    res = solve_rank_sweep(problem, [4, 8, 4, 8], config=CFG, mesh=mesh)
    single = solve_rank_sweep(problem, [4, 8, 4, 8], config=CFG)
    np.testing.assert_allclose(res.costs, single.costs, rtol=1e-6)


def test_restarts_int8_x(problem):
    from nmf_tpu.utils.config import Precision

    cfg = SolveConfig(
        max_iter=10, check_every=5, precision=Precision(x_dtype="int8")
    )
    res = solve_restarts(problem, rank=4, n_restarts=2, config=cfg)
    ref = solve_restarts(problem, rank=4, n_restarts=2, config=SolveConfig(
        max_iter=10, check_every=5))
    # int8 X is a lossy storage format; costs should agree loosely
    np.testing.assert_allclose(res.costs, ref.costs, rtol=0.05)


def test_restarts_validation_errors(problem):
    with pytest.raises(ValueError):
        solve_restarts(problem)  # neither rank nor inits
    with pytest.raises(ValueError):
        solve_restarts(problem, rank=4, n_restarts=0)
    with pytest.raises(ValueError):
        solve_restarts(problem, w0s=np.ones((2, 64, 4), np.float32), h0s=None)
    with pytest.raises(ValueError):
        solve_rank_sweep(problem, [])
    with pytest.raises(ValueError):
        solve_rank_sweep(problem, [0, 4])
    mesh = Mesh(np.array(jax.devices()[:4]), ("b",))
    with pytest.raises(ValueError):
        solve_restarts(problem, rank=4, n_restarts=3, mesh=mesh)


def test_restarts_with_frozen_template_columns(problem):
    """n_frozen: each member keeps its initial first columns fixed (the
    per-member frozen source), matching solve_semi member by member."""
    from nmf_tpu import solve_semi

    x = problem
    rng = np.random.RandomState(9)
    R, k, f = 3, 6, 2
    template = rng.rand(64, f).astype(np.float32)
    w0s = np.stack([
        np.concatenate([template, rng.rand(64, k - f).astype(np.float32)], axis=1)
        for _ in range(R)
    ])
    h0s = rng.rand(R, k, 80).astype(np.float32)
    cfg = SolveConfig(max_iter=12, check_every=6)
    sel = solve_restarts(x, w0s=w0s, h0s=h0s, config=cfg, n_frozen=f)
    clamped_t = np.maximum(template, np.float32(2.2204e-16))
    for i in range(R):
        w_i = np.asarray(sel.results.w[i])
        np.testing.assert_array_equal(w_i[:, :f], clamped_t)
        ref = solve_semi(x, w0s[i], h0s[i], cfg, n_frozen=f)
        np.testing.assert_allclose(
            w_i, np.asarray(ref.w), rtol=5e-5, atol=1e-7
        )
        np.testing.assert_allclose(sel.costs[i], float(ref.cost), rtol=1e-5)
    # validation
    with pytest.raises(ValueError):
        solve_restarts(x, w0s=w0s, h0s=h0s, config=cfg, n_frozen=k + 1)


def test_restarts_stacks_reject_conflicting_args(problem):
    """Explicit w0s/h0s define rank and member count; a conflicting rank or
    n_restarts is a loud error, never a silent ignore."""
    rng = np.random.RandomState(0)
    w0s = rng.rand(2, 64, 4).astype(np.float32)
    h0s = rng.rand(2, 4, 80).astype(np.float32)
    with pytest.raises(ValueError, match="stacks define"):
        solve_restarts(problem, rank=6, w0s=w0s, h0s=h0s, config=CFG)
    with pytest.raises(ValueError, match="stacks define"):
        solve_restarts(problem, n_restarts=8, w0s=w0s, h0s=h0s, config=CFG)


def test_member_inits_shared_svd_bitwise():
    """The hoisted one-SVD path produces bit-identical members to per-member
    SVD computation (the SVD depends only on X)."""
    from nmf_tpu.models.init import nndsvd_init

    rng = np.random.RandomState(3)
    x = rng.rand(48, 56).astype(np.float32)
    ranks = [3, 5, 5]
    w0s, h0s = _member_inits(x, ranks, "nndsvdar", seed=11)
    for i, k in enumerate(ranks):
        wi, hi = nndsvd_init(x, k, variant="nndsvdar", seed=11 + i)
        np.testing.assert_array_equal(w0s[i, :, :k], wi)
        np.testing.assert_array_equal(h0s[i, :k, :], hi)


def test_selection_live_metrics_normalized(problem):
    """live_metrics configs share the non-live compiled program (per-member
    callbacks are noise) and produce identical results."""
    import dataclasses

    cfg_live = dataclasses.replace(CFG, live_metrics=True, track_cost=True)
    cfg_plain = dataclasses.replace(CFG, track_cost=True)
    a = solve_restarts(problem, rank=4, n_restarts=2, config=cfg_live, seed=3)
    b = solve_restarts(problem, rank=4, n_restarts=2, config=cfg_plain, seed=3)
    np.testing.assert_array_equal(np.asarray(a.results.w), np.asarray(b.results.w))
