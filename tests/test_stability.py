"""Consensus-clustering rank selection (Brunet-style stability study)."""

import numpy as np
import pytest

from nmf_tpu import SolveConfig, consensus_matrix, rank_stability


@pytest.fixture(scope="module")
def planted_problem():
    """X with a clean planted rank-3 block structure: K=3 should be the
    stable factorization, larger K splits blocks arbitrarily per restart."""
    rng = np.random.RandomState(7)
    m, n, ktrue = 60, 48, 3
    w = np.zeros((m, ktrue), np.float32)
    h = np.zeros((ktrue, n), np.float32)
    for j in range(ktrue):
        w[j * (m // ktrue):(j + 1) * (m // ktrue), j] = 1.0 + rng.rand(m // ktrue)
        h[j, j * (n // ktrue):(j + 1) * (n // ktrue)] = 1.0 + rng.rand(n // ktrue)
    x = w @ h + 0.01 * rng.rand(m, n).astype(np.float32)
    return x.astype(np.float32)


CFG = SolveConfig(max_iter=120, check_every=40)


def test_rank_stability_identifies_planted_rank(planted_problem):
    res = rank_stability(
        planted_problem, ranks=[2, 3, 5], n_restarts=8, config=CFG, seed=1
    )
    assert res.cophenetic.shape == (3,)
    # the planted K=3 is (near-)perfectly stable...
    k3 = res.cophenetic[list(res.ranks).index(3)]
    assert k3 > 0.98
    # ...and strictly more stable than the overfit K=5
    k5 = res.cophenetic[list(res.ranks).index(5)]
    assert k3 > k5
    assert 0.0 <= res.dispersion.min() and res.dispersion.max() <= 1.0 + 1e-9
    # dispersion agrees on the ordering for the planted case
    assert res.dispersion[list(res.ranks).index(3)] >= res.dispersion[
        list(res.ranks).index(5)
    ]


def test_consensus_matrix_properties(planted_problem):
    from nmf_tpu import solve_rank_sweep

    sweep = solve_rank_sweep(
        planted_problem, [3] * 6, config=CFG, seed=2, init="random"
    )
    c = consensus_matrix(sweep, 3)
    n = planted_problem.shape[1]
    assert c.shape == (n, n)
    np.testing.assert_allclose(c, c.T, atol=0)
    np.testing.assert_allclose(np.diag(c), np.ones(n))
    assert c.min() >= 0.0 and c.max() <= 1.0
    with pytest.raises(ValueError):
        consensus_matrix(sweep, 4)  # no members with that rank


def test_rank_stability_keep_consensus_and_best_rank(planted_problem):
    res = rank_stability(
        planted_problem, ranks=[3, 5], n_restarts=6, config=CFG, seed=0,
        keep_consensus=True,
    )
    assert set(res.consensus.keys()) == {3, 5}
    assert res.best_rank() in (3, 5)
    # with a clean planted structure the coefficient drops after 3
    assert res.best_rank() == 3


def test_rank_stability_validation(planted_problem):
    with pytest.raises(ValueError):
        rank_stability(planted_problem, ranks=[], n_restarts=4)
    with pytest.raises(ValueError):
        rank_stability(planted_problem, ranks=[3], n_restarts=1)
    with pytest.raises(ValueError):
        rank_stability(planted_problem, ranks=[3], n_restarts=4, init="nndsvda")


def test_rank_stability_sorts_and_dedupes_ranks(planted_problem):
    a = rank_stability(planted_problem, ranks=[5, 3, 3], n_restarts=4,
                       config=CFG, seed=1)
    b = rank_stability(planted_problem, ranks=[3, 5], n_restarts=4,
                       config=CFG, seed=1)
    np.testing.assert_array_equal(a.ranks, [3, 5])
    np.testing.assert_allclose(a.cophenetic, b.cophenetic)


def test_cophenetic_degenerate_consensus_is_finite():
    from nmf_tpu.models.stability import _cophenetic

    # uniformly unstable: all off-diagonal 0.5 -> no structure, not NaN
    c = np.full((4, 4), 0.5, np.float32)
    np.fill_diagonal(c, 1.0)
    v = _cophenetic(c)
    assert np.isfinite(v) and v == 0.0
    # perfectly stable stays 1.0
    assert _cophenetic(np.ones((4, 4), np.float32)) == 1.0
