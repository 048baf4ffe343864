"""Sparse-X prototype: correctness vs the dense solver on sparse data."""

import numpy as np
import pytest

from nmf_tpu import SolveConfig, solve
from nmf_tpu.models import sparse as sp


@pytest.fixture(scope="module")
def sparse_problem():
    rng = np.random.RandomState(31)
    m, k, n = 96, 8, 130
    x = rng.rand(m, n).astype(np.float32)
    x[rng.rand(m, n) < 0.99] = 0.0  # >= 99% sparse
    # keep at least one nonzero per row/col so factors stay well-posed
    x[np.arange(m), rng.randint(0, n, m)] = rng.rand(m).astype(np.float32) + 0.1
    x[rng.randint(0, m, n), np.arange(n)] = rng.rand(n).astype(np.float32) + 0.1
    w = rng.rand(m, k).astype(np.float32)
    h = rng.rand(k, n).astype(np.float32)
    return x, w, h


def test_sparse_matches_dense_unclamped(sparse_problem):
    """Sparse mode == the dense solver with exact zeros preserved
    (clamp_inputs=False), across the cost history and the factors."""
    x, w, h = sparse_problem
    cfg = SolveConfig(max_iter=30, check_every=10)
    eps = np.float32(cfg.eps)
    ref = solve(
        x, np.maximum(w, eps), np.maximum(h, eps), cfg, clamp_inputs=False
    )
    res = sp.solve_sparse(x, w, h, cfg, chunk=512)
    assert int(res.iterations) == 30
    np.testing.assert_allclose(
        np.asarray(res.w), np.asarray(ref.w), rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(res.cost_history), np.asarray(ref.cost_history), rtol=1e-5
    )


def test_sparse_memory_is_nnz_proportional(sparse_problem):
    """The solver's X representation is the COO triplet — nnz words, not
    M*N (the dense X here is ~12k entries; the sparse one carries ~350)."""
    x, w, h = sparse_problem
    sx = sp.sparse_from_dense(x)
    nnz = int(sx.data.shape[0])
    assert nnz < 0.05 * x.size
    padded = sp._pad_chunks(sx, 512)
    assert padded.data.shape[0] % 512 == 0
    # padding entries are inert: same result from padded and raw
    cfg = SolveConfig(max_iter=10, check_every=10)
    a = sp.solve_sparse(sx, w, h, cfg, chunk=512)
    b = sp.solve_sparse(sx, w, h, cfg, chunk=128)
    np.testing.assert_allclose(
        np.asarray(a.w), np.asarray(b.w), rtol=1e-5, atol=1e-8
    )


def test_sparse_threshold_convergence(sparse_problem):
    x, w, h = sparse_problem
    cfg = SolveConfig(max_iter=100_000, thresh=1e-3, check_every=10)
    res = sp.solve_sparse(x, w, h, cfg, chunk=512)
    assert bool(res.converged)
    assert int(res.iterations) < 100_000


def test_sparse_rejects_unsupported(sparse_problem):
    x, w, h = sparse_problem
    with pytest.raises(NotImplementedError):
        sp.solve_sparse(x, w, h, SolveConfig(max_iter=2, beta=2.0))
