"""Sparse-X prototype: correctness vs the dense solver on sparse data."""

import numpy as np
import pytest

# the COO path is deprecated in favor of solve_sparse_tiled; these tests
# remain its equivalence oracle
pytestmark = pytest.mark.filterwarnings("ignore::DeprecationWarning")

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


# ---------------------------------------------------------------------------
# Tile-sparse (block-sparse) X: the at-scale format (models/sparse_tiled.py)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiled_problem():
    """Clustered sparsity: nonzeros confined to a few (32, 32) blocks."""
    rng = np.random.RandomState(41)
    m, k, n = 160, 8, 200  # 5 x ceil(200/32)=7 block grid at tile=(32,32)
    x = np.zeros((m, n), np.float32)
    # a handful of dense-ish blocks + scattered singletons
    for (bi, bj) in [(0, 0), (1, 3), (2, 5), (4, 6), (3, 1), (0, 4)]:
        blk = rng.rand(32, 32).astype(np.float32)
        blk[rng.rand(32, 32) < 0.5] = 0.0
        x[bi * 32:(bi + 1) * 32, bj * 32:min((bj + 1) * 32, n)] = (
            blk[:, : min(32, n - bj * 32)]
        )
    # rows/cols with no data converge to exact zeros in BOTH the dense
    # unclamped and tile-sparse solvers — no need to cover them
    w = rng.rand(m, k).astype(np.float32)
    h = rng.rand(k, n).astype(np.float32)
    return x, w, h


def test_tiled_matches_dense_unclamped(tiled_problem):
    """Tile-sparse mode == the dense solver with exact zeros preserved,
    across cost history and factors (same contract as the COO path)."""
    from nmf_tpu.models import sparse_tiled as st

    x, w, h = tiled_problem
    cfg = SolveConfig(max_iter=30, check_every=10)
    eps = np.float32(cfg.eps)
    ref = solve(
        x, np.maximum(w, eps), np.maximum(h, eps), cfg, clamp_inputs=False
    )
    res = st.solve_sparse_tiled(x, w, h, cfg, chunk=8, tile=(32, 32))
    assert int(res.iterations) == 30
    np.testing.assert_allclose(
        np.asarray(res.w), np.asarray(ref.w), rtol=1e-4, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(res.h), np.asarray(ref.h), rtol=1e-4, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(res.cost_history), np.asarray(ref.cost_history), rtol=1e-5
    )


def test_tiled_matches_coo(tiled_problem):
    """Both sparse backends implement the same exact-zero semantics."""
    from nmf_tpu.models import sparse_tiled as st

    x, w, h = tiled_problem
    cfg = SolveConfig(max_iter=20, check_every=10)
    a = st.solve_sparse_tiled(x, w, h, cfg, chunk=8, tile=(32, 32))
    b = sp.solve_sparse(x, w, h, cfg, chunk=512)
    np.testing.assert_allclose(
        np.asarray(a.w), np.asarray(b.w), rtol=1e-4, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(a.cost_history), np.asarray(b.cost_history), rtol=1e-5
    )


def test_tiled_storage_is_block_proportional(tiled_problem):
    """Storage scales with OCCUPIED tiles, not M*N; padding tiles are inert
    (chunk size does not change the result)."""
    from nmf_tpu.models import sparse_tiled as st

    x, w, h = tiled_problem
    tx = st.tiles_from_dense(x, tile=(32, 32))
    assert tx.occupancy() < 0.75  # clustered data: a strict subset of blocks
    assert tx.tiles.shape[1:] == (32, 32)
    cfg = SolveConfig(max_iter=10, check_every=10)
    a = st.solve_sparse_tiled(tx, w, h, cfg, chunk=4)
    b = st.solve_sparse_tiled(tx, w, h, cfg, chunk=16)
    np.testing.assert_allclose(
        np.asarray(a.w), np.asarray(b.w), rtol=1e-5, atol=1e-8
    )


def test_tiled_ragged_edges_and_duplicates():
    """Logical dims need not divide the tile; duplicate COO entries sum."""
    from nmf_tpu.models import sparse_tiled as st

    rng = np.random.RandomState(7)
    m, k, n = 45, 4, 70  # ragged vs (32, 32) tiles
    x = np.zeros((m, n), np.float32)
    x[rng.rand(m, n) > 0.9] = 1.0
    x[np.arange(m), rng.randint(0, n, m)] += 0.5
    x[rng.randint(0, m, n), np.arange(n)] += 0.5
    w = rng.rand(m, k).astype(np.float32)
    h = rng.rand(k, n).astype(np.float32)
    cfg = SolveConfig(max_iter=10, check_every=5)
    eps = np.float32(cfg.eps)
    ref = solve(x, np.maximum(w, eps), np.maximum(h, eps), cfg, clamp_inputs=False)
    res = st.solve_sparse_tiled(x, w, h, cfg, chunk=4, tile=(32, 32))
    assert np.asarray(res.w).shape == (m, k)
    assert np.asarray(res.h).shape == (k, n)
    np.testing.assert_allclose(
        np.asarray(res.w), np.asarray(ref.w), rtol=1e-4, atol=2e-6
    )
    # duplicate COO entries sum into the tile payload
    tx = st.tiles_from_coo(
        [1.0, 2.0, 4.0], [3, 3, 0], [5, 5, 0], (45, 70), tile=(32, 32)
    )
    assert float(np.asarray(tx.tiles)[0, 3, 5]) == 3.0
    assert float(np.asarray(tx.tiles)[0, 0, 0]) == 4.0


def test_tiled_sharded_matches_single_device(tiled_problem):
    """Mesh tile-sparse == single-device tile-sparse across mesh shapes
    (per-device tile lists pad with inert zero tiles)."""
    from nmf_tpu.models import sparse_tiled as st
    from nmf_tpu.parallel.mesh import make_mesh

    x, w, h = tiled_problem
    cfg = SolveConfig(max_iter=20, check_every=10)
    ref = st.solve_sparse_tiled(x, w, h, cfg, chunk=8, tile=(32, 32))
    for shape in [(4, 2), (2, 4), (8, 1)]:
        res = st.solve_sparse_tiled(
            x, w, h, cfg, chunk=8, tile=(32, 32), mesh=make_mesh(shape=shape)
        )
        assert int(res.iterations) == 20
        np.testing.assert_allclose(
            np.asarray(res.w), np.asarray(ref.w), rtol=5e-5, atol=2e-6
        )
        np.testing.assert_allclose(
            np.asarray(res.cost_history),
            np.asarray(ref.cost_history),
            rtol=1e-5,
        )


def test_tiled_rejects_unsupported(tiled_problem):
    from nmf_tpu.models import sparse_tiled as st
    from nmf_tpu.utils.config import Precision

    x, w, h = tiled_problem
    with pytest.raises(NotImplementedError):
        st.solve_sparse_tiled(x, w, h, SolveConfig(max_iter=2, beta=2.0))
    # int8 X is SUPPORTED since round 3 (per-tile scales) — must not raise
    r8 = st.solve_sparse_tiled(
        x, w, h,
        SolveConfig(max_iter=2, precision=Precision(x_dtype="int8")),
    )
    assert np.isfinite(float(r8.cost))
    with pytest.raises(ValueError):
        st.solve_sparse_tiled(x, w[:-1], h, SolveConfig(max_iter=2))


def test_sparse_constructors_reject_negative_data():
    x = np.array([[1.0, -0.5], [0.0, 2.0]], np.float32)
    with pytest.raises(ValueError, match="nonnegative"):
        sp.sparse_from_dense(x)
    from nmf_tpu.models import sparse_tiled as st

    with pytest.raises(ValueError, match="nonnegative"):
        st.tiles_from_coo([1.0, -2.0], [0, 1], [0, 1], (4, 4), tile=(2, 2))
