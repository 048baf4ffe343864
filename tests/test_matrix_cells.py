"""Capability-matrix cells closed in round 3 (docs/MATRIX.md):

masked in-memory x int8, tile-sparse x {int8 per-tile scales, batched,
checkpoint/resume}, COO deprecation, and the explicit accelerate
boundaries of the stream-per-iteration drivers.
"""

import numpy as np
import pytest

import jax

from nmf_tpu import SolveConfig, solve_sparse_tiled, solve_sparse_tiled_batched
from nmf_tpu.models.masked import solve_masked, solve_masked_h_only
from nmf_tpu.models.sparse_tiled import TileSparseX, tiles_from_dense
from nmf_tpu.utils.config import Precision


EPS = np.float32(2.2204e-16)


def _dense_problem(m=128, k=8, n=256, seed=0):
    rng = np.random.RandomState(seed)
    x = np.maximum(rng.rand(m, n).astype(np.float32), EPS)
    w0 = rng.rand(m, k).astype(np.float32)
    h0 = rng.rand(k, n).astype(np.float32)
    return x, w0, h0


def _sparse_problem(m=96, k=6, n=128, seed=1, density=0.45):
    rng = np.random.RandomState(seed)
    x = rng.rand(m, n).astype(np.float32)
    x[rng.rand(m, n) > density] = 0.0
    w0 = rng.rand(m, k).astype(np.float32)
    h0 = rng.rand(k, n).astype(np.float32)
    return x, w0, h0


def _mesh(shape):
    from nmf_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < int(np.prod(shape)):
        pytest.skip("needs the 8-device CPU mesh")
    return make_mesh(shape)


# ---------------------------------------------------------------------------
# masked x int8
# ---------------------------------------------------------------------------


def test_masked_int8_close_to_f32_and_mesh_equivalent():
    x, w0, h0 = _dense_problem()
    mask = (np.random.RandomState(3).rand(*x.shape) > 0.3).astype(np.float32)
    cfg32 = SolveConfig(max_iter=50, check_every=25)
    cfg8 = SolveConfig(
        max_iter=50, check_every=25, precision=Precision(x_dtype="int8")
    )
    r32 = solve_masked(x, w0, h0, mask, cfg32)
    r8 = solve_masked(x, w0, h0, mask, cfg8)
    # int8 storage: per-column scales bound the data error by colmax/510
    rel = abs(float(r8.cost) - float(r32.cost)) / abs(float(r32.cost))
    assert rel < 5e-3, rel
    r8m = solve_masked(x, w0, h0, mask, cfg8, mesh=_mesh((4, 2)))
    relm = abs(float(r8m.cost) - float(r8.cost)) / abs(float(r8.cost))
    assert relm < 5e-5, relm


def test_masked_int8_garbage_in_unobserved_entries_is_inert():
    """Masked entries may hold garbage; they are zeroed BEFORE quantization
    so they cannot poison the per-column scales."""
    x, w0, h0 = _dense_problem(seed=5)
    mask = (np.random.RandomState(5).rand(*x.shape) > 0.3).astype(np.float32)
    x_garbage = x.copy()
    x_garbage[mask == 0] = 1e6  # would destroy the column scale if included
    cfg8 = SolveConfig(
        max_iter=30, check_every=15, precision=Precision(x_dtype="int8")
    )
    clean = solve_masked(x, w0, h0, mask, cfg8)
    dirty = solve_masked(x_garbage, w0, h0, mask, cfg8)
    np.testing.assert_array_equal(np.asarray(clean.w), np.asarray(dirty.w))
    np.testing.assert_array_equal(np.asarray(clean.h), np.asarray(dirty.h))


def test_masked_h_only_int8_mesh_matches_single():
    x, w0, h0 = _dense_problem()
    mask = (np.random.RandomState(7).rand(*x.shape) > 0.25).astype(np.float32)
    cfg8 = SolveConfig(
        max_iter=30, check_every=15, precision=Precision(x_dtype="int8")
    )
    single = solve_masked_h_only(x, w0, h0, mask, cfg8)
    mesh = solve_masked_h_only(x, w0, h0, mask, cfg8, mesh=_mesh((2, 4)))
    rel = abs(float(mesh.cost) - float(single.cost)) / abs(float(single.cost))
    assert rel < 5e-5, rel


# ---------------------------------------------------------------------------
# tile-sparse x int8 (per-tile scales)
# ---------------------------------------------------------------------------


def test_tile_sparse_int8_close_to_f32_and_mesh_equivalent():
    x, w0, h0 = _sparse_problem()
    cfg32 = SolveConfig(max_iter=40, check_every=20)
    cfg8 = SolveConfig(
        max_iter=40, check_every=20, precision=Precision(x_dtype="int8")
    )
    r32 = solve_sparse_tiled(x, w0, h0, cfg32, tile=(16, 16), chunk=8)
    r8 = solve_sparse_tiled(x, w0, h0, cfg8, tile=(16, 16), chunk=8)
    rel = abs(float(r8.cost) - float(r32.cost)) / abs(float(r32.cost))
    assert rel < 5e-3, rel
    r8m = solve_sparse_tiled(
        x, w0, h0, cfg8, tile=(16, 16), chunk=8, mesh=_mesh((4, 2))
    )
    relm = abs(float(r8m.cost) - float(r8.cost)) / abs(float(r8.cost))
    assert relm < 5e-5, relm


def test_per_tile_scales_error_bound():
    """Each tile's quantization error is bounded by ITS OWN max/510 — the
    per-tile advantage over per-column scales."""
    from nmf_tpu.models.sparse_tiled import _quantize_tiles_np

    rng = np.random.RandomState(0)
    # tiles with wildly different magnitudes
    tiles = np.stack(
        [rng.rand(16, 16).astype(np.float32) * (10.0 ** i) for i in range(-3, 3)]
    )
    codes, scales = _quantize_tiles_np(tiles, float(EPS))
    recon = codes.astype(np.float32) * scales[:, None, None]
    err = np.abs(recon - tiles)
    per_tile_bound = tiles.max(axis=(1, 2)) / 510.0 * 1.0001
    assert np.all(err.max(axis=(1, 2)) <= per_tile_bound)


def test_tile_sparse_int8_beats_per_column_on_varying_magnitudes():
    """A column whose peak dwarfs its typical entries loses everything under
    per-column scales; per-tile scales keep the small tiles accurate."""
    from nmf_tpu.models.sparse_tiled import _quantize_tiles_np
    from nmf_tpu.ops.quant import quantize_columns_np

    rng = np.random.RandomState(2)
    m, n, t = 64, 16, 4
    x = np.zeros((m, n), np.float32)
    for i in range(t):
        x[i * 16:(i + 1) * 16] = rng.rand(16, n) * (10.0 ** (i - 2))
    # per-column: one scale per column, dominated by the 10^1 tile
    codes_c, scales_c = quantize_columns_np(x, float(EPS))
    recon_c = codes_c.astype(np.float32) * scales_c[None, :]
    # per-tile over the same 16x16 blocks
    tiles = x.reshape(t, 16, n)
    codes_t, scales_t = _quantize_tiles_np(tiles, float(EPS))
    recon_t = (codes_t.astype(np.float32) * scales_t[:, None, None]).reshape(m, n)
    small = x[:16]  # the 10^-2 tile
    err_c = np.abs(recon_c[:16] - small).max()
    err_t = np.abs(recon_t[:16] - small).max()
    assert err_t < err_c / 10


# ---------------------------------------------------------------------------
# tile-sparse x batched
# ---------------------------------------------------------------------------


def test_tile_sparse_batched_matches_single_members():
    probs = [_sparse_problem(seed=s) for s in (1, 2, 3)]
    xs = [p[0] for p in probs]
    w0s = np.stack([p[1] for p in probs])
    h0s = np.stack([p[2] for p in probs])
    cfg = SolveConfig(max_iter=30, check_every=15)
    rb = solve_sparse_tiled_batched(xs, w0s, h0s, cfg, tile=(16, 16), chunk=8)
    for i, (x, w0, h0) in enumerate(probs):
        ri = solve_sparse_tiled(x, w0, h0, cfg, tile=(16, 16), chunk=8)
        rel = abs(float(np.asarray(rb.cost)[i]) - float(ri.cost)) / abs(
            float(ri.cost)
        )
        assert rel < 1e-5, (i, rel)


def test_tile_sparse_batched_shape_validation():
    x1, w0, h0 = _sparse_problem(seed=1)
    x2 = _sparse_problem(m=64, k=6, n=128, seed=2)[0]
    with pytest.raises(ValueError):
        solve_sparse_tiled_batched(
            [x1, x2], np.stack([w0, w0]), np.stack([h0, h0]),
            SolveConfig(max_iter=2), tile=(16, 16),
        )


# ---------------------------------------------------------------------------
# tile-sparse x checkpoint/resume
# ---------------------------------------------------------------------------


def test_tile_sparse_checkpoint_resume_equals_straight_run(tmp_path):
    from nmf_tpu.utils.checkpoint import solve_with_checkpoints

    x, w0, h0 = _sparse_problem()
    tx = tiles_from_dense(x, (16, 16))
    cfg = SolveConfig(max_iter=60, check_every=15)
    straight = solve_sparse_tiled(tx, w0, h0, cfg, chunk=8)

    d1 = str(tmp_path / "full")
    full = solve_with_checkpoints(tx, w0, h0, cfg, d1, every=20)
    assert int(full.iteration) == 60
    rel = abs(full.cost_history[-1] - float(straight.cost)) / abs(
        float(straight.cost)
    )
    assert rel < 1e-5, rel

    # kill after the first segment, then resume: result == straight run
    d2 = str(tmp_path / "killed")
    partial_cfg = SolveConfig(max_iter=20, check_every=15)
    solve_with_checkpoints(tx, w0, h0, partial_cfg, d2, every=20)
    resumed = solve_with_checkpoints(tx, w0, h0, cfg, d2, every=20)
    assert int(resumed.iteration) == 60
    np.testing.assert_allclose(
        np.asarray(resumed.w), np.asarray(full.w), rtol=2e-5, atol=1e-7
    )


def test_tile_sparse_accel_kill_resume_exact(tmp_path):
    """Accelerated tile-sparse kill/resume carries the FULL accel state
    (momentum + extrapolation pair, cropped to logical shape in the files
    and re-padded on resume), so resume == uninterrupted checkpointed run
    exactly.  Dims are deliberately NOT block-aligned so the carry's
    crop/re-pad path is exercised (zero pads are exact: pad rows/cols see
    zero numerators whatever the eval point's pads hold)."""
    from nmf_tpu.utils.checkpoint import solve_with_checkpoints

    x, w0, h0 = _sparse_problem(m=90, n=120, seed=5)
    tx = tiles_from_dense(x, (16, 16))
    cfg = SolveConfig(max_iter=60, check_every=10, accelerate=True)

    full = solve_with_checkpoints(tx, w0, h0, cfg, str(tmp_path / "f"), every=20)
    assert int(full.iteration) == 60
    assert np.isfinite(full.momentum)
    assert full.w_ex is not None and full.w_ex.shape == w0.shape
    assert full.h_ex is not None and full.h_ex.shape == h0.shape

    d2 = str(tmp_path / "killed")
    partial = SolveConfig(max_iter=20, check_every=10, accelerate=True)
    solve_with_checkpoints(tx, w0, h0, partial, d2, every=20)
    resumed = solve_with_checkpoints(tx, w0, h0, cfg, d2, every=20)
    assert int(resumed.iteration) == 60
    # the only divergence allowed is the resume-time load clamp on sub-eps
    # factor entries (reference semantics, nmf.cu:211) — same tolerance as
    # the dense kill/resume test
    np.testing.assert_allclose(
        np.asarray(resumed.w), np.asarray(full.w), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(resumed.h), np.asarray(full.h), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(resumed.momentum, full.momentum, rtol=1e-6)
    np.testing.assert_allclose(
        resumed.cost_history, full.cost_history, rtol=1e-6
    )


def test_tile_sparse_checkpoint_mesh(tmp_path):
    from nmf_tpu.utils.checkpoint import solve_with_checkpoints

    x, w0, h0 = _sparse_problem()
    tx = tiles_from_dense(x, (16, 16))
    cfg = SolveConfig(max_iter=30, check_every=15)
    mesh = _mesh((4, 2))
    state = solve_with_checkpoints(
        tx, w0, h0, cfg, str(tmp_path / "m"), every=15, mesh=mesh
    )
    assert int(state.iteration) == 30
    single = solve_sparse_tiled(tx, w0, h0, cfg, chunk=8)
    rel = abs(state.cost_history[-1] - float(single.cost)) / abs(
        float(single.cost)
    )
    assert rel < 5e-5, rel


# ---------------------------------------------------------------------------
# deprecation + accelerate boundaries
# ---------------------------------------------------------------------------


def test_coo_sparse_deprecation_warning():
    from nmf_tpu.models.sparse import solve_sparse

    x, w0, h0 = _sparse_problem()
    with pytest.warns(DeprecationWarning, match="solve_sparse_tiled"):
        solve_sparse(x, w0, h0, SolveConfig(max_iter=2, check_every=2))


def test_online_raises_for_accelerate():
    """solve_online stays the one accelerate boundary: a stochastic pass has
    no global cost to safeguard an extrapolated step against
    (solve_out_of_core accepts accelerate since round 3 —
    tests/test_streaming_accel.py)."""
    from nmf_tpu.models.online import solve_online

    x, w0, _ = _dense_problem()
    cfg = SolveConfig(max_iter=4, check_every=2, accelerate=True)
    with pytest.raises(NotImplementedError, match="accelerate"):
        solve_online(x, w0, cfg)


def test_tile_sparse_batched_rejects_bad_inputs():
    """The batched entry applies the same hand-built guards as the
    single/mesh entry: out-of-grid block ids, negative payloads, and an
    explicit pallas request all error loudly."""
    import jax.numpy as jnp

    from nmf_tpu.models.sparse_tiled import (
        TileSparseX, solve_sparse_tiled_batched,
    )

    rng = np.random.RandomState(0)
    good = TileSparseX(
        tiles=rng.rand(1, 8, 8).astype(np.float32),
        rows=np.array([0], np.int32), cols=np.array([0], np.int32),
        shape=(16, 16),
    )
    w0s = rng.rand(1, 16, 4).astype(np.float32)
    h0s = rng.rand(1, 4, 16).astype(np.float32)
    cfg = SolveConfig(max_iter=2, check_every=2)
    # element indices instead of block ids
    bad_ids = TileSparseX(
        tiles=good.tiles, rows=np.array([9], np.int32),
        cols=np.array([12], np.int32), shape=(16, 16),
    )
    with pytest.raises(ValueError, match="BLOCK indices"):
        solve_sparse_tiled_batched([bad_ids], w0s, h0s, cfg, tile=(8, 8))
    # negative payload
    bad_vals = TileSparseX(
        tiles=np.full((1, 8, 8), -1.0, np.float32),
        rows=np.array([0], np.int32), cols=np.array([0], np.int32),
        shape=(16, 16),
    )
    with pytest.raises(ValueError, match="non-negative"):
        solve_sparse_tiled_batched([bad_vals], w0s, h0s, cfg, tile=(8, 8))
    # explicit pallas request is never silently downgraded
    with pytest.raises(NotImplementedError, match="pallas"):
        solve_sparse_tiled_batched(
            [good], w0s, h0s,
            SolveConfig(max_iter=2, backend="pallas"), tile=(8, 8),
        )
    # the good input still solves
    res = solve_sparse_tiled_batched([good], w0s, h0s, cfg, tile=(8, 8))
    assert np.isfinite(np.asarray(res.w)).all()
