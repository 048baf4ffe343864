"""Fused Pallas kernel tests (interpret mode on CPU) vs the jnp reference.

The same kernels run compiled on TPU; interpret=True executes the identical
kernel logic on CPU so correctness is covered in CI without hardware.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nmf_tpu.ops.mu import mu_step, update_h, update_w
from nmf_tpu.ops.pallas import fused_mu
from nmf_tpu.utils.config import Precision

from oracle import clamp


@pytest.fixture(scope="module")
def problem():
    rng = np.random.RandomState(7)
    m, k, n = 96, 12, 130  # deliberately unaligned to MXU tiles
    x = clamp(rng.rand(m, n).astype(np.float32))
    w = clamp(rng.rand(m, k).astype(np.float32))
    h = clamp(rng.rand(k, n).astype(np.float32))
    return jnp.asarray(x), jnp.asarray(w), jnp.asarray(h)


def test_update_h_fused_matches_jnp(problem):
    x, w, h = problem
    ours = fused_mu.update_h_fused(w, h, x, interpret=True, block_m=32, block_n=128)
    ref = update_h(w, h, x)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-7)


def test_update_w_fused_matches_jnp(problem):
    x, w, h = problem
    ours = fused_mu.update_w_fused(w, h, x, interpret=True, block_m=32, block_n=128)
    ref = update_w(w, h, x)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-7)


def test_mu_step_fused_multi_iter(problem):
    x, w, h = problem
    wf, hf = w, h
    wr, hr = w, h
    for _ in range(3):
        wf, hf = fused_mu.mu_step_fused(wf, hf, x, interpret=True)
        wr, hr = mu_step(wr, hr, x)
    np.testing.assert_allclose(np.asarray(wf), np.asarray(wr), rtol=5e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(hf), np.asarray(hr), rtol=5e-5, atol=1e-7)


@pytest.mark.parametrize(
    "m,k,n,bm,bn",
    [
        (8, 4, 128, 8, 128),      # single tile
        (64, 16, 256, 16, 128),   # multi-tile both grid dims
        (100, 30, 300, 32, 128),  # ragged edges everywhere (paper K=30)
        (256, 128, 384, 128, 128),
    ],
)
def test_fused_shapes_grid(m, k, n, bm, bn):
    rng = np.random.RandomState(m + n)
    x = jnp.asarray(clamp(rng.rand(m, n).astype(np.float32)))
    w = jnp.asarray(clamp(rng.rand(m, k).astype(np.float32)))
    h = jnp.asarray(clamp(rng.rand(k, n).astype(np.float32)))
    hf = fused_mu.update_h_fused(w, h, x, interpret=True, block_m=bm, block_n=bn)
    hr = update_h(w, h, x)
    np.testing.assert_allclose(np.asarray(hf), np.asarray(hr), rtol=1e-5, atol=1e-7)
    wf = fused_mu.update_w_fused(w, h, x, interpret=True, block_m=bm, block_n=bn)
    wr = update_w(w, h, x)
    np.testing.assert_allclose(np.asarray(wf), np.asarray(wr), rtol=1e-5, atol=1e-7)


def test_fused_bf16_close(problem):
    x, w, h = problem
    bf16 = Precision("bfloat16", "float32")
    ours = fused_mu.update_h_fused(w, h, x, precision=bf16, interpret=True)
    ref = update_h(w, h, x)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=0.05)


def test_large_k_falls_back_to_jnp(problem):
    x, w, h = problem
    big_k = fused_mu.MAX_FUSED_K + 8
    rng = np.random.RandomState(0)
    w2 = jnp.asarray(clamp(rng.rand(x.shape[0], big_k).astype(np.float32)))
    h2 = jnp.asarray(clamp(rng.rand(big_k, x.shape[1]).astype(np.float32)))
    out = fused_mu.update_h_fused(w2, h2, x, interpret=True)
    ref = update_h(w2, h2, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-7)


def test_numerator_only_matches_jnp(problem):
    """The sharded solver's building block: raw numerators, no epilogue."""
    import jax

    from nmf_tpu.ops.mu import matmul
    from nmf_tpu.ops.elementwise import eps_clamp
    from nmf_tpu.utils.config import Precision

    x, w, h = problem
    prec = Precision()
    z = x / eps_clamp(matmul(w, h, prec), 2.2204e-16)
    ref_h = matmul(w, z, prec, transpose_a=True)
    ours_h = fused_mu.update_h_fused(w, h, x, numerator_only=True, interpret=True)
    np.testing.assert_allclose(np.asarray(ours_h), np.asarray(ref_h), rtol=1e-5, atol=1e-6)
    assert ours_h.dtype == jnp.float32
    ref_w = matmul(z, h, prec, transpose_b=True)
    ours_w = fused_mu.update_w_fused(w, h, x, numerator_only=True, interpret=True)
    np.testing.assert_allclose(np.asarray(ours_w), np.asarray(ref_w), rtol=1e-5, atol=1e-6)


def test_kl_cost_fused_matches_jnp(problem):
    from nmf_tpu.ops.divergence import kl_divergence

    x, w, h = problem
    ours = fused_mu.kl_cost_fused(x, w, h, interpret=True, block_m=32, block_n=128)
    ref = kl_divergence(x, w, h)
    assert float(ours) == pytest.approx(float(ref), rel=1e-5)


def test_kl_cost_fused_padding_masked():
    """Ragged shapes: zero padding must contribute exactly nothing."""
    from nmf_tpu.ops.divergence import kl_divergence

    rng = np.random.RandomState(1)
    x = jnp.asarray(clamp(rng.rand(33, 170).astype(np.float32)))
    w = jnp.asarray(clamp(rng.rand(33, 5).astype(np.float32)))
    h = jnp.asarray(clamp(rng.rand(5, 170).astype(np.float32)))
    ours = fused_mu.kl_cost_fused(x, w, h, interpret=True, block_m=16, block_n=128)
    ref = kl_divergence(x, w, h)
    assert float(ours) == pytest.approx(float(ref), rel=1e-5)
    assert np.isfinite(float(ours))


def test_fused_split3_float32_fast_close_to_f32(problem):
    """The in-kernel 3-pass bf16 split-float dot (float32_fast policy) tracks
    the exact-f32 fused result to ~1e-6 per half-update."""
    x, w, h = problem
    fast = Precision("float32_fast")
    assert fast.mm_input_dtype == "float32"
    ref_h = fused_mu.update_h_fused(w, h, x, interpret=True, block_m=32, block_n=128)
    our_h = fused_mu.update_h_fused(
        w, h, x, precision=fast, interpret=True, block_m=32, block_n=128
    )
    np.testing.assert_allclose(
        np.asarray(our_h), np.asarray(ref_h), rtol=5e-6, atol=1e-7
    )
    ref_w = fused_mu.update_w_fused(w, h, x, interpret=True, block_m=32, block_n=128)
    our_w = fused_mu.update_w_fused(
        w, h, x, precision=fast, interpret=True, block_m=32, block_n=128
    )
    np.testing.assert_allclose(
        np.asarray(our_w), np.asarray(ref_w), rtol=5e-6, atol=1e-7
    )


def test_kl_cost_fused_unclamped_zeros_match_jnp():
    """Genuine x == 0 entries (clamp skipped): both backends use the x->0
    limit of x*log(x/y) and keep the '+y' mass, and they agree — while
    zero padding beyond the logical extents still contributes nothing."""
    from nmf_tpu.ops.divergence import kl_divergence

    rng = np.random.RandomState(3)
    x_np = rng.rand(33, 170).astype(np.float32)
    x_np[x_np < 0.3] = 0.0  # real zeros, NOT eps-clamped
    x = jnp.asarray(x_np)
    w = jnp.asarray(clamp(rng.rand(33, 5).astype(np.float32)))
    h = jnp.asarray(clamp(rng.rand(5, 170).astype(np.float32)))
    ours = fused_mu.kl_cost_fused(x, w, h, interpret=True, block_m=16, block_n=128)
    ref = kl_divergence(x, w, h)
    assert np.isfinite(float(ref))
    assert float(ours) == pytest.approx(float(ref), rel=1e-5)


# ---------------------------------------------------------------------------
# Tile-sparse sweep kernels (ops/pallas/tile_sparse.py), interpret mode
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tile_problem():
    rng = np.random.RandomState(3)
    bm = bn = 128
    m, k, n = 512, 16, 640  # 4 x 5 block grid; cols 1 and 3 left empty
    x = np.zeros((m, n), np.float32)
    for (i, j) in [(0, 0), (1, 2), (3, 4), (2, 2), (0, 4)]:
        blk = rng.rand(bm, bn).astype(np.float32)
        blk[rng.rand(bm, bn) < 0.6] = 0
        x[i * bm:(i + 1) * bm, j * bn:(j + 1) * bn] = blk
    w = clamp(rng.rand(m, k).astype(np.float32))
    h = clamp(rng.rand(k, n).astype(np.float32))
    return x, w, h


def test_tile_sparse_numerators_match_dense(tile_problem):
    """Both sweep kernels == the dense numerators with exact zeros, and
    output blocks with no tiles (sentinel entries) come back exactly zero."""
    from nmf_tpu.models.sparse_tiled import tiles_from_dense
    from nmf_tpu.ops.pallas import tile_sparse as ts

    x, w, h = tile_problem
    tx = tiles_from_dense(x, tile=(128, 128))
    rows, cols = np.asarray(tx.rows), np.asarray(tx.cols)
    eps = float(np.float32(2.2204e-16))
    z = x / np.maximum(w @ h, eps)

    ph = [jnp.asarray(a) for a in ts.sweep_plan(rows, cols, 640 // 128, "col")]
    num_h = ts.h_numerator(
        jnp.asarray(w), jnp.asarray(h), tx.tiles, *ph, eps, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(num_h), w.T @ z, rtol=1e-5, atol=1e-6
    )
    # empty col blocks (1 and 3): exact zeros via the sentinel init
    assert np.all(np.asarray(num_h)[:, 128:256] == 0.0)
    assert np.all(np.asarray(num_h)[:, 384:512] == 0.0)

    pw = [jnp.asarray(a) for a in ts.sweep_plan(rows, cols, 512 // 128, "row")]
    num_w = ts.w_numerator(
        jnp.asarray(w), jnp.asarray(h), tx.tiles, *pw, eps, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(num_w), z @ h.T, rtol=1e-5, atol=1e-6
    )


def test_tile_sparse_sweep_plan_invariants(tile_problem):
    from nmf_tpu.models.sparse_tiled import tiles_from_dense
    from nmf_tpu.ops.pallas import tile_sparse as ts

    x, _, _ = tile_problem
    tx = tiles_from_dense(x, tile=(128, 128))
    rows, cols = np.asarray(tx.rows), np.asarray(tx.cols)
    perm, rr, cc = ts.sweep_plan(rows, cols, 5, "col")
    # sorted by output block; every block present exactly once as a run
    assert np.all(np.diff(cc) >= 0)
    assert set(cc.tolist()) == set(range(5))
    # sentinels mark exactly the empty blocks
    assert set(cc[perm < 0].tolist()) == {1, 3}
    # real entries cover every tile exactly once
    assert sorted(perm[perm >= 0].tolist()) == list(range(len(rows)))


def test_tile_sparse_backend_rule():
    from nmf_tpu.ops.pallas import tile_sparse as ts
    from nmf_tpu.utils.config import Precision

    # off-TPU (this CI runs on CPU): never supported, never preferred
    assert not ts.supported(128, 128, 128, Precision())
    assert not ts.preferred(128, 128, 128, Precision())


def test_plan_launch_respects_explicit_block_m():
    """An explicitly passed block_m is never bumped by the single-N-tile
    heuristic (tuning sweeps must measure the tile they asked for)."""
    xq = jnp.zeros((1, 1), jnp.float32)
    prec = Precision()
    bm, bn, mp, np_, _, _ = fused_mu._plan_launch(
        4096, 350, 128, xq, prec, 256, 1024, jnp.float32
    )
    assert bm <= 256
    bm_auto, *_ = fused_mu._plan_launch(
        4096, 350, 128, xq, prec, None, 1024, jnp.float32
    )
    assert bm_auto > 256  # the default-path deepening still applies


def test_plan_launch_bf16_state_quantum():
    """bf16 W/H blocks need 16-row sublane alignment even when X is f32."""
    xq = jnp.zeros((1, 1), jnp.float32)
    prec = Precision(matmul_dtype="bfloat16", state_dtype="bfloat16")
    for m in (1025, 777, 96):
        bm, *_ = fused_mu._plan_launch(
            m, 512, 128, xq, prec, None, None, jnp.bfloat16
        )
        assert bm % 16 == 0, (m, bm)


def test_tile_sparse_supported_bf16_state(monkeypatch):
    """supported() must reject 8-row tiles when the state is bf16."""
    import jax

    from nmf_tpu.ops.pallas import tile_sparse

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    f32 = Precision()
    bf16_state = Precision(matmul_dtype="bfloat16", state_dtype="bfloat16")
    assert tile_sparse.supported(128, 8, 128, f32)
    assert not tile_sparse.supported(128, 8, 128, bf16_state)
    assert tile_sparse.supported(128, 16, 128, bf16_state)


def test_tile_sparse_empty_tiles_raises():
    from nmf_tpu.ops.pallas import tile_sparse

    w = jnp.ones((16, 8), jnp.float32)
    h = jnp.ones((8, 128), jnp.float32)
    tiles = jnp.zeros((0, 16, 128), jnp.float32)
    perm, rb, cb = tile_sparse.sweep_plan(
        np.array([], np.int32), np.array([], np.int32), 1, "col"
    )
    with pytest.raises(ValueError, match="at least one tile"):
        tile_sparse.h_numerator(
            w, h, tiles, jnp.asarray(perm), jnp.asarray(rb), jnp.asarray(cb),
            2.2204e-16, interpret=True,
        )
