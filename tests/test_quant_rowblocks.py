"""Per-row-block int8 scales (``Precision(x_dtype='int8', x_quant_rows=N)``).

One f32 scale per (N-row block, column) instead of per column: bounds each
entry's quantization error by ITS BLOCK's column peak / 510 — the accuracy
fix for data whose magnitude varies along the row axis (reference analog:
the spectrogram X of nmf.cu has per-frame columns; a row-varying magnitude
profile is the transposed layout users hit in practice).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nmf_tpu import SolveConfig, solve
from nmf_tpu.ops import quant
from nmf_tpu.utils.config import Precision

from oracle import clamp

EPS = float(np.float32(2.2204e-16))


def _row_varying(rng, m, n, decades=3):
    """Entries span `decades` orders of magnitude ALONG THE ROWS — the case
    per-column scales handle worst (one loud row crushes the whole column's
    resolution)."""
    return clamp(
        (rng.rand(m, n) * np.logspace(0, decades, m)[:, None]).astype(
            np.float32
        )
    )


@pytest.fixture(scope="module")
def problem():
    rng = np.random.RandomState(7)
    m, k, n = 96, 12, 130
    x = _row_varying(rng, m, n)
    w = clamp(rng.rand(m, k).astype(np.float32))
    h = clamp(rng.rand(k, n).astype(np.float32))
    return x, jnp.asarray(w), jnp.asarray(h)


# ---------------------------------------------------------------- kernels


def test_rowblock_roundtrip_error_bound(problem):
    x, _, _ = problem
    q, s = quant.quantize_rowblocks(jnp.asarray(x), EPS, 32)
    assert q.dtype == jnp.uint8
    assert s.shape == (3, x.shape[1])  # ceil(96/32) row blocks
    dq = np.asarray(quant.dequantize(q, s))
    # per-entry error <= half a step of ITS BLOCK's scale (a hair over 0.5
    # from f32 arithmetic in the scale/ratio themselves)
    sn = np.asarray(s)
    bound = np.repeat(sn, 32, axis=0)[: x.shape[0]] * 0.51 + 1e-9
    np.testing.assert_array_less(np.abs(dq - x), bound)


def test_rowblock_beats_per_column_on_row_varying_data(problem):
    """The whole point of the knob: on row-varying data the block-local
    scales reconstruct the quiet rows far better than per-column scales."""
    x, _, _ = problem
    qc, sc = quant.quantize_columns(jnp.asarray(x), EPS)
    qr, sr = quant.quantize_rowblocks(jnp.asarray(x), EPS, 16)
    err_col = np.abs(np.asarray(quant.dequantize(qc, sc)) - x)
    err_row = np.abs(np.asarray(quant.dequantize(qr, sr)) - x)
    # quiet third of the rows: relative error must improve by >= 10x
    quiet = slice(0, x.shape[0] // 3)
    rel_col = (err_col[quiet] / x[quiet]).mean()
    rel_row = (err_row[quiet] / x[quiet]).mean()
    assert rel_row * 10 < rel_col
    # and globally never worse
    assert err_row.mean() <= err_col.mean()


def test_rowblock_nondivisible_block_size_normalized():
    """M=10, rows_per_block=8: naive ceil-division would quantize blocks
    (8, 2) but dequantize as (5, 5), scaling rows 5-7 by the wrong block.
    quantize_rowblocks normalizes to ceil(M / ceil(M / rb)) so the two
    always agree — the roundtrip bound must hold for every row."""
    rng = np.random.RandomState(3)
    x = clamp((rng.rand(10, 7) * np.logspace(0, 3, 10)[:, None]).astype(
        np.float32
    ))
    q, s = quant.quantize_rowblocks(jnp.asarray(x), EPS, 8)
    assert s.shape[0] == 2  # same block COUNT as requested
    dq = np.asarray(quant.dequantize(q, s))
    rb = -(-x.shape[0] // s.shape[0])
    bound = np.asarray(s)[np.arange(x.shape[0]) // rb] * 0.51 + 1e-9
    np.testing.assert_array_less(np.abs(dq - x), bound)


def test_rowblock_single_block_matches_per_row_limit():
    """rows_per_block >= M degenerates to one block whose scales are the
    per-column scales: codes must equal quantize_columns'."""
    rng = np.random.RandomState(5)
    x = clamp(rng.rand(24, 9).astype(np.float32))
    qc, sc = quant.quantize_columns(jnp.asarray(x), EPS)
    qr, sr = quant.quantize_rowblocks(jnp.asarray(x), EPS, 64)
    assert sr.shape == (1, 9)
    np.testing.assert_array_equal(np.asarray(qr), np.asarray(qc))
    np.testing.assert_allclose(np.asarray(sr)[0], np.asarray(sc), rtol=1e-7)


def test_quantize_policy_dispatch(problem):
    x, _, _ = problem
    qc, sc = quant.quantize_policy(jnp.asarray(x), EPS, 0)
    assert sc.ndim == 1
    qr, sr = quant.quantize_policy(jnp.asarray(x), EPS, 32)
    assert sr.ndim == 2


# ----------------------------------------------------------------- config


def test_precision_validation():
    with pytest.raises(ValueError, match="x_quant_rows"):
        SolveConfig(precision=Precision(x_quant_rows=-1)).validate()
    with pytest.raises(ValueError, match="requires x_dtype"):
        SolveConfig(precision=Precision(x_quant_rows=8)).validate()
    SolveConfig(
        precision=Precision(x_dtype="int8", x_quant_rows=8)
    ).validate()


# ---------------------------------------------------------------- solvers


def _cfg(rows, **kw):
    kw.setdefault("max_iter", 30)
    kw.setdefault("check_every", 10)
    return SolveConfig(
        precision=Precision(x_dtype="int8", x_quant_rows=rows), **kw
    )


def test_solve_rowblocks_tracks_f32(problem):
    x, w, h = problem
    res = solve(x, w, h, _cfg(32))
    ref = solve(x, w, h, SolveConfig(max_iter=30, check_every=10))
    assert int(res.iterations) == 30
    assert abs(float(res.cost) - float(ref.cost)) / float(ref.cost) < 0.01
    # deterministic
    res2 = solve(x, w, h, _cfg(32))
    np.testing.assert_array_equal(np.asarray(res.w), np.asarray(res2.w))


def test_solve_rowblocks_closer_to_f32_than_per_column(problem):
    """Finer scales => the int8 run's final cost tracks the f32 run more
    closely than the per-column int8 run does (row-varying data)."""
    x, w, h = problem
    f32 = float(solve(x, w, h, SolveConfig(max_iter=30, check_every=10)).cost)
    col = float(
        solve(
            x, w, h,
            SolveConfig(
                max_iter=30, check_every=10,
                precision=Precision(x_dtype="int8"),
            ),
        ).cost
    )
    blk = float(solve(x, w, h, _cfg(16)).cost)
    assert abs(blk - f32) < abs(col - f32)


def test_h_only_rowblocks(problem):
    from nmf_tpu.models.nmf import solve_h_only

    x, w, h = problem
    res = solve_h_only(x, w, h, _cfg(32, max_iter=20))
    ref = solve_h_only(
        x, w, h, SolveConfig(max_iter=20, check_every=10)
    )
    assert abs(float(res.cost) - float(ref.cost)) / float(ref.cost) < 0.01


def test_masked_rowblocks(problem):
    from nmf_tpu import solve_masked

    x, w, h = problem
    rng = np.random.RandomState(11)
    mask = (rng.rand(*x.shape) > 0.25).astype(np.float32)
    res = solve_masked(x, w, h, mask, _cfg(32, max_iter=20))
    ref = solve_masked(
        x, w, h, mask, SolveConfig(max_iter=20, check_every=10)
    )
    assert np.isfinite(float(res.cost))
    assert abs(float(res.cost) - float(ref.cost)) / float(ref.cost) < 0.02


def test_batched_rowblocks_matches_single_solves(problem):
    from nmf_tpu.parallel import batched

    x, w, h = problem
    rng = np.random.RandomState(8)
    B = 2
    xs = np.stack(
        [_row_varying(rng, x.shape[0], x.shape[1]) for _ in range(B)]
    )
    ws = clamp(rng.rand(B, w.shape[0], w.shape[1]).astype(np.float32))
    hs = clamp(rng.rand(B, h.shape[0], h.shape[1]).astype(np.float32))
    cfg = _cfg(32, max_iter=15, check_every=5)
    res = batched.solve_batched(xs, ws, hs, cfg)
    for b in range(B):
        ref = solve(xs[b], ws[b], hs[b], cfg)
        np.testing.assert_allclose(
            np.asarray(res.w[b]), np.asarray(ref.w), rtol=5e-5, atol=1e-7
        )


def test_restarts_rowblocks(problem):
    """Selection shares ONE set of codes across members; row-block scales
    ride the same path."""
    from nmf_tpu import solve_restarts

    x, _, _ = problem
    res = solve_restarts(
        x, rank=6, n_restarts=3, config=_cfg(32, max_iter=10, check_every=5),
        seed=0,
    )
    assert np.isfinite(float(np.min(np.asarray(res.costs))))


def test_checkpoint_rowblocks_single_device(tmp_path, problem):
    """The segmented checkpoint driver honors the policy (single device)."""
    from nmf_tpu.utils import checkpoint as ckpt

    x, w, h = problem
    cfg = _cfg(32, max_iter=20, check_every=10)
    state = ckpt.solve_with_checkpoints(
        np.asarray(x), np.asarray(w), np.asarray(h), cfg,
        str(tmp_path / "ck"), every=10,
    )
    ref = solve(x, w, h, cfg)
    # segment re-entry round-trips device<->host; fp noise only
    np.testing.assert_allclose(
        np.asarray(state.w), np.asarray(ref.w), rtol=5e-5, atol=1e-7
    )


# ------------------------------------------------------------- boundaries


def _mesh_problem(problem):
    """Slice the fixture to mesh-divisible dims (96 x 128 over a 2x2 mesh:
    48-row shards vs 32-row quant blocks — deliberately misaligned, so the
    local dequant must gather across a block boundary)."""
    x, w, h = problem
    return np.asarray(x)[:96, :128], np.asarray(w), np.asarray(h)[:, :128]


def test_mesh_solver_matches_single_device(problem):
    """solve_sharded honors x_quant_rows: the replicated-row-block scale
    table dequantizes each shard's rows by THEIR blocks, so the mesh run
    tracks the single-device row-block run to reduction-order noise."""
    from nmf_tpu.parallel import make_mesh, sharded

    x, w, h = _mesh_problem(problem)
    cfg = _cfg(32, max_iter=10, check_every=5)
    res = sharded.solve_sharded(x, w, h, cfg, mesh=make_mesh(shape=(2, 2)))
    ref = solve(x, w, h, cfg)
    np.testing.assert_allclose(
        np.asarray(res.w), np.asarray(ref.w), rtol=5e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        float(res.cost), float(ref.cost), rtol=5e-5
    )


def test_mesh_solver_rowblocks_differ_from_per_column(problem):
    """Sanity that the mesh path really dequantized with the BLOCK scales:
    on row-varying data the row-block mesh solve must differ from the
    per-column mesh solve (else the 2-D table was misread)."""
    from nmf_tpu.parallel import make_mesh, sharded

    x, w, h = _mesh_problem(problem)
    mesh = make_mesh(shape=(2, 2))
    blk = sharded.solve_sharded(x, w, h, _cfg(32, max_iter=10), mesh=mesh)
    col = sharded.solve_sharded(x, w, h, _cfg(0, max_iter=10), mesh=mesh)
    assert not np.allclose(np.asarray(blk.w), np.asarray(col.w), rtol=1e-4)


def test_h_only_mesh_rowblocks(problem):
    from nmf_tpu.models.nmf import solve_h_only
    from nmf_tpu.parallel import make_mesh

    x, w, h = _mesh_problem(problem)
    cfg = _cfg(32, max_iter=10, check_every=5)
    res = solve_h_only(x, w, h, cfg, mesh=make_mesh(shape=(2, 2)))
    ref = solve_h_only(x, w, h, cfg)
    np.testing.assert_allclose(
        np.asarray(res.h), np.asarray(ref.h), rtol=5e-5, atol=1e-7
    )


def test_masked_mesh_rowblocks(problem):
    from nmf_tpu import solve_masked
    from nmf_tpu.parallel import make_mesh

    x, w, h = _mesh_problem(problem)
    rng = np.random.RandomState(13)
    mask = (rng.rand(*x.shape) > 0.25).astype(np.float32)
    cfg = _cfg(32, max_iter=10, check_every=5)
    res = solve_masked(x, w, h, mask, cfg, mesh=make_mesh(shape=(2, 2)))
    ref = solve_masked(x, w, h, mask, cfg)
    np.testing.assert_allclose(
        np.asarray(res.w), np.asarray(ref.w), rtol=5e-5, atol=1e-7
    )


def test_semi_mesh_rowblocks(problem):
    """The semi-adaptive (frozen template columns) mesh builder routes
    through _sharded_family_fns' shared dequant wrap."""
    from nmf_tpu.models.semi import solve_semi
    from nmf_tpu.parallel import make_mesh

    x, w, h = _mesh_problem(problem)
    cfg = _cfg(32, max_iter=10, check_every=5)
    res = solve_semi(x, w, h, cfg, n_frozen=4, mesh=make_mesh(shape=(2, 2)))
    ref = solve_semi(x, w, h, cfg, n_frozen=4)
    np.testing.assert_allclose(
        np.asarray(res.w), np.asarray(ref.w), rtol=5e-5, atol=1e-7
    )


def test_masked_h_only_mesh_rowblocks(problem):
    """The masked h-only mesh builder's dq closure honors the 2-D table."""
    from nmf_tpu.models.masked import solve_masked_h_only
    from nmf_tpu.parallel import make_mesh

    x, w, h = _mesh_problem(problem)
    rng = np.random.RandomState(17)
    mask = (rng.rand(*x.shape) > 0.25).astype(np.float32)
    cfg = _cfg(32, max_iter=10, check_every=5)
    res = solve_masked_h_only(
        x, w, h, mask, cfg, mesh=make_mesh(shape=(2, 2))
    )
    ref = solve_masked_h_only(x, w, h, mask, cfg)
    np.testing.assert_allclose(
        np.asarray(res.h), np.asarray(ref.h), rtol=5e-5, atol=1e-7
    )


def test_shard_problem_places_2d_scales(problem):
    """shard_problem replicates the scale table's row axis over 'mr' and
    shards its columns over 'mc' — so every row shard holds all block rows."""
    from nmf_tpu.parallel import make_mesh
    from nmf_tpu.parallel.mesh import shard_problem

    x, w, h = _mesh_problem(problem)
    pair = quant.quantize_rowblocks(jnp.asarray(x), EPS, 32)
    mesh = make_mesh(shape=(2, 2))
    (q, s), _, _ = shard_problem(pair, w, h, mesh)
    assert q.shape == x.shape and s.shape == (3, x.shape[1])
    # local scale shards span ALL 3 block rows, half the columns
    shard_shapes = {sh.data.shape for sh in s.addressable_shards}
    assert shard_shapes == {(3, x.shape[1] // 2)}
    np.testing.assert_array_equal(np.asarray(s), np.asarray(pair[1]))


def test_streaming_rowblocks_matches_in_memory(problem):
    """solve_out_of_core honors x_quant_rows: a streamed column chunk spans
    ALL M rows, so its host-quantized per-(row-block, column) table is
    exactly the in-memory layout's table for those columns — same codes,
    same math, tight agreement with the in-memory row-block solve."""
    from nmf_tpu import solve_out_of_core

    x, w, h = problem
    cfg = _cfg(32, max_iter=20, check_every=10)
    res = solve_out_of_core(
        np.asarray(x), np.asarray(w), np.asarray(h), cfg, block_n=64
    )
    ref = solve(x, w, h, cfg)
    np.testing.assert_allclose(
        np.asarray(res.w), np.asarray(ref.w), rtol=1e-5, atol=1e-7
    )


def test_streaming_rowblocks_on_mesh(problem):
    """Mesh streaming with row-block scales: each chunk's (R, n_b) table
    rides the replicated-'mr' placement and shard-local gather; matches
    the single-device row-block stream."""
    from nmf_tpu import solve_out_of_core
    from nmf_tpu.parallel import make_mesh

    x, w, h = _mesh_problem(problem)
    cfg = _cfg(32, max_iter=10, check_every=5)
    ref = solve_out_of_core(x, np.asarray(w), np.asarray(h), cfg, block_n=64)
    res = solve_out_of_core(
        x, np.asarray(w), np.asarray(h), cfg, block_n=64,
        mesh=make_mesh(shape=(2, 2)),
    )
    np.testing.assert_allclose(
        np.asarray(res.w), np.asarray(ref.w), rtol=5e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(res.cost_history), np.asarray(ref.cost_history), rtol=1e-5
    )


def test_transform_ooc_rowblocks(problem):
    """transform_out_of_core honors x_quant_rows; per-block H-only solves
    of the quantized chunks match the in-memory h-only row-block solve
    (H columns are independent given fixed W)."""
    from nmf_tpu import solve_h_only
    from nmf_tpu.models.streaming import transform_out_of_core

    x, w, h = problem
    cfg = _cfg(32, max_iter=10, check_every=5)
    res = transform_out_of_core(
        np.asarray(x), np.asarray(w), h0=np.asarray(h), config=cfg,
        block_n=64,
    )
    ref = solve_h_only(x, w, h, cfg)
    np.testing.assert_allclose(
        np.asarray(res.h), np.asarray(ref.h), rtol=5e-5, atol=1e-7
    )


def test_online_rowblocks_degenerate_matches_per_column(problem):
    """solve_online honors x_quant_rows; rows_per_block >= M degenerates to
    one block whose codes are bit-identical to per-column quantization, so
    the learned dictionary matches the per-column online run."""
    from nmf_tpu import solve_online

    x, w, _ = problem
    kw = dict(block_n=64, inner_iters=5, seed=3)
    col = solve_online(
        np.asarray(x), np.asarray(w),
        SolveConfig(precision=Precision(x_dtype="int8")), **kw
    )
    one = solve_online(np.asarray(x), np.asarray(w), _cfg(128), **kw)
    np.testing.assert_allclose(one.w, col.w, rtol=1e-6, atol=1e-9)
    # fine blocks: runs, finite, and still learns (close to the f32 stream)
    f32 = solve_online(np.asarray(x), np.asarray(w), SolveConfig(), **kw)
    fine = solve_online(np.asarray(x), np.asarray(w), _cfg(16), **kw)
    assert np.isfinite(fine.w).all()
    assert np.abs(fine.w - f32.w).max() / f32.w.max() < 0.05


def test_online_rowblocks_on_mesh(problem):
    from nmf_tpu import solve_online
    from nmf_tpu.parallel import make_mesh

    x, w, _ = _mesh_problem(problem)
    cfg = _cfg(32)
    kw = dict(block_n=64, inner_iters=5, seed=1)
    single = solve_online(x, np.asarray(w), cfg, **kw)
    meshed = solve_online(
        x, np.asarray(w), cfg, mesh=make_mesh(shape=(2, 2)), **kw
    )
    np.testing.assert_allclose(
        meshed.w, single.w, rtol=5e-5, atol=1e-6 * float(single.w.max())
    )


def test_streaming_pallas_backend_raises(problem):
    """The fused kernels' scales operand is per-column; the streamed/online
    entries reject backend='pallas' + x_quant_rows loudly at the boundary."""
    from nmf_tpu import solve_online, solve_out_of_core

    x, w, h = problem
    cfg = _cfg(32, max_iter=10, backend="pallas")
    with pytest.raises(NotImplementedError, match="x_quant_rows"):
        solve_out_of_core(np.asarray(x), np.asarray(w), np.asarray(h), cfg)
    # solve_online rejects backend='pallas' outright (its statistics-folded
    # updates never had a fused path), before the x_quant_rows combination
    # is even considered
    with pytest.raises(NotImplementedError, match="pallas"):
        solve_online(np.asarray(x), np.asarray(w), config=cfg)


def test_pallas_backend_raises(problem):
    from nmf_tpu.models.solver import resolve_step_fn

    with pytest.raises(NotImplementedError, match="per-column"):
        resolve_step_fn(_cfg(32, backend="pallas"), platform="tpu")


def test_cli_x_quant_rows(tmp_path, problem):
    """`run --x-dtype int8 --x-quant-rows N` reproduces the library solve."""
    from nmf_tpu.cli import main as cli_main
    from nmf_tpu.io import binio

    x, w, h = problem
    paths = {}
    for name, arr in zip("XWH", (x, np.asarray(w), np.asarray(h))):
        p = tmp_path / f"{name}.bin"
        binio.write_matrix(np.asarray(arr), p)
        paths[name] = str(p)
    wout, hout = str(tmp_path / "Wo.bin"), str(tmp_path / "Ho.bin")
    rc = cli_main(
        [
            "run", paths["X"], paths["W"], paths["H"], "-o", wout, hout,
            "--x-dtype", "int8", "--x-quant-rows", "32",
            "--max-iter", "10", "-q",
        ]
    )
    assert rc == 0
    ref = solve(x, w, h, _cfg(32, max_iter=10, check_every=25))
    np.testing.assert_array_equal(
        binio.read_matrix(wout), np.asarray(ref.w)
    )


def test_checkpoint_mesh_rowblocks(tmp_path, problem):
    """The mesh checkpoint driver honors the policy: segmented sharded
    solve with row-block int8 X matches the uninterrupted sharded solve."""
    from nmf_tpu.parallel import make_mesh, sharded
    from nmf_tpu.utils import checkpoint as ckpt

    x, w, h = _mesh_problem(problem)
    cfg = _cfg(32, max_iter=20, check_every=10)
    mesh = make_mesh(shape=(2, 2))
    state = ckpt.solve_with_checkpoints(
        x, w, h, cfg, str(tmp_path / "ck"), every=10, mesh=mesh
    )
    ref = sharded.solve_sharded(x, w, h, cfg, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(state.w), np.asarray(ref.w), rtol=5e-5, atol=1e-7
    )


def test_dequantize_rows_matches_full_dequant():
    """dequantize_rows on an arbitrary row slice == the full dequant sliced
    (the block size must come from the full extent, not the slice)."""
    import jax.numpy as jnp

    from nmf_tpu.ops import quant

    rng = np.random.RandomState(11)
    m, n, rows = 100, 7, 10
    x = (rng.rand(m, n) * np.logspace(0, 2, m)[:, None]).astype(np.float32)
    q, s = quant.quantize_rowblocks_np(x, EPS, rows)
    full = np.asarray(quant.dequantize(jnp.asarray(q), jnp.asarray(s)))
    lo, hi = 37, 63  # straddles block boundaries at 40/50/60
    part = np.asarray(
        quant.dequantize_rows(jnp.asarray(q[lo:hi]), jnp.asarray(s), lo, m)
    )
    np.testing.assert_array_equal(part, full[lo:hi])
    # the trap dequantize_rows exists to avoid: a local-extent derivation
    # of the block size really does mis-scale rows past the first block
    wrong = np.asarray(quant.dequantize(jnp.asarray(q[lo:hi]), jnp.asarray(s)))
    assert not np.array_equal(wrong, full[lo:hi])
