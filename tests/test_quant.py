"""Quantized X storage (uint8 codes + per-column scales)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nmf_tpu import SolveConfig, solve
from nmf_tpu.ops import quant
from nmf_tpu.ops.pallas import fused_mu
from nmf_tpu.utils.config import Precision

from oracle import clamp

EPS = float(np.float32(2.2204e-16))


@pytest.fixture(scope="module")
def problem():
    rng = np.random.RandomState(41)
    m, k, n = 96, 12, 130
    # span a few orders of magnitude per column to exercise the scales
    x = (rng.rand(m, n) * np.logspace(0, 2, n)[None, :]).astype(np.float32)
    w = clamp(rng.rand(m, k).astype(np.float32))
    h = clamp(rng.rand(k, n).astype(np.float32))
    return clamp(x), jnp.asarray(w), jnp.asarray(h)


def test_quantize_roundtrip_error_bound(problem):
    x, _, _ = problem
    q, s = quant.quantize_columns(jnp.asarray(x), EPS)
    assert q.dtype == jnp.uint8
    dq = np.asarray(quant.dequantize(q, s))
    # absolute error per entry ~ half a step of its column's scale (a hair
    # over 0.5 from f32 arithmetic in the scale/ratio themselves)
    bound = np.broadcast_to(np.asarray(s)[None, :] * 0.51 + 1e-9, x.shape)
    np.testing.assert_array_less(np.abs(dq - x), bound)
    # numpy twin agrees bitwise
    qn, sn = quant.quantize_columns_np(x, EPS)
    np.testing.assert_array_equal(np.asarray(q), qn)
    np.testing.assert_allclose(np.asarray(s), sn, rtol=1e-7)


def test_fused_kernels_dequantize_in_register(problem):
    """Fused quantized updates == jnp updates on the dequantized values
    (the quantization is the only approximation; the kernels add none)."""
    from nmf_tpu.ops.mu import update_h, update_w

    x, w, h = problem
    q, s = quant.quantize_columns(jnp.asarray(x), EPS)
    dq = quant.dequantize(q, s)

    ours = fused_mu.update_h_fused(
        w, h, (q, s), interpret=True, block_m=32, block_n=128
    )
    ref = update_h(w, h, dq)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-7)

    ours = fused_mu.update_w_fused(
        w, h, (q, s), interpret=True, block_m=32, block_n=128
    )
    ref = update_w(w, h, dq)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-7)

    # numerator-only (sharded building block) handles quantized X too
    from nmf_tpu.ops.mu import matmul
    from nmf_tpu.ops.elementwise import eps_clamp

    z = dq / eps_clamp(matmul(w, h, Precision()), EPS)
    ref_num = matmul(w, z, Precision(), transpose_a=True)
    ours_num = fused_mu.update_h_fused(
        w, h, (q, s), numerator_only=True, interpret=True, block_m=32, block_n=128
    )
    np.testing.assert_allclose(
        np.asarray(ours_num), np.asarray(ref_num), rtol=1e-5, atol=1e-6
    )


def test_fused_cost_quantized(problem):
    from nmf_tpu.ops.divergence import kl_divergence

    x, w, h = problem
    q, s = quant.quantize_columns(jnp.asarray(x), EPS)
    ours = fused_mu.kl_cost_fused(
        (q, s), w, h, interpret=True, block_m=32, block_n=128
    )
    ref = kl_divergence(quant.dequantize(q, s), w, h)
    assert float(ours) == pytest.approx(float(ref), rel=1e-5)


def test_solve_with_int8_x(problem):
    """End-to-end: x_dtype='int8' factorizes the quantized data; the result
    tracks the f32 run to quantization-grade accuracy."""
    x, w, h = problem
    cfg8 = SolveConfig(
        max_iter=40, check_every=10,
        precision=Precision(x_dtype="int8"),
    )
    res = solve(x, w, h, cfg8)
    ref = solve(x, w, h, SolveConfig(max_iter=40, check_every=10))
    assert int(res.iterations) == 40
    assert np.isfinite(float(res.cost))
    # ~0.2%-grade data rounding -> sub-percent cost agreement
    assert abs(float(res.cost) - float(ref.cost)) / float(ref.cost) < 0.01
    # and the quantized run is itself deterministic
    res2 = solve(x, w, h, cfg8)
    np.testing.assert_array_equal(np.asarray(res.w), np.asarray(res2.w))


def test_int8_x_sharded_matches_single_device(problem):
    """Quantized X on a mesh: codes shard like X, scales over 'mc'; the
    local dequant reproduces the single-device quantized run."""
    from nmf_tpu.parallel import make_mesh, sharded

    x, w, h = problem
    x = np.asarray(x)[:96, :128]  # mesh-divisible slice
    w, h = np.asarray(w), np.asarray(h)[:, :128]
    cfg = SolveConfig(max_iter=20, check_every=10, precision=Precision(x_dtype="int8"))
    ref = solve(x, w, h, cfg)
    for shape in ((4, 2), (2, 4)):
        res = sharded.solve_sharded(x, w, h, cfg, mesh=make_mesh(shape=shape))
        np.testing.assert_allclose(
            np.asarray(res.w), np.asarray(ref.w), rtol=5e-5, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(res.cost_history), np.asarray(ref.cost_history), rtol=1e-5
        )


def test_int8_x_h_only(problem):
    from nmf_tpu.models.nmf import solve_h_only

    x, w, h = problem
    cfg = SolveConfig(max_iter=20, check_every=10, precision=Precision(x_dtype="int8"))
    res = solve_h_only(x, w, h, cfg)
    ref = solve_h_only(x, w, h, SolveConfig(max_iter=20, check_every=10))
    assert int(res.iterations) == 20
    assert abs(float(res.cost) - float(ref.cost)) / float(ref.cost) < 0.01


def test_int8_x_checkpointed_on_mesh(tmp_path, problem):
    """The checkpointed driver composes mesh + int8 X: segments route the
    (codes, scales) pair through solve_sharded's quantized placement."""
    from nmf_tpu import SolveConfig
    from nmf_tpu.parallel import make_mesh
    from nmf_tpu.utils import checkpoint as ckpt

    x, w, h = problem
    x = np.asarray(x)[:96, :128]
    w, h = np.asarray(w), np.asarray(h)[:, :128]
    cfg = SolveConfig(max_iter=20, check_every=10, precision=Precision(x_dtype="int8"))
    state = ckpt.solve_with_checkpoints(
        x, w, h, cfg, str(tmp_path / "ck"), every=10, mesh=make_mesh(shape=(4, 2))
    )
    assert state.iteration == 20
    ref = solve(x, w, h, cfg)
    np.testing.assert_allclose(
        np.asarray(state.w), np.asarray(ref.w), rtol=5e-5, atol=1e-7
    )


def test_int8_x_h_only_on_mesh_matches_single_device():
    """Mesh int8 h-only: each shard dequantizes its (codes, scales) block —
    identical quantized data, so the mesh result tracks single-device int8
    to collective-summation fp noise."""
    rng = np.random.RandomState(1)
    x = rng.rand(32, 48).astype(np.float32)
    w = rng.rand(32, 4).astype(np.float32)
    h = rng.rand(4, 48).astype(np.float32)
    cfg = SolveConfig(
        max_iter=15, check_every=5, precision=Precision(x_dtype="int8")
    )
    from nmf_tpu.models.nmf import solve_h_only
    from nmf_tpu.parallel import make_mesh

    single = solve_h_only(x, w, h, cfg)
    meshed = solve_h_only(x, w, h, cfg, mesh=make_mesh(shape=(2, 2)))
    np.testing.assert_allclose(
        np.asarray(meshed.h), np.asarray(single.h), rtol=5e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        float(meshed.cost), float(single.cost), rtol=1e-5
    )


def test_int8_x_batched_matches_single_solves(problem):
    """Batched int8: per-member column quantization == a loop of int8
    single solves (identical quantized data; vmap only batches)."""
    from nmf_tpu.parallel import batched

    x, w, h = problem
    rng = np.random.RandomState(8)
    B = 3
    xs = np.stack([
        clamp((rng.rand(*x.shape) * np.logspace(0, 2, x.shape[1])[None, :])
              .astype(np.float32))
        for _ in range(B)
    ])
    ws = clamp(rng.rand(B, w.shape[0], w.shape[1]).astype(np.float32))
    hs = clamp(rng.rand(B, h.shape[0], h.shape[1]).astype(np.float32))
    cfg = SolveConfig(
        max_iter=15, check_every=5, precision=Precision(x_dtype="int8")
    )
    res = batched.solve_batched(xs, ws, hs, cfg)
    for b in range(B):
        ref = solve(xs[b], ws[b], hs[b], cfg)
        np.testing.assert_allclose(
            np.asarray(res.w[b]), np.asarray(ref.w), rtol=5e-5, atol=1e-7
        )
        assert float(res.cost[b]) == pytest.approx(float(ref.cost), rel=1e-5)


def test_prequantized_pair_default_clamp_inputs(problem):
    """solve() accepts a pre-quantized (codes, scales) pair under the DEFAULT
    clamp_inputs=True: the pair passes through prep (values were clamped at
    quantize time) and the result matches handing solve() the float X."""
    x, w, h = problem
    cfg = SolveConfig(
        max_iter=8, check_every=4, precision=Precision(x_dtype="int8")
    )
    pair = quant.quantize_policy(jnp.asarray(x), EPS, 0)
    res_pair = solve(pair, w, h, cfg)           # default clamp_inputs=True
    # same pair through the documented pre-clamped entry: identical solve
    # (w/h of the fixture are already clamped, so prep is a no-op on them);
    # fresh copies because clamp_inputs=False donates the caller's buffers
    res_ref = solve(pair, w + 0, h + 0, cfg, clamp_inputs=False)
    np.testing.assert_array_equal(np.asarray(res_pair.w), np.asarray(res_ref.w))
    np.testing.assert_array_equal(np.asarray(res_pair.h), np.asarray(res_ref.h))
    assert float(res_pair.cost) == float(res_ref.cost)
    # and it tracks the float-X int8 solve (quantization happened in-jit
    # there, so bit-identity is not expected — closeness is)
    res_full = solve(x, w, h, cfg)
    np.testing.assert_allclose(
        np.asarray(res_pair.w), np.asarray(res_full.w), rtol=2e-2, atol=1e-4
    )


def test_prequantized_pair_requires_int8_precision(problem):
    """A (codes, scales) pair without x_dtype='int8' is a loud error, not an
    opaque trace-time crash."""
    x, w, h = problem
    pair = quant.quantize_policy(jnp.asarray(x), EPS, 0)
    with pytest.raises(ValueError, match="x_dtype='int8'"):
        solve(pair, w, h, SolveConfig(max_iter=4))


def test_prequantized_scales_ndim_must_match_policy(problem):
    """2-D row-block scales with a per-column config (and vice versa) are
    rejected at the boundary — the compiled dequant path is config-keyed."""
    x, w, h = problem
    cfg_cols = SolveConfig(max_iter=4, precision=Precision(x_dtype="int8"))
    pair_blocks = quant.quantize_policy(jnp.asarray(x), EPS, 32)
    with pytest.raises(ValueError, match="x_quant_rows"):
        solve(pair_blocks, w, h, cfg_cols)
    cfg_blocks = SolveConfig(
        max_iter=4, precision=Precision(x_dtype="int8", x_quant_rows=32)
    )
    pair_cols = quant.quantize_policy(jnp.asarray(x), EPS, 0)
    with pytest.raises(ValueError, match="x_quant_rows"):
        solve(pair_cols, w, h, cfg_blocks)


def test_h_only_accepts_prequantized_pair(problem):
    """solve_h_only takes the same (codes, scales) pair solve() does — the
    repeated-transform workflow quantizes X once."""
    from nmf_tpu.models.nmf import solve_h_only

    x, w, h = problem
    cfg = SolveConfig(
        max_iter=8, check_every=4, precision=Precision(x_dtype="int8")
    )
    pair = quant.quantize_policy(jnp.asarray(x), EPS, 0)
    res_pair = solve_h_only(pair, w, h + 0, cfg)
    res_full = solve_h_only(x, w, h + 0, cfg)
    np.testing.assert_allclose(
        np.asarray(res_pair.h), np.asarray(res_full.h), rtol=2e-2, atol=1e-4
    )
    with pytest.raises(ValueError, match="x_dtype='int8'"):
        solve_h_only(pair, w, h + 0, SolveConfig(max_iter=4))
    with pytest.raises(ValueError, match="x_quant_rows"):
        solve_h_only(
            pair, w, h + 0,
            SolveConfig(max_iter=4,
                        precision=Precision(x_dtype="int8", x_quant_rows=32)),
        )


def test_h_only_pallas_rowblocks_raises(problem):
    """Explicit pallas + per-row-block scales is rejected on the transform
    path exactly like resolve_step_fn rejects it on the solve path."""
    from nmf_tpu.models.nmf import _h_only_step_cost

    with pytest.raises(NotImplementedError, match="x_quant_rows"):
        _h_only_step_cost(
            SolveConfig(backend="pallas",
                        precision=Precision(x_dtype="int8", x_quant_rows=32))
        )


def _canonical_invariant_holds(x, q, s):
    """The platform-independent code definition (ops/quant module docstring):
    q is the integer with f32(s*(q-0.5)) <= x < f32(s*(q+0.5)), saturated at
    the 0/255 clip ends.  Evaluated here with NumPy f32 (IEEE mul/add)."""
    qf = q.astype(np.float32)
    hi = (s * (qf + np.float32(0.5))).astype(np.float32)
    lo = (s * (qf - np.float32(0.5))).astype(np.float32)
    ok_hi = (x < hi) | (q == 255)
    ok_lo = (x >= lo) | (q == 0)
    return bool(np.all(ok_hi & ok_lo))


def test_quantize_codes_satisfy_canonical_definition(problem):
    """Codes obey the comparison-based canonical definition — the property
    that makes host and device emit identical bytes on EVERY backend (the
    TPU divergence of 2026-08-19: an uncanonicalized floor(x*inv+0.5) came
    out one off near boundaries because XLA:TPU's divide isn't correctly
    rounded and the mul-add can contract to an FMA)."""
    x, _, _ = problem
    qn, sn = quant.quantize_columns_np(x, EPS)
    assert _canonical_invariant_holds(x, qn, np.asarray(sn)[None, :])
    qj, sj = quant.quantize_columns(jnp.asarray(x), EPS)
    assert _canonical_invariant_holds(x, np.asarray(qj), np.asarray(sj)[None, :])
    # row-block layout too
    qrn, srn = quant.quantize_rowblocks_np(x, EPS, 32)
    rb = -(-x.shape[0] // srn.shape[0])
    s_full = np.asarray(srn)[np.arange(x.shape[0]) // rb, :]
    assert _canonical_invariant_holds(x, qrn, s_full)


def test_quantize_fixup_corrects_perturbed_reciprocal():
    """_canonical_fixup lands on the canonical code even when the fast pass
    used a reciprocal that is off by a few ulps — the exact failure mode of
    a backend whose f32 divide is not correctly rounded."""
    rng = np.random.RandomState(7)
    x = np.abs(rng.rand(64, 40)).astype(np.float32) * 10.0
    scales = np.maximum(x.max(axis=0), np.float32(EPS)) * np.float32(1.0 / 255.0)
    inv = (np.float32(1.0) / scales)[None, :]
    q_ref, _ = quant.quantize_columns_np(x, EPS)
    for ulps in (-2, -1, 1, 2):
        inv_bad = np.frombuffer(
            (np.frombuffer(inv.tobytes(), np.int32) + np.int32(ulps)).tobytes(),
            np.float32,
        ).reshape(inv.shape)
        v = np.floor(x * inv_bad + np.float32(0.5))
        q = quant._canonical_fixup(x, v, scales[None, :], np)
        np.clip(q, 0, 255, out=q)
        np.testing.assert_array_equal(q.astype(np.uint8), q_ref)
