"""Randomized sweep: solver vs oracle across shapes, seeds, and configs."""

import numpy as np
import pytest

from nmf_tpu import SolveConfig, solve

from oracle import np_solve

# slow: randomized sweeps are the nightly tier (`-m ""`); the deterministic
# per-family equivalence tests cover the same paths in the default gate
pytestmark = pytest.mark.slow


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


@pytest.mark.parametrize("trial", range(8))
def test_fuzz_accelerated_monotone_and_bounded(trial):
    """Random shapes/scales/momentum schedules: the accelerated solver's
    recorded history must be non-increasing (the block safeguard's
    guarantee) and finite, ending at or below the seeded initial cost."""
    from nmf_tpu import kl_divergence

    rng = np.random.RandomState(3000 + trial)
    m = int(rng.randint(4, 160))
    k = int(rng.randint(1, min(m, 20) + 1))
    n = int(rng.randint(4, 180))
    iters = int(rng.randint(2, 60))
    check = int(rng.randint(1, 12))
    scale = float(10.0 ** rng.uniform(-2, 2))
    x = np.maximum((rng.rand(m, n) * scale).astype(np.float32), 2.2204e-16)
    w = rng.rand(m, k).astype(np.float32)
    h = rng.rand(k, n).astype(np.float32)
    cfg = SolveConfig(
        max_iter=iters, check_every=check, accelerate=True,
        accel_momentum=float(rng.uniform(0.0, 0.9)),
        accel_momentum_max=0.95,
        accel_grow=float(rng.uniform(1.0, 1.2)),
        accel_shrink=float(rng.uniform(0.2, 1.0)),
    )
    res = solve(x, w, h, cfg)
    hist = np.asarray(res.cost_history)[: int(res.num_checks)]
    assert int(res.iterations) == iters
    assert np.all(np.isfinite(hist)), (m, k, n, iters, check, scale)
    assert np.all(np.diff(hist) <= 1e-6 * np.abs(hist[:-1])), (
        m, k, n, iters, check, scale, hist,
    )
    c0 = float(
        kl_divergence(
            np.maximum(x, np.float32(2.2204e-16)),
            np.maximum(w, np.float32(2.2204e-16)),
            np.maximum(h, np.float32(2.2204e-16)),
        )
    )
    assert float(res.cost) <= c0 * (1 + 1e-6)


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_masked_nan_holes_equal_zero_holes(trial):
    """Random shapes + random weighted masks: NaN/Inf garbage at unobserved
    entries must be EXACTLY equivalent to zeros there (prep zeroes them)."""
    from nmf_tpu import solve_masked

    rng = np.random.RandomState(3000 + trial)
    m = int(rng.randint(4, 120))
    k = int(rng.randint(1, min(m, 12) + 1))
    n = int(rng.randint(4, 140))
    x = rng.rand(m, n).astype(np.float32)
    w = rng.rand(m, k).astype(np.float32)
    h = rng.rand(k, n).astype(np.float32)
    # weighted mask with a real zero fraction
    mask = (rng.rand(m, n) * (rng.rand(m, n) > 0.3)).astype(np.float32)
    garbage = np.where(
        mask > 0, x, np.float32([np.nan, np.inf, -np.inf])[trial % 3]
    ).astype(np.float32)
    cfg = SolveConfig(max_iter=int(rng.randint(1, 8)), check_every=1)
    res_g = solve_masked(garbage, w, h, mask, cfg)
    res_z = solve_masked(np.where(mask > 0, x, 0.0), w, h, mask, cfg)
    np.testing.assert_array_equal(np.asarray(res_g.w), np.asarray(res_z.w))
    np.testing.assert_array_equal(np.asarray(res_g.h), np.asarray(res_z.h))
    assert np.isfinite(float(res_g.cost))


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_prequantized_pair_matches_preclamped_entry(trial):
    """Random shapes/scale spreads/row-block sizes: a pre-quantized pair
    through the DEFAULT entry == the same pair through clamp_inputs=False
    (bitwise), for per-column and per-row-block layouts alike."""
    import jax.numpy as jnp

    from nmf_tpu.ops.quant import quantize_policy
    from nmf_tpu.utils.config import Precision

    rng = np.random.RandomState(4000 + trial)
    m = int(rng.randint(4, 150))
    k = int(rng.randint(1, 10))
    n = int(rng.randint(4, 150))
    rows = int(rng.choice([0, 1, 7, 32]))
    eps = np.float32(2.2204e-16)
    x = np.maximum(
        (rng.rand(m, n) * 10.0 ** rng.uniform(-2, 2, size=(m, 1))), eps
    ).astype(np.float32)
    w = np.maximum(rng.rand(m, k), eps).astype(np.float32)
    h = np.maximum(rng.rand(k, n), eps).astype(np.float32)
    cfg = SolveConfig(
        max_iter=int(rng.randint(1, 6)), check_every=1,
        precision=Precision(x_dtype="int8", x_quant_rows=rows),
    )
    pair = quantize_policy(jnp.asarray(x), eps, rows)
    a = solve(pair, w, h, cfg)  # default clamp_inputs=True
    b = solve(pair, jnp.asarray(w) + 0, jnp.asarray(h) + 0, cfg,
              clamp_inputs=False)
    np.testing.assert_array_equal(np.asarray(a.w), np.asarray(b.w))
    np.testing.assert_array_equal(np.asarray(a.h), np.asarray(b.h))


@pytest.mark.parametrize("trial", range(8))
def test_fuzz_dequantize_rows_slices(trial):
    """Random extents/blocks/slices: dequantize_rows == full dequant sliced."""
    import jax.numpy as jnp

    from nmf_tpu.ops import quant

    rng = np.random.RandomState(5000 + trial)
    m = int(rng.randint(3, 300))
    n = int(rng.randint(1, 12))
    rows = int(rng.randint(1, m + 1))
    x = (rng.rand(m, n) * 10.0 ** rng.uniform(-2, 2, size=(m, 1))).astype(
        np.float32
    )
    q, s = quant.quantize_rowblocks_np(x, np.float32(2.2204e-16), rows)
    full = np.asarray(quant.dequantize(jnp.asarray(q), jnp.asarray(s)))
    lo = int(rng.randint(0, m))
    hi = int(rng.randint(lo + 1, m + 1))
    part = np.asarray(
        quant.dequantize_rows(jnp.asarray(q[lo:hi]), jnp.asarray(s), lo, m)
    )
    np.testing.assert_array_equal(part, full[lo:hi])


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_serving_compositions_match_live_solves(trial):
    """Random shapes/blocks/configs through the serving artifact matrix:
    each exported composition (masked? x quantized? x mesh?) must match
    its live-library counterpart — the quantized artifacts bitwise against
    the in-program-quantization artifact, everything against the live
    masked/plain H-only solve to f32 round-off.  (Shared driver:
    serving_cases.run_serving_composition; the default gate pins
    fixed-seed cases through the same driver in test_serving.py.)"""
    from serving_cases import run_serving_composition

    rng = np.random.RandomState(3000 + trial)
    # mesh divisibility: M % 4 == 0, n_block % 2 == 0 (the 4x2 CPU mesh)
    m = 4 * int(rng.randint(2, 24))
    k = int(rng.randint(1, 9))
    nb = 2 * int(rng.randint(2, 12))
    n = int(rng.randint(1, 3)) * nb + int(rng.randint(0, nb))  # ragged ok
    n = max(n, 1)
    iters = int(rng.randint(1, 9))
    masked = bool(rng.randint(0, 2))
    quant = bool(rng.randint(0, 2))
    mesh_shape = (4, 2) if rng.randint(0, 2) else None
    qrows = int(rng.choice([0, 4])) if quant else 0
    run_serving_composition(
        m, k, nb, n, iters, masked, quant, qrows, mesh_shape,
        seed=3000 + trial,
    )
