"""Semi-adaptive NMF: frozen dictionary columns (template-based fitting)."""

import numpy as np
import pytest

from nmf_tpu import SolveConfig, solve, solve_h_only, solve_semi

from oracle import clamp


@pytest.fixture(scope="module")
def problem():
    rng = np.random.RandomState(19)
    m, k, n = 96, 10, 120
    x = rng.rand(m, n).astype(np.float32)
    w = rng.rand(m, k).astype(np.float32)
    h = rng.rand(k, n).astype(np.float32)
    return x, w, h


CFG = SolveConfig(max_iter=20, check_every=10)


def test_semi_endpoints_match_solve_and_h_only(problem):
    x, w, h = problem
    # n_frozen=0 == the plain solve (trajectory-identical)
    free = solve_semi(x, w, h, CFG, n_frozen=0)
    ref = solve(x, w, h, CFG)
    np.testing.assert_array_equal(np.asarray(free.w), np.asarray(ref.w))
    np.testing.assert_array_equal(np.asarray(free.h), np.asarray(ref.h))
    # n_frozen=K == the H-only solve
    frozen = solve_semi(x, w, h, CFG, n_frozen=w.shape[1])
    ho = solve_h_only(x, w, h, CFG)
    np.testing.assert_allclose(
        np.asarray(frozen.h), np.asarray(ho.h), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_array_equal(np.asarray(frozen.w), clamp(w))


def test_semi_frozen_columns_stay_fixed_free_columns_train(problem):
    x, w, h = problem
    f = 4
    res = solve_semi(x, w, h, CFG, n_frozen=f)
    w_out = np.asarray(res.w)
    np.testing.assert_array_equal(w_out[:, :f], clamp(w)[:, :f])
    assert not np.allclose(w_out[:, f:], clamp(w)[:, f:])
    # the fit still reduces the divergence below the all-frozen fit
    ho = solve_h_only(x, w, h, CFG)
    assert float(res.cost) < float(ho.cost)


def test_semi_cost_monotone(problem):
    x, w, h = problem
    res = solve_semi(
        x, w, h, SolveConfig(max_iter=60, check_every=10), n_frozen=3
    )
    hist = np.asarray(res.cost_history)
    hist = hist[np.isfinite(hist)]
    assert np.all(np.diff(hist) <= 1e-4 * np.abs(hist[:-1]))


@pytest.mark.parametrize("kind", ["beta2", "reg", "int8"])
def test_semi_families(problem, kind):
    from nmf_tpu.utils.config import Precision

    x, w, h = problem
    if kind == "beta2":
        cfg = SolveConfig(max_iter=10, check_every=5, beta=2.0)
    elif kind == "reg":
        cfg = SolveConfig(max_iter=10, check_every=5, l1_h=0.02)
    else:
        cfg = SolveConfig(
            max_iter=10, check_every=5, precision=Precision(x_dtype="int8")
        )
    res = solve_semi(x, w, h, cfg, n_frozen=4)
    np.testing.assert_array_equal(np.asarray(res.w)[:, :4], clamp(w)[:, :4])
    assert np.isfinite(float(res.cost))


@pytest.mark.parametrize("shape", [(4, 2), (2, 4)])
def test_semi_on_mesh_matches_single_device(problem, shape):
    from nmf_tpu.parallel.mesh import make_mesh

    x, w, h = problem
    mesh = make_mesh(shape=shape)
    res_m = solve_semi(x, w, h, CFG, n_frozen=4, mesh=mesh)
    res_s = solve_semi(x, w, h, CFG, n_frozen=4)
    np.testing.assert_allclose(
        np.asarray(res_m.w), np.asarray(res_s.w), rtol=5e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(res_m.h), np.asarray(res_s.h), rtol=5e-5, atol=1e-7
    )
    np.testing.assert_array_equal(np.asarray(res_m.w)[:, :4], clamp(w)[:, :4])


def test_semi_validation(problem):
    x, w, h = problem
    with pytest.raises(NotImplementedError):
        solve_semi(
            x, w, h, SolveConfig(max_iter=2, beta=2.0, algorithm="hals"),
            n_frozen=2,
        )
    with pytest.raises(ValueError):
        solve_semi(x, w, h, CFG, n_frozen=w.shape[1] + 1)
    with pytest.raises(ValueError):
        solve_semi(x, w, h, CFG, n_frozen=-1)


def test_semi_live_metrics_and_chunked_fallback(problem, monkeypatch):
    """Live metrics stream per check, and the chunked host-driven fallback
    (platforms that reject in-jit callbacks) yields identical results."""
    import jax

    import nmf_tpu.models.solver as solver_mod
    from nmf_tpu.utils import metrics as m

    x, w, h = problem
    cfg = SolveConfig(max_iter=30, check_every=10, live_metrics=True)
    events = []
    m.set_live_handler(lambda it, c, r: events.append(it))
    try:
        res = solve_semi(x, w, h, cfg, n_frozen=3)
        jax.effects_barrier()
    finally:
        m.set_live_handler(None)
    assert events == [10, 20, 30]
    # now force the chunked fallback and demand identical factors
    monkeypatch.setattr(
        solver_mod, "host_callbacks_supported", lambda p=None: False
    )
    events2 = []
    m.set_live_handler(lambda it, c, r: events2.append(it))
    try:
        res2 = solve_semi(x, w, h, cfg, n_frozen=3)
    finally:
        m.set_live_handler(None)
    assert events2 == [10, 20, 30]
    np.testing.assert_array_equal(np.asarray(res2.w), np.asarray(res.w))
    np.testing.assert_array_equal(np.asarray(res2.h), np.asarray(res.h))


def test_semi_rejects_prequantized_pair(problem):
    """solve_semi quantizes X itself — a (codes, scales) pair errors loudly
    instead of crashing in jnp.shape."""
    import jax.numpy as jnp

    from nmf_tpu.ops.quant import quantize_policy
    from nmf_tpu.utils.config import Precision

    x, w0, h0 = problem
    pair = quantize_policy(jnp.asarray(x), 2.2204e-16, 0)
    cfg = SolveConfig(max_iter=4, precision=Precision(x_dtype="int8"))
    with pytest.raises(NotImplementedError, match="pre-quantized"):
        solve_semi(pair, w0, h0, cfg, n_frozen=2)
