"""Tests for the model-family extensions: masked NMF and regularized MU."""

import numpy as np
import pytest

import jax.numpy as jnp

from nmf_tpu import SolveConfig, solve
from nmf_tpu.models.masked import masked_kl, mu_step_masked, solve_masked
from nmf_tpu.ops.mu import mu_step, mu_step_kl_reg

from oracle import clamp


@pytest.fixture(scope="module")
def masked_problem():
    rng = np.random.RandomState(21)
    m, k, n = 80, 6, 90
    w_true = rng.rand(m, k).astype(np.float32)
    h_true = rng.rand(k, n).astype(np.float32)
    x = (w_true @ h_true).astype(np.float32)
    mask = (rng.rand(m, n) < 0.7).astype(np.float32)  # 30% missing
    w0 = rng.rand(m, k).astype(np.float32)
    h0 = rng.rand(k, n).astype(np.float32)
    return x, mask, w0, h0


def test_mask_all_ones_equals_reference_step(small_problem):
    """M = 1 must reduce exactly to the reference updates."""
    x, w, h = (jnp.asarray(clamp(a)) for a in small_problem)
    ones = jnp.ones_like(x)
    wm, hm = mu_step_masked(w, h, x, ones)
    wr, hr = mu_step(w, h, x)
    np.testing.assert_allclose(np.asarray(wm), np.asarray(wr), rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(hm), np.asarray(hr), rtol=2e-5, atol=1e-7)


def test_masked_cost_monotone(masked_problem):
    x, mask, w0, h0 = masked_problem
    res = solve_masked(x, w0, h0, mask, SolveConfig(max_iter=100, check_every=10))
    hist = np.asarray(res.cost_history)[: int(res.num_checks)]
    assert np.all(np.isfinite(hist))
    assert np.all(np.diff(hist) <= np.abs(hist[:-1]) * 1e-6)


def test_masked_recovers_missing_entries(masked_problem):
    """Low-rank X: fitting observed entries should predict the held-out ones."""
    x, mask, w0, h0 = masked_problem
    res = solve_masked(x, w0, h0, mask, SolveConfig(max_iter=2000, check_every=100))
    recon = np.asarray(res.w) @ np.asarray(res.h)
    miss = mask == 0
    rel = np.abs(recon[miss] - x[miss]) / (np.abs(x[miss]) + 1e-6)
    assert np.median(rel) < 0.05, f"median held-out relative error {np.median(rel):.3f}"


def test_masked_ignores_garbage_in_masked_entries(masked_problem):
    x, mask, w0, h0 = masked_problem
    x2 = x.copy()
    x2[mask == 0] = 1e6  # garbage where unobserved
    cfg = SolveConfig(max_iter=50, check_every=10)
    r1 = solve_masked(x, w0, h0, mask, cfg)
    r2 = solve_masked(x2, w0, h0, mask, cfg)
    np.testing.assert_allclose(np.asarray(r1.w), np.asarray(r2.w), rtol=1e-6)


def test_masked_shape_validation(masked_problem):
    x, mask, w0, h0 = masked_problem
    with pytest.raises(ValueError, match="mask shape"):
        solve_masked(x, w0, h0, mask[:, :-1], SolveConfig(max_iter=1))


# ---------------------------------------------------------------------------
# regularization
# ---------------------------------------------------------------------------


def test_zero_reg_equals_reference_step(small_problem):
    x, w, h = (jnp.asarray(clamp(a)) for a in small_problem)
    wr, hr = mu_step(w, h, x)
    wz, hz = mu_step_kl_reg(w, h, x)
    np.testing.assert_allclose(np.asarray(wz), np.asarray(wr), rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(hz), np.asarray(hr), rtol=2e-5, atol=1e-7)


def test_l1_promotes_sparsity(small_problem):
    x, w, h = small_problem
    plain = solve(x, w, h, SolveConfig(max_iter=300, check_every=50))
    sparse = solve(
        x, w, h, SolveConfig(max_iter=300, check_every=50, l1_h=0.5)
    )
    frac_small = lambda a: float(np.mean(np.asarray(a) < 1e-3))
    assert frac_small(sparse.h) > frac_small(plain.h)
    # penalized objective still monotone
    hist = np.asarray(sparse.cost_history)[: int(sparse.num_checks)]
    assert np.all(np.diff(hist) <= np.abs(hist[:-1]) * 1e-6)


def test_l2_shrinks_factor_norm(small_problem):
    x, w, h = small_problem
    plain = solve(x, w, h, SolveConfig(max_iter=200))
    ridge = solve(x, w, h, SolveConfig(max_iter=200, l2_w=1.0, l2_h=1.0))
    assert float(jnp.sum(ridge.w**2) + jnp.sum(ridge.h**2)) < float(
        jnp.sum(plain.w**2) + jnp.sum(plain.h**2)
    )


def test_reg_validation():
    with pytest.raises(ValueError):
        SolveConfig(l1_w=-1.0).validate()
    with pytest.raises(ValueError):
        SolveConfig(l1_w=0.1, beta=2.0).validate()


# ---------------------------------------------------------------------------
# HALS (Frobenius coordinate descent)
# ---------------------------------------------------------------------------


def test_hals_monotone_and_beats_mu_per_iteration(small_problem):
    from nmf_tpu.ops.divergence import euclidean_cost

    x, w, h = small_problem
    cfg_h = SolveConfig(max_iter=50, check_every=10, beta=2.0, algorithm="hals")
    cfg_m = SolveConfig(max_iter=50, check_every=10, beta=2.0)
    hals = solve(x, w, h, cfg_h)
    mu = solve(x, w, h, cfg_m)
    hist = np.asarray(hals.cost_history)[: int(hals.num_checks)]
    assert np.all(np.diff(hist) <= np.abs(hist[:-1]) * 1e-6)
    # HALS converges faster per iteration on the Frobenius objective
    assert float(hals.cost) <= float(mu.cost)
    # factors stay non-negative (HALS projects onto the constraint)
    assert float(jnp.min(hals.w)) >= 0.0 and float(jnp.min(hals.h)) >= 0.0


def test_hals_matches_sklearn_quality(small_problem):
    """Reach at least sklearn's coordinate-descent quality from the same init."""
    sklearn = pytest.importorskip("sklearn.decomposition")
    from nmf_tpu.ops.divergence import euclidean_cost

    x, w, h = small_problem
    x = clamp(x)
    cfg = SolveConfig(max_iter=200, check_every=200, beta=2.0, algorithm="hals")
    ours = solve(x, w, h, cfg)
    sk = sklearn.NMF(
        n_components=w.shape[1], init="custom", solver="cd", max_iter=200, tol=0.0,
    )
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        w_sk = sk.fit_transform(x, W=w.copy(), H=h.copy())
    sk_cost = 0.5 * np.linalg.norm(x - w_sk @ sk.components_) ** 2
    assert float(ours.cost) <= sk_cost * 1.05


def test_hals_config_validation():
    with pytest.raises(ValueError, match="Frobenius"):
        SolveConfig(algorithm="hals", beta=1.0).validate()
    with pytest.raises(ValueError, match="unsupported algorithm"):
        SolveConfig(algorithm="als").validate()


def test_masked_with_regularization(masked_problem):
    """Masked + L1/L2 compose: the penalized masked objective is monotone
    non-increasing and L1 promotes sparser factors than plain masked."""
    from nmf_tpu.models.masked import solve_masked

    x, mask, w, h = masked_problem
    cfg = SolveConfig(max_iter=60, check_every=10, l1_h=0.05, l2_w=0.01)
    res = solve_masked(x, w, h, mask, cfg)
    hist = np.asarray(res.cost_history)[: int(res.num_checks)]
    assert np.all(np.diff(hist) <= np.abs(hist[:-1]) * 1e-6)
    plain = solve_masked(x, w, h, mask, SolveConfig(max_iter=60, check_every=10))
    near_zero = lambda a: float(np.mean(np.asarray(a) < 1e-4))
    assert near_zero(res.h) >= near_zero(plain.h)


def test_masked_reg_zero_penalties_identical(masked_problem):
    from nmf_tpu.models.masked import solve_masked

    x, mask, w, h = masked_problem
    a = solve_masked(x, w, h, mask, SolveConfig(max_iter=10))
    b = solve_masked(
        x, w, h, mask, SolveConfig(max_iter=10, l1_w=0.0, l2_h=0.0)
    )
    np.testing.assert_array_equal(np.asarray(a.w), np.asarray(b.w))


# ---------------------------------------------------------------------------
# masked H-only (missing-data inference)
# ---------------------------------------------------------------------------


def test_masked_h_only_matches_full_masked_h_half(small_problem):
    """With a full mask the masked H-only solve equals plain solve_h_only;
    with a partial mask the masked entries are excluded from the fit."""
    from nmf_tpu import SolveConfig, solve_h_only, solve_masked_h_only

    x, w, h = small_problem
    cfg = SolveConfig(max_iter=15, check_every=5)
    ones = np.ones_like(x)
    res_full = solve_masked_h_only(x, w, h, ones, cfg)
    ref = solve_h_only(x, w, h, cfg)
    # denominator reduction order differs (mask-GEMM vs factor sum):
    # summation-noise tolerance, not exact equality
    np.testing.assert_allclose(
        np.asarray(res_full.h), np.asarray(ref.h), rtol=5e-5, atol=1e-6
    )
    # partial mask: garbage in the masked entries must not change H
    rng = np.random.RandomState(31)
    mask = (rng.rand(*x.shape) > 0.3).astype(np.float32)
    x_garbage = np.array(x)
    x_garbage[mask == 0] = 1e6
    a = solve_masked_h_only(x, w, h, mask, cfg)
    b = solve_masked_h_only(x_garbage, w, h, mask, cfg)
    np.testing.assert_allclose(
        np.asarray(a.h), np.asarray(b.h), rtol=1e-6, atol=1e-8
    )
    assert not np.allclose(np.asarray(a.h), np.asarray(ref.h))


def test_masked_h_only_on_mesh(small_problem):
    from nmf_tpu import SolveConfig, solve_masked_h_only
    from nmf_tpu.parallel.mesh import make_mesh

    x, w, h = small_problem
    rng = np.random.RandomState(32)
    mask = (rng.rand(*x.shape) > 0.25).astype(np.float32)
    cfg = SolveConfig(max_iter=10, check_every=5, l1_h=0.01)
    single = solve_masked_h_only(x, w, h, mask, cfg)
    meshed = solve_masked_h_only(
        x, w, h, mask, cfg, mesh=make_mesh(shape=(2, 2))
    )
    np.testing.assert_allclose(
        np.asarray(meshed.h), np.asarray(single.h), rtol=5e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        float(meshed.cost), float(single.cost), rtol=1e-5
    )
