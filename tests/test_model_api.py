"""Tests for the high-level NMF estimator API and H-only (transform) solve."""

import numpy as np
import pytest

import jax.numpy as jnp

from nmf_tpu import SolveConfig, kl_divergence, solve
from nmf_tpu.models.nmf import NMF, solve_h_only
from nmf_tpu.parallel import make_mesh, sharded

from oracle import clamp, np_update_h


def test_solve_h_only_matches_oracle(small_problem):
    x, w, h = (clamp(a) for a in small_problem)
    res = solve_h_only(x, w, h, SolveConfig(max_iter=3, check_every=3))
    hn = h
    for _ in range(3):
        hn = np_update_h(w, hn, x)
    np.testing.assert_allclose(np.asarray(res.h), hn, rtol=2e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(res.w), w)  # W untouched


def test_solve_h_only_decreases_cost(small_problem):
    x, w, h = (clamp(a) for a in small_problem)
    c0 = float(kl_divergence(jnp.asarray(x), jnp.asarray(w), jnp.asarray(h)))
    res = solve_h_only(x, w, h, SolveConfig(max_iter=50, check_every=10))
    assert float(res.cost) < c0


def test_nmf_fit_transform(small_problem):
    x, _, _ = small_problem
    model = NMF(n_components=8, max_iter=50, tol=0, random_state=1)
    w = model.fit_transform(x)
    assert w.shape == (x.shape[0], 8)
    assert model.components_.shape == (8, x.shape[1])
    assert model.n_iter_ == 50
    assert np.isfinite(model.reconstruction_err_)
    # fit decreased the cost vs init
    recon = model.inverse_transform(model.components_)
    assert recon.shape == x.shape


def test_nmf_transform_new_data(small_problem):
    x, _, _ = small_problem
    model = NMF(n_components=8, max_iter=40, random_state=1)
    model.fit(x)
    x_new = clamp(np.random.RandomState(9).rand(x.shape[0], 17).astype(np.float32))
    h_new = model.transform(x_new, max_iter=100)
    assert h_new.shape == (8, 17)
    # the transform fit is meaningful: better than a random H
    xj = jnp.asarray(clamp(x_new))
    wj = jnp.asarray(model.w_)
    rng_h = jnp.asarray(
        np.random.RandomState(1).rand(8, 17).astype(np.float32)
    )
    c_fit = float(kl_divergence(xj, wj, jnp.asarray(h_new)))
    c_rand = float(kl_divergence(xj, wj, rng_h))
    assert c_fit < c_rand


def test_nmf_requires_fit_before_transform(small_problem):
    x, _, _ = small_problem
    with pytest.raises(RuntimeError):
        NMF(n_components=4).transform(x)


def test_nmf_beta_loss_frobenius(small_problem):
    x, _, _ = small_problem
    model = NMF(n_components=6, beta_loss=2.0, max_iter=30, init="nndsvda")
    model.fit(x)
    assert model.score(x) < 0  # negative divergence
    # euclidean model improves euclidean fit over iterations
    m2 = NMF(n_components=6, beta_loss=2.0, max_iter=5, init="nndsvda")
    m2.fit(x)
    assert model.score(x) >= m2.score(x)


def test_sharded_beta_matches_single_device(small_problem):
    rng = np.random.RandomState(4)
    m, k, n = 128, 8, 160
    x = rng.rand(m, n).astype(np.float32)
    w = rng.rand(m, k).astype(np.float32)
    h = rng.rand(k, n).astype(np.float32)
    for beta in (0.0, 2.0, 1.5):
        cfg = SolveConfig(max_iter=10, check_every=5, beta=beta)
        ref = solve(x, w, h, cfg)
        res = sharded.solve_sharded(x, w, h, cfg, mesh=make_mesh(shape=(2, 2)))
        np.testing.assert_allclose(
            np.asarray(res.w), np.asarray(ref.w), rtol=1e-4, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(res.cost_history), np.asarray(ref.cost_history), rtol=1e-5
        )


def test_transform_before_fit_half_initialized(small_problem):
    """Review fix: estimator with components_ but no w_ still errors cleanly."""
    x, _, _ = small_problem
    model = NMF(n_components=4)
    model.components_ = np.ones((4, x.shape[1]), np.float32)
    with pytest.raises(RuntimeError, match="before fit"):
        model.transform(x)


def test_nmf_cd_solver_alias(small_problem):
    x, _, _ = small_problem
    model = NMF(n_components=6, beta_loss=2.0, solver="cd", max_iter=30)
    model.fit(x)
    assert model.n_iter_ == 30
    assert np.isfinite(model.reconstruction_err_)


def test_transform_with_hals(small_problem):
    x, _, _ = small_problem
    model = NMF(n_components=6, beta_loss=2.0, solver="hals", max_iter=30)
    model.fit(x)
    h_new = model.transform(x[:, :20], max_iter=50)
    assert h_new.shape == (6, 20)
    assert h_new.min() >= 0


def test_nmf_estimator_restarts(small_problem):
    x, _, _ = small_problem
    base = NMF(n_components=4, max_iter=20, init="random", random_state=3)
    multi = NMF(
        n_components=4, max_iter=20, init="random", random_state=3,
        n_restarts=4,
    )
    base.fit(x)
    multi.fit(x)
    # the multi-restart fit can only be as good or better than seed 3 alone
    assert multi.reconstruction_err_ <= base.reconstruction_err_ + 1e-6
    assert multi.w_.shape == base.w_.shape
    assert multi.components_.shape == base.components_.shape


def test_nmf_estimator_restarts_uses_mesh(small_problem):
    import jax
    from nmf_tpu.parallel.mesh import make_mesh

    x, _, _ = small_problem
    model = NMF(
        n_components=4, max_iter=10, init="random", random_state=2,
        n_restarts=8, mesh=make_mesh(shape=(4, 2)),
    )
    model.fit(x)
    single = NMF(
        n_components=4, max_iter=10, init="random", random_state=2,
        n_restarts=8,
    )
    single.fit(x)
    # the mesh changes placement, not the math
    np.testing.assert_allclose(
        model.reconstruction_err_, single.reconstruction_err_, rtol=1e-5
    )


def test_nmf_estimator_restarts_warns_on_deterministic_init(small_problem):
    import warnings

    x, _, _ = small_problem
    model = NMF(
        n_components=4, max_iter=5, init="nndsvda", random_state=0,
        n_restarts=2,
    )
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        model.fit(x)
    assert any("deterministic" in str(w.message) for w in rec)


def test_solve_w_only_transposition_symmetry(small_problem):
    """W-only == H-only on the transposed problem, returned untransposed."""
    from nmf_tpu import SolveConfig, solve_h_only, solve_w_only
    from nmf_tpu.ops.divergence import kl_divergence

    x, w, h = small_problem
    cfg = SolveConfig(max_iter=15, check_every=5)
    res = solve_w_only(x, w, h, cfg)
    ref = solve_h_only(x.T, h.T, w.T, cfg)
    np.testing.assert_array_equal(np.asarray(res.w), np.asarray(ref.h).T)
    assert float(res.cost) == float(ref.cost)
    assert res.w.shape == w.shape and res.h.shape == h.shape
    # the adapted W reduces the divergence vs the initial W
    xc = jnp.asarray(clamp(x))
    c0 = float(kl_divergence(xc, jnp.asarray(clamp(w)), jnp.asarray(clamp(h))))
    assert float(res.cost) < c0


def test_solve_w_only_on_mesh(small_problem):
    from nmf_tpu import SolveConfig, solve_w_only
    from nmf_tpu.parallel.mesh import make_mesh

    x, w, h = small_problem
    m, n = x.shape
    # transposed problem: N must divide mesh rows, M its cols
    mesh = make_mesh(shape=(2, 2))
    if n % 2 or m % 2:
        pytest.skip("dims not divisible")
    cfg = SolveConfig(max_iter=10, check_every=5)
    res_m = solve_w_only(x, w, h, cfg, mesh=mesh)
    res_s = solve_w_only(x, w, h, cfg)
    np.testing.assert_allclose(
        np.asarray(res_m.w), np.asarray(res_s.w), rtol=5e-5, atol=1e-7
    )


def test_solve_w_only_transposes_penalties(small_problem):
    """l1_w/l2_w penalize the iterated W (not silently dropped)."""
    from nmf_tpu import SolveConfig, solve_w_only

    x, w, h = small_problem
    plain = solve_w_only(x, w, h, SolveConfig(max_iter=10, check_every=5))
    pen = solve_w_only(
        x, w, h, SolveConfig(max_iter=10, check_every=5, l1_w=0.5)
    )
    # the penalty changes the W update (denominator gains +l1_w)
    assert not np.allclose(np.asarray(pen.w), np.asarray(plain.w))
    # and shrinks W (larger denominator, multiplicative update)
    assert np.asarray(pen.w).sum() < np.asarray(plain.w).sum()


def test_nmf_estimator_sklearn_alpha_scaling(small_problem):
    """alpha_W/alpha_H/l1_ratio map to the solver penalties with sklearn's
    exact dimension scaling (l1_W = n_features*alpha_W*l1_ratio, ...)."""
    from nmf_tpu import SolveConfig, solve
    from nmf_tpu.models.init import nndsvd_init

    x, _, _ = small_problem
    m, n = x.shape
    model = NMF(
        n_components=5, max_iter=20, init="nndsvda", random_state=0,
        alpha_W=0.1, l1_ratio=0.5,
    )
    model.fit(x)
    w0, h0 = nndsvd_init(x, 5, variant="nndsvda", seed=0)
    ref = solve(
        x, w0, h0,
        SolveConfig(
            max_iter=20,
            l1_w=n * 0.1 * 0.5, l2_w=n * 0.1 * 0.5,
            l1_h=m * 0.1 * 0.5, l2_h=m * 0.1 * 0.5,
        ),
    )
    np.testing.assert_allclose(model.w_, np.asarray(ref.w), rtol=1e-6)
    # alpha_H overrides independently; alpha_H=0 drops the H penalties
    m2 = NMF(
        n_components=5, max_iter=20, init="nndsvda", random_state=0,
        alpha_W=0.1, alpha_H=0.0, l1_ratio=1.0,
    )
    m2.fit(x)
    ref2 = solve(
        x, w0, h0, SolveConfig(max_iter=20, l1_w=n * 0.1, l2_w=0.0),
    )
    np.testing.assert_allclose(m2.w_, np.asarray(ref2.w), rtol=1e-6)
    # and the penalties really changed the fit
    assert not np.allclose(model.w_, m2.w_)


def test_reconstruction_err_is_pure_divergence_under_alpha(small_problem):
    """sklearn semantics: reconstruction_err_ excludes the penalty terms."""
    from nmf_tpu import kl_divergence

    x, _, _ = small_problem
    model = NMF(
        n_components=5, max_iter=20, init="nndsvda", random_state=0,
        alpha_W=0.2, l1_ratio=0.5,
    )
    model.fit(x)
    pure = float(
        kl_divergence(
            jnp.asarray(clamp(x)), jnp.asarray(model.w_),
            jnp.asarray(model.components_),
        )
    )
    assert model.reconstruction_err_ == pytest.approx(pure, rel=1e-6)


def test_transform_out_of_core_honors_alpha(small_problem):
    """The streamed transform solves the SAME penalized problem as the
    in-memory one (the penalties scale by the global dims either way)."""
    x, _, _ = small_problem
    model = NMF(
        n_components=4, max_iter=20, init="nndsvda", random_state=0,
        alpha_W=0.5, l1_ratio=0.5,
    )
    model.fit(x)
    rng = np.random.RandomState(0)
    h0 = rng.rand(4, x.shape[1]).astype(np.float32)
    h_mem = model.transform(x, h0=h0, max_iter=20)
    h_ooc = model.transform(x, h0=h0, max_iter=20, out_of_core=True)
    np.testing.assert_allclose(h_ooc, h_mem, rtol=5e-5, atol=1e-7)


def test_public_api_is_documented():
    """Every top-level export appears in docs/API.md (doc-drift guard)."""
    import os

    import nmf_tpu

    path = os.path.join(
        os.path.dirname(nmf_tpu.__file__), "..", "docs", "API.md"
    )
    if not os.path.exists(path):
        import pytest as _pytest

        _pytest.skip("docs/ not present (installed package)")
    doc = open(path).read()
    missing = [
        n for n in nmf_tpu.__all__ if n != "__version__" and n not in doc
    ]
    assert not missing, f"undocumented exports: {missing}"


def test_nmf_transform_masked(small_problem):
    x, _, _ = small_problem
    model = NMF(n_components=6, max_iter=20, random_state=1)
    model.fit(x)
    rng = np.random.RandomState(5)
    mask = (rng.rand(*x.shape) > 0.3).astype(np.float32)
    h0 = rng.rand(6, x.shape[1]).astype(np.float32)
    h_m = model.transform(x, h0=h0, max_iter=15, mask=mask)
    # equals the direct masked h-only solve
    from nmf_tpu import solve_masked_h_only

    ref = solve_masked_h_only(
        x, model.w_, h0, mask, model._config(15, shape=x.shape)
    )
    np.testing.assert_array_equal(h_m, np.asarray(ref.h))
    # out_of_core now routes to the streamed masked scorer (one block at
    # this size, per-block seeded default h0 — finite, right shape)
    h_ooc = model.transform(x, mask=mask, out_of_core=True)
    assert h_ooc.shape == (6, x.shape[1])
    assert np.isfinite(h_ooc).all()


def test_nmf_sklearn_clone_and_params(small_problem):
    """get_params/set_params satisfy sklearn.base.clone (the contract
    Pipeline and the model-selection utilities build on)."""
    from sklearn.base import clone

    est = NMF(n_components=4, init="random", max_iter=10, solver="cd",
              alpha_W=0.1, l1_ratio=0.5, accelerate=True)
    params = est.get_params()
    assert params["n_components"] == 4
    assert params["solver"] == "hals"      # 'cd' normalizes to its alias
    assert params["accelerate"] is True
    dup = clone(est)
    assert dup.get_params() == params
    assert dup.components_ is None         # clone is unfitted
    est.set_params(max_iter=7, solver="cd")
    assert est.max_iter == 7 and est.solver == "hals"
    with pytest.raises(ValueError, match="invalid parameter"):
        est.set_params(bogus=1)


def test_nmf_gridsearchcv_integration(small_problem):
    """The estimator runs under GridSearchCV end to end: clone per
    candidate/fold, fit, then score(X, y=None) on the held-out split."""
    from sklearn.model_selection import GridSearchCV

    x, _, _ = small_problem
    gs = GridSearchCV(
        NMF(n_components=3, init="random", max_iter=8, check_every=8),
        {"n_components": [2, 3]},
        cv=2,
        error_score="raise",
    )
    gs.fit(x)
    assert gs.best_params_["n_components"] in (2, 3)
    assert np.isfinite(gs.best_score_)
    # refit best estimator is usable
    h = gs.best_estimator_.transform(x[:, :16], max_iter=5)
    assert h.shape == (gs.best_params_["n_components"], 16)


def test_normalize_factors_invariant(small_problem):
    """Unit-norm W columns with compensated H: the product is unchanged,
    the chosen norm holds, zero columns pass through."""
    from nmf_tpu import normalize_factors, solve

    x, w0, h0 = small_problem
    res = solve(x, w0, h0, SolveConfig(max_iter=10))
    w, h = np.asarray(res.w), np.asarray(res.h)
    for norm, check in (
        ("l1", lambda wn: wn.sum(axis=0)),
        ("l2", lambda wn: np.sqrt((wn * wn).sum(axis=0))),
        ("max", lambda wn: wn.max(axis=0)),
    ):
        wn, hn = normalize_factors(w, h, norm=norm)
        np.testing.assert_allclose(check(wn), 1.0, rtol=1e-6)
        np.testing.assert_allclose(wn @ hn, w @ h, rtol=1e-5, atol=1e-7)
    # zero column passes through unscaled
    wz = w.copy(); wz[:, 0] = 0.0
    wn, hn = normalize_factors(wz, h, norm="l1")
    assert (wn[:, 0] == 0).all()
    np.testing.assert_array_equal(hn[0], h[0])
    with pytest.raises(ValueError, match="norm"):
        normalize_factors(w, h, norm="bogus")
