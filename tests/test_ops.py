"""Unit tests for the core ops against the NumPy oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from nmf_tpu.ops import (
    EPS,
    beta_divergence,
    eps_clamp,
    euclidean_cost,
    itakura_saito,
    kl_divergence,
    mu_step,
    mu_step_beta,
    update_h,
    update_w,
)
from nmf_tpu.utils.config import Precision

from oracle import np_kl, np_mu_step, np_update_h, np_update_w, clamp


def test_eps_constant_matches_reference():
    # bit-identical to float(2.2204E-16) from cuda/matrix.cu:10
    assert np.float32(EPS).tobytes() == np.float32(2.2204e-16).tobytes()


def test_eps_clamp_is_clamp_not_add():
    x = jnp.asarray([0.0, 1e-20, EPS, 1.0, -3.0], jnp.float32)
    y = eps_clamp(x)
    np.testing.assert_array_equal(
        np.asarray(y), np.float32([EPS, EPS, EPS, 1.0, EPS])
    )


def test_eps_clamp_keeps_nan():
    y = eps_clamp(jnp.asarray([np.nan], jnp.float32))
    assert np.isnan(np.asarray(y))[0]


def test_update_h_matches_oracle(small_problem):
    x, w, h = (clamp(a) for a in small_problem)
    ours = np.asarray(update_h(jnp.asarray(w), jnp.asarray(h), jnp.asarray(x)))
    ref = np_update_h(w, h, x)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=1e-7)


def test_update_w_matches_oracle(small_problem):
    x, w, h = (clamp(a) for a in small_problem)
    ours = np.asarray(update_w(jnp.asarray(w), jnp.asarray(h), jnp.asarray(x)))
    ref = np_update_w(w, h, x)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=1e-7)


def test_mu_step_matches_oracle_multi_iter(small_problem):
    x, w, h = (clamp(a) for a in small_problem)
    wj, hj = jnp.asarray(w), jnp.asarray(h)
    wn, hn = w, h
    for _ in range(5):
        wj, hj = mu_step(wj, hj, jnp.asarray(x))
        wn, hn = np_mu_step(wn, hn, x)
    np.testing.assert_allclose(np.asarray(wj), wn, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hj), hn, rtol=2e-4, atol=1e-6)


def test_kl_matches_oracle(small_problem):
    x, w, h = (clamp(a) for a in small_problem)
    ours = float(kl_divergence(jnp.asarray(x), jnp.asarray(w), jnp.asarray(h)))
    ref = np_kl(x, w, h)
    assert abs(ours - ref) / abs(ref) < 1e-5


def test_kl_monotone_nonincreasing(small_problem):
    """MU updates never increase the KL cost (Lee & Seung 2001 guarantee)."""
    x, w, h = (jnp.asarray(clamp(a)) for a in small_problem)
    prev = float(kl_divergence(x, w, h))
    for _ in range(20):
        w, h = mu_step(w, h, x)
        cur = float(kl_divergence(x, w, h))
        assert cur <= prev * (1 + 1e-6), "KL cost increased"
        prev = cur


def test_nonnegativity_preserved(small_problem):
    x, w, h = (jnp.asarray(clamp(a)) for a in small_problem)
    for _ in range(10):
        w, h = mu_step(w, h, x)
    assert float(jnp.min(w)) >= 0.0
    assert float(jnp.min(h)) >= 0.0


def test_bf16_precision_close_to_fp32(small_problem):
    x, w, h = (jnp.asarray(clamp(a)) for a in small_problem)
    bf16 = Precision("bfloat16", "float32")
    w32, h32 = mu_step(w, h, x)
    wb, hb = mu_step(w, h, x, precision=bf16)
    # bf16 has ~3 decimal digits; updates are ratios near 1 so stay close
    np.testing.assert_allclose(np.asarray(wb), np.asarray(w32), rtol=0.05)
    np.testing.assert_allclose(np.asarray(hb), np.asarray(h32), rtol=0.05)
    assert wb.dtype == jnp.float32  # state dtype preserved


@pytest.mark.parametrize("beta", [0.0, 0.5, 1.0, 1.5, 2.0])
def test_beta_mu_monotone(small_problem, beta):
    """Beta-divergence MU decreases its own cost for beta in [0, 2]."""
    x, w, h = (jnp.asarray(clamp(a)) for a in small_problem)
    prev = float(beta_divergence(x, w, h, beta))
    for _ in range(10):
        w, h = mu_step_beta(w, h, x, beta)
        cur = float(beta_divergence(x, w, h, beta))
        assert cur <= prev * (1 + 1e-5)
        prev = cur


def test_beta_special_cases_match_named_costs(small_problem):
    x, w, h = (jnp.asarray(clamp(a)) for a in small_problem)
    assert float(beta_divergence(x, w, h, 2.0)) == pytest.approx(
        float(euclidean_cost(x, w, h)), rel=1e-6
    )
    assert float(beta_divergence(x, w, h, 1.0)) == pytest.approx(
        float(kl_divergence(x, w, h)), rel=1e-6
    )
    assert float(beta_divergence(x, w, h, 0.0)) == pytest.approx(
        float(itakura_saito(x, w, h)), rel=1e-6
    )


def test_beta1_step_matches_kl_step(small_problem):
    """mu_step_beta(beta=1) must agree with the reference-exact KL mu_step."""
    x, w, h = (jnp.asarray(clamp(a)) for a in small_problem)
    w1, h1 = mu_step(w, h, x)
    w2, h2 = mu_step_beta(w, h, x, 1.0)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=2e-5)


@pytest.mark.parametrize("beta", [0.0, 0.5, 1.5, 2.0])
def test_beta_mu_step_matches_numpy_oracle(small_problem, beta):
    """An independent NumPy beta-MU implementation (textbook Fevotte 2011
    form, same clamp sites as ops.mu._beta_ratios) agrees elementwise."""
    EPSV = 2.2204e-16

    def np_beta_step(w, h, x, b):
        def ratios(w, h):
            y = np.maximum(w @ h, EPSV)
            return x * y ** (b - 2.0), y ** (b - 1.0)

        num, den = ratios(w, h)
        h = h * (w.T @ num) / np.maximum(w.T @ den, EPSV)
        num, den = ratios(w, h)
        w = w * (num @ h.T) / np.maximum(den @ h.T, EPSV)
        return w, h

    x, w, h = (clamp(np.asarray(a, np.float64)) for a in small_problem)
    wn, hn = np_beta_step(w.copy(), h.copy(), x, beta)
    wj, hj = mu_step_beta(
        jnp.asarray(w, jnp.float32), jnp.asarray(h, jnp.float32),
        jnp.asarray(x, jnp.float32), beta,
    )
    np.testing.assert_allclose(np.asarray(wj), wn, rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(hj), hn, rtol=2e-4, atol=1e-7)
