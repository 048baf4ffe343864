"""Strict reference-replication mode: padded-EPS semantics (SURVEY 2.4)."""

import numpy as np
import pytest

from nmf_tpu import SolveConfig, solve
from nmf_tpu.models.strict import PAD_MULT, pad_to_mult, solve_strict

EPS = np.float32(2.2204e-16)


def _np_padded_reference(x, w, h, iters):
    """NumPy oracle of the reference algorithm INCLUDING its padding
    artifacts: buffers padded to 32-multiples, clamps over the padded
    extents, sums over padded dims (nmf.cu:118-176 + matrix.cu:191,
    277-278, 396-397)."""
    m, k = w.shape
    n = h.shape[1]
    xp = np.maximum(pad_to_mult(x), EPS)
    wp = np.maximum(pad_to_mult(w), EPS)
    hp = np.maximum(pad_to_mult(h), EPS)
    for _ in range(iters):
        z = xp / np.maximum(wp @ hp, EPS)
        sumw = np.maximum(wp.sum(axis=0, dtype=np.float32), EPS)
        hp = hp * (wp.T @ z) / sumw[:, None]
        z = xp / np.maximum(wp @ hp, EPS)
        sumh = np.maximum(hp.sum(axis=1, dtype=np.float32), EPS)
        wp = wp * (z @ hp.T) / sumh[None, :]
    return wp[:m, :k], hp[:k, :n]


@pytest.fixture(scope="module")
def unaligned_problem():
    rng = np.random.RandomState(23)
    m, k, n = 96, 12, 130  # K and N both pad (12->32, 130->160)
    x = rng.rand(m, n).astype(np.float32)
    w = rng.rand(m, k).astype(np.float32)
    h = rng.rand(k, n).astype(np.float32)
    return x, w, h


def test_strict_matches_padded_numpy_oracle(unaligned_problem):
    x, w, h = unaligned_problem
    res = solve_strict(x, w, h, SolveConfig(max_iter=30, track_cost=False))
    ow, oh = _np_padded_reference(x, w, h, 30)
    np.testing.assert_allclose(np.asarray(res.w), ow, rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.h), oh, rtol=2e-5, atol=1e-7)


def test_strict_differs_from_clean_solver_via_padding(unaligned_problem):
    """The padded-EPS contamination is real but tiny: strict != clean
    bit-for-bit, while costs agree to the 1e-4 parity bar (SURVEY 2.4)."""
    x, w, h = unaligned_problem
    cfg = SolveConfig(max_iter=30, check_every=30)
    clean = solve(x, w, h, cfg)
    strict = solve_strict(x, w, h, cfg)
    assert not np.array_equal(np.asarray(strict.h), np.asarray(clean.h))
    # padded-extent cost vs clean cost: within the documented parity bar
    assert float(strict.cost) == pytest.approx(float(clean.cost), rel=1e-4)


def test_strict_equals_clean_when_aligned():
    """With every dim a 32-multiple there is no padding: strict mode IS the
    clean jnp f32 solver, bitwise."""
    rng = np.random.RandomState(5)
    m, k, n = 64, 32, 128
    x = rng.rand(m, n).astype(np.float32)
    w = rng.rand(m, k).astype(np.float32)
    h = rng.rand(k, n).astype(np.float32)
    cfg = SolveConfig(max_iter=20, backend="jnp")
    a = solve_strict(x, w, h, cfg)
    b = solve(x, w, h, cfg)
    np.testing.assert_array_equal(np.asarray(a.w), np.asarray(b.w))
    np.testing.assert_array_equal(np.asarray(a.h), np.asarray(b.h))


def test_strict_run_to_run_deterministic(unaligned_problem):
    """The md5 contract's foundation: identical bits across runs."""
    x, w, h = unaligned_problem
    cfg = SolveConfig(max_iter=25, track_cost=False)
    a = solve_strict(x, w, h, cfg)
    b = solve_strict(x, w, h, cfg)
    np.testing.assert_array_equal(np.asarray(a.w), np.asarray(b.w))
    np.testing.assert_array_equal(np.asarray(a.h), np.asarray(b.h))


def test_pad_to_mult():
    a = np.ones((5, 33), np.float32)
    p = pad_to_mult(a)
    assert p.shape == (32, 64)
    assert p[:5, :33].sum() == 5 * 33
    assert p.sum() == 5 * 33  # padding is exact zeros before the load clamp
    same = np.ones((32, 64), np.float32)
    assert pad_to_mult(same) is not None and pad_to_mult(same).shape == (32, 64)
    assert PAD_MULT == 32


def test_strict_rejects_other_algorithms(small_problem):
    """strict mode replicates the reference's plain KL MU — any config that
    changes the update rule errors instead of mislabeling its output."""
    x, w, h = small_problem
    for bad in (
        SolveConfig(max_iter=5, accelerate=True),
        SolveConfig(max_iter=5, algorithm="hals", beta=2.0),
        SolveConfig(max_iter=5, beta=2.0),
        SolveConfig(max_iter=5, l1_h=0.1),
    ):
        with pytest.raises(ValueError, match="replicates"):
            solve_strict(x, w, h, bad)
