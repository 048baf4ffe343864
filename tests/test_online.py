"""Online (one-pass streaming) dictionary learning."""

import numpy as np
import pytest

from nmf_tpu import SolveConfig, solve, solve_h_only, solve_online
from nmf_tpu.io import binio

from oracle import clamp


@pytest.fixture(scope="module")
def planted():
    rng = np.random.RandomState(5)
    m, k, n = 96, 8, 1200
    wt = rng.rand(m, k).astype(np.float32)
    ht = rng.rand(k, n).astype(np.float32)
    x = (wt @ ht + 0.02 * rng.rand(m, n)).astype(np.float32)
    w0 = rng.rand(m, k).astype(np.float32)
    return x, w0


def _refit_cost(x, w):
    """Quality metric for a learned dictionary: KL after an H-only refit."""
    rng = np.random.RandomState(9)
    h0 = rng.rand(w.shape[1], x.shape[1]).astype(np.float32)
    res = solve_h_only(x, w, h0, SolveConfig(max_iter=80, check_every=80))
    return float(res.cost)


def test_online_learns_batch_quality_dictionary(planted):
    x, w0 = planted
    res = solve_online(
        x, w0, SolveConfig(), block_n=200, inner_iters=25, passes=3, seed=1
    )
    assert res.w.shape == w0.shape
    assert np.all(res.w >= 0) and np.isfinite(res.w).all()
    # batch reference: a full alternating solve with a comparable budget
    rng = np.random.RandomState(2)
    h0 = rng.rand(w0.shape[1], x.shape[1]).astype(np.float32)
    batch = solve(x, w0, h0, SolveConfig(max_iter=75, check_every=75))
    online_q = _refit_cost(x, res.w)
    batch_q = _refit_cost(x, np.asarray(batch.w))
    init_q = _refit_cost(x, clamp(w0))
    # the streamed dictionary must close most of the init->batch gap
    assert online_q < init_q
    assert (online_q - batch_q) / (init_q - batch_q + 1e-12) < 0.35, (
        f"online refit {online_q:.2f} vs batch {batch_q:.2f} "
        f"(init {init_q:.2f})"
    )


def test_online_learning_curve_improves_across_passes(planted):
    x, w0 = planted
    res = solve_online(
        x, w0, SolveConfig(), block_n=300, inner_iters=15, passes=2, seed=0
    )
    assert res.passes == 2
    assert len(res.block_costs) == 2
    assert sum(res.block_costs[1]) < sum(res.block_costs[0])
    assert res.learning_curve.shape == (2 * len(res.blocks),)


def test_online_bin_source_matches_array(planted, tmp_path):
    x, w0 = planted
    path = str(tmp_path / "X.bin")
    binio.write_matrix(x, path)
    cfg = SolveConfig()
    a = solve_online(x, w0, cfg, block_n=256, inner_iters=5, seed=3)
    b = solve_online(path, w0, cfg, block_n=256, inner_iters=5, seed=3)
    np.testing.assert_array_equal(a.w, b.w)


def test_online_forgetting_tracks_drift():
    """With rho < 1 the dictionary adapts to a distribution shift; with
    rho = 1 the stale history holds it back."""
    rng = np.random.RandomState(11)
    m, k, n_half = 64, 4, 600
    w_a = rng.rand(m, k).astype(np.float32)
    w_b = rng.rand(m, k).astype(np.float32)  # the post-shift dictionary
    h1 = rng.rand(k, n_half).astype(np.float32)
    h2 = rng.rand(k, n_half).astype(np.float32)
    x = np.concatenate([w_a @ h1, w_b @ h2], axis=1).astype(np.float32)
    x_late = np.ascontiguousarray(x[:, n_half:])
    w0 = rng.rand(m, k).astype(np.float32)
    cfg = SolveConfig()
    kw = dict(block_n=100, inner_iters=20, seed=0)
    adaptive = solve_online(x, w0, cfg, rho=0.5, **kw)
    static = solve_online(x, w0, cfg, rho=1.0, **kw)
    # judged on the LATE data only, forgetting must help
    assert _refit_cost(x_late, adaptive.w) < _refit_cost(x_late, static.w)


def test_online_x_dtypes(planted):
    from nmf_tpu.utils.config import Precision

    x, w0 = planted
    ref = solve_online(x, w0, SolveConfig(), block_n=400, inner_iters=5)
    for xd in ("bfloat16", "int8"):
        cfg = SolveConfig(precision=Precision(x_dtype=xd))
        res = solve_online(x, w0, cfg, block_n=400, inner_iters=5)
        assert np.isfinite(res.w).all()
        # lossy storage: dictionary close, not equal
        rel = np.abs(res.w - ref.w).max() / ref.w.max()
        assert rel < 0.05, f"{xd}: {rel}"


def test_online_validation(planted):
    x, w0 = planted
    with pytest.raises(NotImplementedError):
        solve_online(x, w0, SolveConfig(beta=2.0))
    with pytest.raises(ValueError):
        solve_online(x, w0, SolveConfig(), rho=0.0)
    with pytest.raises(ValueError):
        solve_online(x, w0, SolveConfig(), inner_iters=0)
    with pytest.raises(ValueError):
        solve_online(x, w0[:-1], SolveConfig())


@pytest.mark.parametrize("shape", [(4, 2), (2, 4)])
def test_online_on_mesh_matches_single_device(planted, shape):
    from nmf_tpu.parallel.mesh import make_mesh

    x, w0 = planted
    mesh = make_mesh(shape=shape)
    kw = dict(block_n=300, inner_iters=10, passes=2, seed=2)
    single = solve_online(x, w0, SolveConfig(), **kw)
    meshed = solve_online(x, w0, SolveConfig(), mesh=mesh, **kw)
    np.testing.assert_allclose(meshed.w, single.w, rtol=5e-5,
                               atol=1e-6 * float(single.w.max()))
    np.testing.assert_allclose(
        np.asarray(meshed.block_costs), np.asarray(single.block_costs),
        rtol=1e-5,
    )


def test_online_int8_on_mesh(planted):
    from nmf_tpu.parallel.mesh import make_mesh
    from nmf_tpu.utils.config import Precision

    x, w0 = planted
    cfg = SolveConfig(precision=Precision(x_dtype="int8"))
    mesh = make_mesh(shape=(2, 2))
    kw = dict(block_n=400, inner_iters=5, seed=1)
    single = solve_online(x, w0, cfg, **kw)
    meshed = solve_online(x, w0, cfg, mesh=mesh, **kw)
    np.testing.assert_allclose(meshed.w, single.w, rtol=5e-5,
                               atol=1e-6 * float(single.w.max()))


def test_online_no_cost_tracking(planted):
    x, w0 = planted
    res = solve_online(
        x, w0, SolveConfig(track_cost=False), block_n=400, inner_iters=5
    )
    assert res.block_costs == [[]]
    assert res.learning_curve.shape == (0,)
    assert np.isfinite(res.w).all()


def test_online_mesh_rejects_indivisible_block_n(planted):
    from nmf_tpu.parallel.mesh import make_mesh

    x, w0 = planted
    with pytest.raises(ValueError, match="multiple of the mesh column"):
        solve_online(
            x, w0, SolveConfig(), block_n=301, mesh=make_mesh(shape=(4, 2))
        )


def test_online_rejects_silently_ignored_knobs(planted):
    """backend='pallas' and live_metrics would be silent no-ops for the
    statistics-folded online updates — both error loudly."""
    x, w0 = planted
    with pytest.raises(NotImplementedError, match="pallas"):
        solve_online(x, w0, SolveConfig(backend="pallas"), block_n=400)
    with pytest.raises(NotImplementedError, match="block_costs"):
        solve_online(x, w0, SolveConfig(live_metrics=True, track_cost=True),
                     block_n=400)
