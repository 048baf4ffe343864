"""Distributed-solver tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from nmf_tpu import SolveConfig, solve
from nmf_tpu.parallel import batched, mesh as meshmod, sharded

from oracle import clamp


@pytest.fixture(scope="module")
def problem():
    rng = np.random.RandomState(3)
    m, k, n = 128, 16, 160  # divisible by all mesh shapes used below
    x = rng.rand(m, n).astype(np.float32)
    w = rng.rand(m, k).astype(np.float32)
    h = rng.rand(k, n).astype(np.float32)
    return x, w, h


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_make_mesh_default_shape():
    m = meshmod.make_mesh()
    assert m.shape == {"mr": 4, "mc": 2}
    # explicit smaller shapes take a device subset
    assert meshmod.make_mesh(shape=(3, 2)).shape == {"mr": 3, "mc": 2}
    with pytest.raises(ValueError):
        meshmod.make_mesh(shape=(3, 3))  # needs 9 > 8 devices


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4), (1, 8), (2, 2), (1, 1)])
def test_sharded_matches_single_device(problem, shape):
    """The collectives must not change the math: sharded == single-device."""
    x, w, h = problem
    cfg = SolveConfig(max_iter=20, check_every=5)
    ref = solve(x, w, h, cfg)
    devs = jax.devices()[: shape[0] * shape[1]]
    m = meshmod.make_mesh(shape=shape, devices=devs)
    res = sharded.solve_sharded(x, w, h, cfg, mesh=m)
    assert int(res.iterations) == 20
    # fp32 summation order differs across shardings -> tight but not bitwise
    np.testing.assert_allclose(np.asarray(res.w), np.asarray(ref.w), rtol=5e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.h), np.asarray(ref.h), rtol=5e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(res.cost_history), np.asarray(ref.cost_history), rtol=1e-5
    )


def test_sharded_convergence_predicate_uniform(problem):
    """Early stopping works identically under sharding (replicated scalar)."""
    x, w, h = problem
    cfg = SolveConfig(max_iter=100_000, thresh=1e-3, check_every=10)
    ref = solve(x, w, h, cfg)
    res = sharded.solve_sharded(x, w, h, cfg, mesh=meshmod.make_mesh(shape=(2, 4)))
    assert bool(res.converged)
    assert int(res.iterations) == int(ref.iterations)


def test_sharded_result_shardings(problem):
    x, w, h = problem
    m = meshmod.make_mesh(shape=(4, 2))
    res = sharded.solve_sharded(x, w, h, SolveConfig(max_iter=4), mesh=m)
    # W row-sharded: each device holds M/4 rows
    w_shard_shapes = {s.data.shape for s in res.w.addressable_shards}
    assert w_shard_shapes == {(128 // 4, 16)}
    h_shard_shapes = {s.data.shape for s in res.h.addressable_shards}
    assert h_shard_shapes == {(16, 160 // 2)}
    # scalars replicated on every device
    assert len(res.cost.addressable_shards) == 8


def test_sharded_rejects_indivisible(problem):
    x, w, h = problem
    m = meshmod.make_mesh(shape=(8, 1))
    bad_x = np.vstack([x, x[:4]])  # 132 rows, not divisible by 8
    bad_w = np.vstack([w, w[:4]])
    with pytest.raises(Exception):
        sharded.solve_sharded(bad_x, bad_w, h, SolveConfig(max_iter=1), mesh=m)


def test_batched_matches_loop(problem):
    x, w, h = problem
    rng = np.random.RandomState(11)
    B = 4
    xs = np.stack([clamp(rng.rand(*x.shape).astype(np.float32)) for _ in range(B)])
    ws = np.stack([clamp(rng.rand(*w.shape).astype(np.float32)) for _ in range(B)])
    hs = np.stack([clamp(rng.rand(*h.shape).astype(np.float32)) for _ in range(B)])
    cfg = SolveConfig(max_iter=10, check_every=5)
    res = batched.solve_batched(xs, ws, hs, cfg)
    assert res.w.shape == (B, *w.shape)
    for b in range(B):
        ref = solve(xs[b], ws[b], hs[b], cfg)
        np.testing.assert_allclose(
            np.asarray(res.w[b]), np.asarray(ref.w), rtol=5e-5, atol=1e-7
        )
        assert float(res.cost[b]) == pytest.approx(float(ref.cost), rel=1e-5)


def test_batched_data_parallel_mesh(problem):
    x, w, h = problem
    rng = np.random.RandomState(12)
    B = 8
    xs = clamp(rng.rand(B, *x.shape).astype(np.float32))
    ws = clamp(rng.rand(B, *w.shape).astype(np.float32))
    hs = clamp(rng.rand(B, *h.shape).astype(np.float32))
    mesh = Mesh(np.asarray(jax.devices()), ("batch",))
    cfg = SolveConfig(max_iter=5, check_every=5)
    res = batched.solve_batched(xs, ws, hs, cfg, mesh=mesh)
    ref = batched.solve_batched(xs, ws, hs, cfg)
    np.testing.assert_allclose(np.asarray(res.w), np.asarray(ref.w), rtol=5e-5, atol=1e-7)
    # batch really is sharded: one problem per device
    assert {s.data.shape[0] for s in res.w.addressable_shards} == {1}


@pytest.mark.slow  # 16 per-member reference solves; heaviest test in the file
def test_batched_early_stop_per_member(problem):
    """Converged members freeze while others keep iterating."""
    x, w, h = problem
    rng = np.random.RandomState(13)
    # member 0: rank-1-ish easy problem (converges fast); member 1: random
    easy = np.outer(rng.rand(x.shape[0]), rng.rand(x.shape[1])).astype(np.float32)
    xs = np.stack([clamp(easy), clamp(rng.rand(*x.shape).astype(np.float32))])
    ws = clamp(rng.rand(2, *w.shape).astype(np.float32))
    hs = clamp(rng.rand(2, *h.shape).astype(np.float32))
    cfg = SolveConfig(max_iter=100_000, thresh=1e-4, check_every=10)
    res = batched.solve_batched(xs, ws, hs, cfg)
    assert bool(res.converged[0]) and bool(res.converged[1])
    its = np.asarray(res.iterations)
    ref0 = solve(xs[0], ws[0], hs[0], cfg)
    assert int(its[0]) == int(ref0.iterations)  # per-member stopping point


# ---------------------------------------------------------------------------
# Extensions x parallelism: sharded == single-device for the regularized,
# masked, HALS, and h-only solvers (the extension matrix is orthogonal to
# the parallelism matrix).
# ---------------------------------------------------------------------------


def _assert_close_scaled(a, b, rel: float = 1e-5):
    """allclose with atol relative to the array's own scale (for HALS, whose
    max(., 0) truncation leaves near-boundary entries with unbounded
    RELATIVE sensitivity to fp summation order, while absolute deviations
    stay ~1e-5 of the factor magnitude)."""
    a, b = np.asarray(a), np.asarray(b)
    np.testing.assert_allclose(
        a, b, rtol=5e-4, atol=rel * max(float(np.abs(b).max()), 1e-6)
    )


@pytest.mark.parametrize("shape", [(4, 2), (2, 4), (8, 1)])
def test_sharded_regularized_matches_single_device(problem, shape):
    x, w, h = problem
    cfg = SolveConfig(
        max_iter=20, check_every=5, l1_w=0.01, l1_h=0.02, l2_w=0.05, l2_h=0.03
    )
    ref = solve(x, w, h, cfg)
    m = meshmod.make_mesh(shape=shape)
    res = sharded.solve_sharded(x, w, h, cfg, mesh=m)
    assert int(res.iterations) == 20
    np.testing.assert_allclose(np.asarray(res.w), np.asarray(ref.w), rtol=5e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.h), np.asarray(ref.h), rtol=5e-5, atol=1e-7)
    # the penalized objective (incl. replication-normalized penalty partials)
    np.testing.assert_allclose(
        np.asarray(res.cost_history), np.asarray(ref.cost_history), rtol=1e-5
    )


@pytest.mark.parametrize("shape", [(4, 2), (2, 4)])
def test_sharded_masked_matches_single_device(problem, shape):
    from nmf_tpu.models.masked import solve_masked

    x, w, h = problem
    rng = np.random.RandomState(9)
    mask = (rng.rand(*x.shape) > 0.3).astype(np.float32)
    cfg = SolveConfig(max_iter=20, check_every=5)
    ref = solve_masked(x, w, h, mask, cfg)
    m = meshmod.make_mesh(shape=shape)
    res = solve_masked(x, w, h, mask, cfg, mesh=m)
    assert int(res.iterations) == 20
    np.testing.assert_allclose(np.asarray(res.w), np.asarray(ref.w), rtol=5e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.h), np.asarray(ref.h), rtol=5e-5, atol=1e-7)
    assert float(res.cost) == pytest.approx(float(ref.cost), rel=1e-5)
    # result factors keep the canonical shardings
    assert len(res.w.sharding.device_set) == shape[0] * shape[1]


@pytest.mark.parametrize("shape", [(4, 2), (2, 4)])
@pytest.mark.parametrize("kind", ["kl", "reg", "beta2"])
def test_sharded_h_only_matches_single_device(problem, shape, kind):
    from nmf_tpu.models.nmf import solve_h_only

    x, w, h = problem
    cfg = {
        "kl": SolveConfig(max_iter=20, check_every=5),
        "reg": SolveConfig(max_iter=20, check_every=5, l1_h=0.02, l2_h=0.04),
        "beta2": SolveConfig(max_iter=20, check_every=5, beta=2.0),
    }[kind]
    ref = solve_h_only(x, w, h, cfg)
    m = meshmod.make_mesh(shape=shape)
    res = solve_h_only(x, w, h, cfg, mesh=m)
    assert int(res.iterations) == 20
    # W untouched in both
    np.testing.assert_allclose(np.asarray(res.w), np.asarray(ref.w), rtol=5e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.h), np.asarray(ref.h), rtol=5e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(res.cost_history), np.asarray(ref.cost_history), rtol=1e-5
    )


@pytest.mark.parametrize("shape", [(4, 2), (2, 4)])
def test_sharded_h_only_hals_matches_single_device(problem, shape):
    """HALS h-only on a mesh: the row sweep is local per column shard."""
    from nmf_tpu.models.nmf import solve_h_only

    x, w, h = problem
    cfg = SolveConfig(max_iter=20, check_every=5, beta=2.0, algorithm="hals")
    ref = solve_h_only(x, w, h, cfg)
    res = solve_h_only(x, w, h, cfg, mesh=meshmod.make_mesh(shape=shape))
    assert int(res.iterations) == 20
    np.testing.assert_allclose(np.asarray(res.w), np.asarray(ref.w), rtol=5e-5, atol=1e-7)
    # HALS truncation (max(., 0)) makes entries near the boundary relatively
    # ill-conditioned under fp reordering: compare scale-relative, and pin
    # the objective tightly
    _assert_close_scaled(res.h, ref.h)
    np.testing.assert_allclose(
        np.asarray(res.cost_history), np.asarray(ref.cost_history), rtol=1e-5
    )


def test_sharded_masked_regularized_matches_single_device(problem):
    from nmf_tpu.models.masked import solve_masked

    x, w, h = problem
    rng = np.random.RandomState(21)
    mask = (rng.rand(*x.shape) > 0.3).astype(np.float32)
    cfg = SolveConfig(max_iter=20, check_every=5, l1_h=0.02, l2_w=0.01)
    ref = solve_masked(x, w, h, mask, cfg)
    res = solve_masked(x, w, h, mask, cfg, mesh=meshmod.make_mesh(shape=(4, 2)))
    np.testing.assert_allclose(np.asarray(res.w), np.asarray(ref.w), rtol=5e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(res.cost_history), np.asarray(ref.cost_history), rtol=1e-5
    )


def test_estimator_mesh_fit_transform(problem):
    """NMF(mesh=...) routes fit and transform through the sharded solvers."""
    from nmf_tpu.models.nmf import NMF

    x, _, _ = problem
    est = NMF(n_components=8, init="random", max_iter=20, mesh=meshmod.make_mesh(shape=(4, 2)))
    est_ref = NMF(n_components=8, init="random", max_iter=20)
    w_m = est.fit_transform(x)
    w_s = est_ref.fit_transform(x)
    np.testing.assert_allclose(w_m, w_s, rtol=5e-5, atol=1e-7)
    h_m = est.transform(x, max_iter=10)
    h_s = est_ref.transform(x, max_iter=10)
    np.testing.assert_allclose(h_m, h_s, rtol=5e-5, atol=1e-7)


@pytest.mark.parametrize("shape", [(4, 2), (2, 4), (8, 1), (1, 8)])
def test_sharded_hals_matches_single_device(problem, shape):
    """Sharded HALS == single-device: the rank-axis coordinate sweep is
    replicated; only the Gram/cross products psum (see hals_step_sharded)."""
    x, w, h = problem
    cfg = SolveConfig(max_iter=20, check_every=5, beta=2.0, algorithm="hals")
    ref = solve(x, w, h, cfg)
    m = meshmod.make_mesh(shape=shape)
    res = sharded.solve_sharded(x, w, h, cfg, mesh=m)
    assert int(res.iterations) == 20
    # HALS truncation (max(., 0)) makes entries near the boundary relatively
    # ill-conditioned under fp reordering: compare scale-relative, and pin
    # the objective tightly
    _assert_close_scaled(res.w, ref.w)
    _assert_close_scaled(res.h, ref.h)
    np.testing.assert_allclose(
        np.asarray(res.cost_history), np.asarray(ref.cost_history), rtol=1e-5
    )
    # HALS can introduce exact zeros; factors stay nonnegative under sharding
    assert float(jnp.min(res.w)) >= 0.0 and float(jnp.min(res.h)) >= 0.0


def test_sharded_masked_live_metrics_once_per_check(problem):
    """Masked/h-only mesh solvers gate live emission to device (0,0) too."""
    from nmf_tpu.models.masked import solve_masked
    from nmf_tpu.models.nmf import solve_h_only
    from nmf_tpu.utils import metrics as m

    x, w, h = problem
    rng = np.random.RandomState(2)
    mask = (rng.rand(*x.shape) > 0.2).astype(np.float32)
    mesh = meshmod.make_mesh(shape=(4, 2))
    cfg = SolveConfig(max_iter=20, check_every=10, live_metrics=True)
    events = []
    m.set_live_handler(lambda it, c, r: events.append(it))
    try:
        solve_masked(x, w, h, mask, cfg, mesh=mesh)
        jax.effects_barrier()
        masked_events = list(events)
        events.clear()
        solve_h_only(x, w, h, cfg, mesh=mesh)
        jax.effects_barrier()
        h_events = list(events)
    finally:
        m.set_live_handler(None)
    assert masked_events == [10, 20]
    assert h_events == [10, 20]


def test_build_sharded_solver_is_cached(problem):
    cfg = SolveConfig(max_iter=10)
    mesh = meshmod.make_mesh(shape=(4, 2))
    a = sharded.build_sharded_solver(cfg, mesh, fused=False)
    b = sharded.build_sharded_solver(cfg, mesh, fused=False)
    assert a is b  # chunked/segmented drivers must not retrace per segment


@pytest.mark.parametrize("kind", ["beta2", "reg", "hals"])
def test_batched_extension_families_match_loop(problem, kind):
    """The extension families are orthogonal to batching: vmapped members ==
    per-member solo solves."""
    x, w, h = problem
    rng = np.random.RandomState(21)
    B = 3
    xs = clamp(rng.rand(B, *x.shape).astype(np.float32))
    ws = clamp(rng.rand(B, *w.shape).astype(np.float32))
    hs = clamp(rng.rand(B, *h.shape).astype(np.float32))
    if kind == "beta2":
        cfg = SolveConfig(max_iter=10, check_every=5, beta=2.0)
    elif kind == "hals":
        cfg = SolveConfig(max_iter=10, check_every=5, beta=2.0, algorithm="hals")
    else:
        cfg = SolveConfig(max_iter=10, check_every=5, l1_h=0.02, l2_w=0.01)
    res = batched.solve_batched(xs, ws, hs, cfg)
    for b in range(B):
        ref = solve(xs[b], ws[b], hs[b], cfg)
        w_ref = np.asarray(ref.w)
        tol = dict(rtol=5e-4, atol=1e-5 * float(np.abs(w_ref).max())) \
            if kind == "hals" else dict(rtol=5e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(res.w[b]), w_ref, **tol)
        assert float(res.cost[b]) == pytest.approx(float(ref.cost), rel=1e-5)


def test_batched_masked_matches_loop(problem):
    """Masked x batched: each member sees only its own mask."""
    from nmf_tpu.models.masked import solve_masked

    x, w, h = problem
    rng = np.random.RandomState(22)
    B = 3
    xs = clamp(rng.rand(B, *x.shape).astype(np.float32))
    ws = clamp(rng.rand(B, *w.shape).astype(np.float32))
    hs = clamp(rng.rand(B, *h.shape).astype(np.float32))
    masks = (rng.rand(B, *x.shape) > 0.25).astype(np.float32)
    cfg = SolveConfig(max_iter=10, check_every=5, l1_h=0.01)
    res = batched.solve_batched(xs, ws, hs, cfg, mask=masks)
    for b in range(B):
        ref = solve_masked(xs[b], ws[b], hs[b], masks[b], cfg)
        np.testing.assert_allclose(
            np.asarray(res.w[b]), np.asarray(ref.w), rtol=5e-5, atol=1e-7
        )
        assert float(res.cost[b]) == pytest.approx(float(ref.cost), rel=1e-5)
    # masked batched composes with the batch mesh too
    mesh = Mesh(np.asarray(jax.devices()[:3]), ("batch",))
    res_m = batched.solve_batched(xs, ws, hs, cfg, mesh=mesh, mask=masks)
    np.testing.assert_allclose(
        np.asarray(res_m.w), np.asarray(res.w), rtol=5e-5, atol=1e-7
    )
    # guards
    with pytest.raises(ValueError):
        batched.solve_batched(xs, ws, hs, cfg, mask=masks[:, :-1])
    with pytest.raises(NotImplementedError):
        batched.solve_batched(
            xs, ws, hs, SolveConfig(max_iter=2, beta=2.0), mask=masks
        )


def test_batched_masked_bf16_x_matches_loop(problem):
    """x_dtype is honored identically by the batched and solo masked paths."""
    from nmf_tpu.models.masked import solve_masked
    from nmf_tpu.utils.config import Precision

    x, w, h = problem
    rng = np.random.RandomState(23)
    B = 2
    xs = clamp(rng.rand(B, *x.shape).astype(np.float32))
    ws = clamp(rng.rand(B, *w.shape).astype(np.float32))
    hs = clamp(rng.rand(B, *h.shape).astype(np.float32))
    masks = (rng.rand(B, *x.shape) > 0.3).astype(np.float32)
    cfg = SolveConfig(
        max_iter=8, check_every=4,
        precision=Precision("float32", "float32", "bfloat16"),
    )
    res = batched.solve_batched(xs, ws, hs, cfg, mask=masks)
    for b in range(B):
        ref = solve_masked(xs[b], ws[b], hs[b], masks[b], cfg)
        np.testing.assert_allclose(
            np.asarray(res.w[b]), np.asarray(ref.w), rtol=5e-5, atol=1e-7
        )
    # int8 masked is supported since round 3 (quantized AFTER zeroing the
    # unobserved entries): batched members must match the single solver
    cfg8 = SolveConfig(max_iter=8, check_every=4,
                       precision=Precision(x_dtype="int8"))
    res8 = batched.solve_batched(xs, ws, hs, cfg8, mask=masks)
    ref8 = solve_masked(xs[0], ws[0], hs[0], masks[0], cfg8)
    np.testing.assert_allclose(
        np.asarray(res8.w[0]), np.asarray(ref8.w), rtol=5e-5, atol=1e-7
    )


def test_sharded_prequantized_pair_default_clamp_inputs(problem):
    """solve_sharded accepts a pre-quantized (codes, scales) pair under the
    DEFAULT clamp_inputs=True (the pair passes through the clamp branch) and
    matches the float-X int8 solve."""
    from nmf_tpu.ops import quant
    from nmf_tpu.utils.config import Precision

    x, w, h = problem
    x = clamp(x)
    eps = SolveConfig().eps
    cfg = SolveConfig(
        max_iter=10, check_every=5, precision=Precision(x_dtype="int8")
    )
    m = meshmod.make_mesh(shape=(2, 2), devices=jax.devices()[:4])
    pair = quant.quantize_policy(jnp.asarray(x), eps, 0)
    res_pair = sharded.solve_sharded(pair, w, h, cfg, mesh=m)
    res_full = sharded.solve_sharded(x, w, h, cfg, mesh=m)
    np.testing.assert_array_equal(np.asarray(res_pair.w), np.asarray(res_full.w))
    assert float(res_pair.cost) == float(res_full.cost)


def test_sharded_prequantized_pair_requires_int8(problem):
    from nmf_tpu.ops import quant

    x, w, h = problem
    eps = SolveConfig().eps
    pair = quant.quantize_policy(jnp.asarray(clamp(x)), eps, 0)
    m = meshmod.make_mesh(shape=(2, 2), devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="x_dtype='int8'"):
        sharded.solve_sharded(pair, w, h, SolveConfig(max_iter=4), mesh=m)


def test_sharded_pallas_int8_raises(problem):
    """backend='pallas' with int8 X on a mesh is a loud error (the mesh int8
    path is XLA-only), never a silent downgrade."""
    from nmf_tpu.utils.config import Precision

    x, w, h = problem
    cfg = SolveConfig(
        max_iter=4, backend="pallas", precision=Precision(x_dtype="int8")
    )
    m = meshmod.make_mesh(shape=(2, 2), devices=jax.devices()[:4])
    with pytest.raises(NotImplementedError, match="pallas"):
        sharded.solve_sharded(clamp(x), w, h, cfg, mesh=m)


def test_use_fused_keyed_on_mesh_platform():
    """The fused-kernel policy consults the MESH devices' platform: a CPU
    mesh never gets Mosaic kernels, whatever the default backend says."""
    cfg = SolveConfig(precision=__import__("nmf_tpu").utils.config.Precision(
        matmul_dtype="bfloat16"))
    # shapes large enough that the TPU rule table would pick pallas
    assert sharded._use_fused(cfg, 4096, 256, 4096, "tpu") in (True, False)
    assert sharded._use_fused(cfg, 4096, 256, 4096, "cpu") is False
    # explicit pallas still forces the kernels on any platform (dense X)
    cfg_p = SolveConfig(backend="pallas")
    assert sharded._use_fused(cfg_p, 64, 8, 64, "cpu") is True


def test_batched_2d_mesh_uses_all_devices(problem):
    """A 2-D mesh shards the batch over EVERY device (flattened), not just
    the first axis with silent replication over the second."""
    x, w, h = problem
    rng = np.random.RandomState(13)
    B = 8
    xs = clamp(rng.rand(B, *x.shape).astype(np.float32))
    ws = clamp(rng.rand(B, *w.shape).astype(np.float32))
    hs = clamp(rng.rand(B, *h.shape).astype(np.float32))
    mesh = meshmod.make_mesh(shape=(2, 2), devices=jax.devices()[:4])
    cfg = SolveConfig(max_iter=5, check_every=5)
    res = batched.solve_batched(xs, ws, hs, cfg, mesh=mesh)
    # 8 members over 4 devices -> 2 per shard, on all 4 devices
    assert {s.data.shape[0] for s in res.w.addressable_shards} == {2}
    assert len({s.device for s in res.w.addressable_shards}) == 4
    with pytest.raises(ValueError, match="ALL mesh axes"):
        batched.solve_batched(xs[:6], ws[:6], hs[:6], cfg, mesh=mesh)


def test_batched_masked_nan_holes(problem):
    """NaN/Inf at unobserved entries (the standard missing-data encoding)
    must not poison the masked batched solve."""
    from nmf_tpu import solve_masked

    x, w, h = problem
    rng = np.random.RandomState(14)
    B = 2
    xs = clamp(rng.rand(B, 64, 80).astype(np.float32))
    ws = clamp(rng.rand(B, 64, 8).astype(np.float32))
    hs = clamp(rng.rand(B, 8, 80).astype(np.float32))
    masks = (rng.rand(B, 64, 80) > 0.3).astype(np.float32)
    holes = np.where(masks > 0, xs, np.float32(np.nan))
    cfg = SolveConfig(max_iter=10, check_every=5)
    res = batched.solve_batched(holes, ws, hs, cfg, mask=masks)
    assert np.isfinite(np.asarray(res.w)).all()
    assert np.isfinite(np.asarray(res.cost)).all()
    # identical to the same solve with zeros in the holes
    ref = batched.solve_batched(
        np.where(masks > 0, xs, 0.0), ws, hs, cfg, mask=masks
    )
    np.testing.assert_array_equal(np.asarray(res.w), np.asarray(ref.w))
    # the single-problem masked solver gets the same treatment
    r1 = solve_masked(holes[0], ws[0], hs[0], masks[0], cfg)
    np.testing.assert_allclose(
        np.asarray(r1.w), np.asarray(res.w[0]), rtol=5e-5, atol=1e-7
    )


def test_batched_rejects_prequantized_pair(problem):
    from nmf_tpu.utils.config import Precision

    x, w, h = problem
    pair = (np.zeros((2, 8, 16), np.uint8), np.zeros((2, 16), np.float32))
    cfg = SolveConfig(precision=Precision(x_dtype="int8"))
    with pytest.raises(ValueError, match="dense"):
        batched.solve_batched(
            pair, np.ones((2, 8, 4), np.float32),
            np.ones((2, 4, 16), np.float32), cfg
        )


def test_init_distributed_single_host_noop():
    """The documented bare single-host call must be a no-op, not a
    coordinator-address error."""
    meshmod.init_distributed()


def test_init_distributed_require_flag_opt_out(monkeypatch):
    """NMF_TPU_REQUIRE_DISTRIBUTED=0/false explicitly opts OUT — it must
    behave like the unset default (warn + single-host), not force the
    fatal-raise path (a truthiness check would read '0' as 'require')."""
    for off in ("0", "false", "no", ""):
        monkeypatch.setenv("NMF_TPU_REQUIRE_DISTRIBUTED", off)
        meshmod.init_distributed()  # must not raise
