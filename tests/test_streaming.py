"""Out-of-core streaming solver: equivalence with the in-memory solver."""

import numpy as np
import pytest

from nmf_tpu import SolveConfig, solve
from nmf_tpu.io import binio
from nmf_tpu.models import streaming

from oracle import clamp


@pytest.fixture(scope="module")
def problem():
    rng = np.random.RandomState(17)
    m, k, n = 96, 12, 1000  # n >> block sizes below; ragged tails on purpose
    x = rng.rand(m, n).astype(np.float32)
    w = rng.rand(m, k).astype(np.float32)
    h = rng.rand(k, n).astype(np.float32)
    return x, w, h


@pytest.mark.parametrize("block_n", [128, 256, 1000, 384])
def test_streamed_matches_in_memory(problem, block_n):
    """One streamed sweep per iteration == the in-memory solver (the only
    difference is the f32 summation order of W's numerator)."""
    x, w, h = problem
    cfg = SolveConfig(max_iter=30, check_every=10)
    ref = solve(x, w, h, cfg)
    res = streaming.solve_out_of_core(x, w, h, cfg, block_n=block_n)
    assert int(res.iterations) == 30
    # factors drift by blockwise-summation fp noise amplified over the run
    np.testing.assert_allclose(
        np.asarray(res.w), np.asarray(ref.w), rtol=1e-5, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(res.h), np.asarray(ref.h), rtol=1e-5, atol=1e-8
    )
    # the judge bar: cost equal to 1e-6 relative
    np.testing.assert_allclose(
        np.asarray(res.cost_history), np.asarray(ref.cost_history), rtol=1e-6
    )


def test_streamed_from_bin_file(problem, tmp_path):
    """X streamed directly from a reference-format .bin file (column blocks
    are contiguous in the column-major payload) — X never fully in memory."""
    x, w, h = problem
    path = str(tmp_path / "X.bin")
    binio.write_matrix(x, path)
    cfg = SolveConfig(max_iter=20, check_every=10)
    ref = solve(x, w, h, cfg)
    res = streaming.solve_out_of_core(path, w, h, cfg, block_n=256)
    np.testing.assert_allclose(
        np.asarray(res.w), np.asarray(ref.w), rtol=1e-5, atol=1e-8
    )
    assert float(res.cost) == pytest.approx(float(ref.cost), rel=1e-6)


def test_bin_column_source_reads_exact_slices(problem, tmp_path):
    x, _, _ = problem
    path = str(tmp_path / "X.bin")
    binio.write_matrix(x, path)
    src = streaming.BinColumnSource(path)
    assert src.shape == x.shape
    np.testing.assert_array_equal(src.columns(0, 128), x[:, :128])
    np.testing.assert_array_equal(src.columns(937, 1000), x[:, 937:1000])


def test_bin_column_source_truncated_payload(tmp_path):
    path = str(tmp_path / "X.bin")
    binio.write_matrix(np.ones((8, 8), np.float32), path)
    with open(path, "r+b") as f:
        f.truncate(8 + 8 * 8 * 4 - 16)
    with pytest.raises(ValueError, match="truncated"):
        streaming.BinColumnSource(path)


def test_streamed_threshold_convergence(problem):
    """Early stop lands on the same iteration as the in-memory solver."""
    x, w, h = problem
    cfg = SolveConfig(max_iter=100_000, thresh=1e-3, check_every=10)
    ref = solve(x, w, h, cfg)
    res = streaming.solve_out_of_core(x, w, h, cfg, block_n=256)
    assert bool(res.converged)
    assert int(res.iterations) == int(ref.iterations)


def test_streamed_bf16_x_storage(problem):
    """x_dtype=bfloat16 halves the wire bytes; result stays close to f32."""
    from nmf_tpu.utils.config import Precision

    x, w, h = problem
    cfg = SolveConfig(
        max_iter=20, check_every=10,
        precision=Precision("bfloat16", "float32", "bfloat16"),
    )
    ref = solve(x, w, h, cfg)
    res = streaming.solve_out_of_core(x, w, h, cfg, block_n=256)
    assert abs(float(res.cost) - float(ref.cost)) / float(ref.cost) < 0.02


def test_streamed_checkpoint_resume(problem, tmp_path):
    """Interrupted streaming run resumes from its .bin checkpoint and ends
    identical to an uninterrupted one (same check labels, same factors)."""
    x, w, h = problem
    cfg30 = SolveConfig(max_iter=30, check_every=10)
    ref = streaming.solve_out_of_core(x, w, h, cfg30, block_n=256)
    d = str(tmp_path / "ck")
    streaming.solve_out_of_core(
        x, w, h, SolveConfig(max_iter=10, check_every=10),
        block_n=256, checkpoint_dir=d, checkpoint_every=10,
    )
    from nmf_tpu.utils import checkpoint as ckpt

    assert ckpt.latest_checkpoint(d) is not None
    res = streaming.solve_out_of_core(
        x, w, h, cfg30, block_n=256, checkpoint_dir=d, checkpoint_every=10
    )
    assert int(res.iterations) == 30
    np.testing.assert_array_equal(np.asarray(res.w), np.asarray(ref.w))
    np.testing.assert_array_equal(np.asarray(res.h), np.asarray(ref.h))
    loaded = ckpt.load_checkpoint(ckpt.latest_checkpoint(d), cfg30)
    assert loaded.iteration == 30
    assert loaded.check_iterations == [10, 20, 30]
    # config fingerprint is enforced on resume
    import dataclasses

    from nmf_tpu.utils.config import Precision

    with pytest.raises(ValueError, match="refusing to mix objectives"):
        streaming.solve_out_of_core(
            x, w, h,
            dataclasses.replace(
                cfg30, max_iter=40, precision=Precision("bfloat16")
            ),
            block_n=256, checkpoint_dir=d,
        )


def test_streamed_int8_x_storage(problem):
    """int8 X: quantized once (host cache), streamed as uint8; result tracks
    the in-memory int8 solver (identical quantized data) and stays within
    quantization-grade distance of f32."""
    from nmf_tpu.utils.config import Precision

    x, w, h = problem
    cfg = SolveConfig(
        max_iter=20, check_every=10, precision=Precision(x_dtype="int8")
    )
    res = streaming.solve_out_of_core(x, w, h, cfg, block_n=256)
    ref8 = solve(x, w, h, cfg)
    # same quantized data, same math: tight agreement (blockwise scales ==
    # global per-column scales because columns never span blocks)
    np.testing.assert_allclose(
        np.asarray(res.w), np.asarray(ref8.w), rtol=1e-5, atol=1e-7
    )
    ref32 = solve(x, w, h, SolveConfig(max_iter=20, check_every=10))
    assert abs(float(res.cost) - float(ref32.cost)) / float(ref32.cost) < 0.01


@pytest.mark.parametrize("shape", [(4, 2), (2, 4)])
def test_streamed_on_mesh_matches_single_device(problem, shape):
    """Mesh-sharded streaming (X beyond the pod's aggregate HBM): the
    per-block psums must not change the math vs single-device streaming or
    the in-memory solver."""
    from nmf_tpu.parallel.mesh import make_mesh

    x, w, h = problem
    cfg = SolveConfig(max_iter=20, check_every=10)
    ref = solve(x, w, h, cfg)
    mesh = make_mesh(shape=shape)
    res = streaming.solve_out_of_core(x, w, h, cfg, block_n=250, mesh=mesh)
    assert int(res.iterations) == 20
    np.testing.assert_allclose(
        np.asarray(res.w), np.asarray(ref.w), rtol=5e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(res.h), np.asarray(ref.h), rtol=5e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(res.cost_history), np.asarray(ref.cost_history), rtol=1e-5
    )
    # the factors really are sharded over the mesh
    assert len(res.w.sharding.device_set) == shape[0] * shape[1]


def test_streamed_mesh_bin_file_checkpoint(problem, tmp_path):
    """Mesh streaming composes with the .bin source and checkpoint/resume."""
    from nmf_tpu.parallel.mesh import make_mesh

    x, w, h = problem
    path = str(tmp_path / "X.bin")
    binio.write_matrix(x, path)
    mesh = make_mesh(shape=(4, 2))
    d = str(tmp_path / "ck")
    streaming.solve_out_of_core(
        path, w, h, SolveConfig(max_iter=10, check_every=10),
        block_n=250, mesh=mesh, checkpoint_dir=d, checkpoint_every=10,
    )
    res = streaming.solve_out_of_core(
        path, w, h, SolveConfig(max_iter=20, check_every=10),
        block_n=250, mesh=mesh, checkpoint_dir=d, checkpoint_every=10,
    )
    ref = streaming.solve_out_of_core(
        x, w, h, SolveConfig(max_iter=20, check_every=10), block_n=250
    )
    assert int(res.iterations) == 20
    np.testing.assert_allclose(
        np.asarray(res.w), np.asarray(ref.w), rtol=5e-5, atol=1e-7
    )


def test_streamed_int8_on_mesh_matches_single_device(problem):
    """int8 mesh streaming: codes shard like X, scales over 'mc'; matches
    the single-device quantized stream exactly (same codes, same math)."""
    from nmf_tpu.parallel.mesh import make_mesh
    from nmf_tpu.utils.config import Precision

    x, w, h = problem
    cfg = SolveConfig(
        max_iter=20, check_every=10, precision=Precision(x_dtype="int8")
    )
    ref = streaming.solve_out_of_core(x, w, h, cfg, block_n=256)
    res = streaming.solve_out_of_core(
        x, w, h, cfg, block_n=256, mesh=make_mesh(shape=(4, 2))
    )
    np.testing.assert_allclose(
        np.asarray(res.w), np.asarray(ref.w), rtol=5e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(res.cost_history), np.asarray(ref.cost_history), rtol=1e-5
    )


def test_streamed_mesh_checkpoints_stay_sharded(problem, tmp_path):
    """Mesh-streaming checkpoints use the pod-safe orbax path: no .bin
    gather of the factors, arrays dir + meta written, resume exact."""
    import os

    from nmf_tpu.parallel.mesh import make_mesh

    x, w, h = problem
    mesh = make_mesh(shape=(4, 2))
    d = str(tmp_path / "ck")
    streaming.solve_out_of_core(
        x, w, h, SolveConfig(max_iter=10, check_every=10),
        block_n=250, mesh=mesh, checkpoint_dir=d, checkpoint_every=10,
    )
    step = os.path.join(d, "step_00000010")
    assert os.path.isdir(step + ".arrays")          # orbax shards
    assert os.path.exists(os.path.join(step, "meta.json"))
    assert not os.path.exists(os.path.join(step, "W.bin"))  # never gathered
    res = streaming.solve_out_of_core(
        x, w, h, SolveConfig(max_iter=20, check_every=10),
        block_n=250, mesh=mesh, checkpoint_dir=d, checkpoint_every=10,
    )
    ref = streaming.solve_out_of_core(
        x, w, h, SolveConfig(max_iter=20, check_every=10),
        block_n=250, mesh=mesh,
    )
    np.testing.assert_allclose(
        np.asarray(res.w), np.asarray(ref.w), rtol=1e-6, atol=1e-8
    )


def test_streamed_rejects_unsupported_families(problem):
    x, w, h = problem
    # masked streaming is the (optionally penalized) KL family only
    mask = np.ones_like(np.asarray(x))
    with pytest.raises(NotImplementedError):
        streaming.solve_out_of_core(
            x, w, h, SolveConfig(max_iter=2, beta=2.0), mask=mask
        )


@pytest.mark.parametrize("kind", ["beta2", "reg", "masked", "hals"])
def test_streamed_extension_families_on_mesh(problem, kind):
    """Every streaming family runs on the mesh too: sharded-streamed ==
    single-device-streamed == in-memory."""
    from nmf_tpu.models.masked import solve_masked
    from nmf_tpu.parallel.mesh import make_mesh

    x, w, h = problem
    mesh = make_mesh(shape=(4, 2))
    mask = None
    if kind == "beta2":
        cfg = SolveConfig(max_iter=20, check_every=10, beta=2.0)
        ref = solve(x, w, h, cfg)
    elif kind == "hals":
        cfg = SolveConfig(max_iter=20, check_every=10, beta=2.0, algorithm="hals")
        ref = solve(x, w, h, cfg)
    elif kind == "reg":
        cfg = SolveConfig(max_iter=20, check_every=10, l1_h=0.02, l2_w=0.01)
        ref = solve(x, w, h, cfg)
    else:
        rng = np.random.RandomState(11)
        mask = (rng.rand(*np.shape(x)) > 0.3).astype(np.float32)
        cfg = SolveConfig(max_iter=20, check_every=10)
        ref = solve_masked(x, w, h, mask, cfg)
    res = streaming.solve_out_of_core(
        x, w, h, cfg, block_n=250, mesh=mesh, mask=mask
    )
    assert int(res.iterations) == 20
    w_res, w_ref = np.asarray(res.w), np.asarray(ref.w)
    if kind == "hals":
        # truncation-boundary entries: scale-relative atol (see
        # test_streamed_hals_matches_in_memory)
        np.testing.assert_allclose(
            w_res, w_ref, rtol=5e-4, atol=1e-5 * float(np.abs(w_ref).max())
        )
    else:
        np.testing.assert_allclose(w_res, w_ref, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(res.cost_history), np.asarray(ref.cost_history), rtol=1e-5
    )


def test_streamed_regularized_matches_in_memory(problem):
    """Penalized-KL streaming: penalty gradients are block-local for H and
    join the W epilogue; the reported objective includes the penalties."""
    x, w, h = problem
    cfg = SolveConfig(max_iter=20, check_every=10, l1_h=0.02, l2_w=0.01)
    ref = solve(x, w, h, cfg)
    res = streaming.solve_out_of_core(x, w, h, cfg, block_n=256)
    assert int(res.iterations) == 20
    np.testing.assert_allclose(
        np.asarray(res.w), np.asarray(ref.w), rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(res.cost_history), np.asarray(ref.cost_history), rtol=1e-5
    )


def test_streamed_masked_matches_in_memory(problem, tmp_path):
    """Masked streaming: the mask streams with X (from arrays or .bin files)
    and both W-side GEMMs accumulate blockwise."""
    from nmf_tpu.models.masked import solve_masked

    x, w, h = problem
    rng = np.random.RandomState(7)
    mask = (rng.rand(*x.shape) > 0.3).astype(np.float32)
    cfg = SolveConfig(max_iter=20, check_every=10)
    ref = solve_masked(x, w, h, mask, cfg)
    res = streaming.solve_out_of_core(x, w, h, cfg, block_n=256, mask=mask)
    assert int(res.iterations) == 20
    np.testing.assert_allclose(
        np.asarray(res.w), np.asarray(ref.w), rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(res.cost_history), np.asarray(ref.cost_history), rtol=1e-5
    )
    # from .bin files for both X and the mask
    xp, mp = str(tmp_path / "X.bin"), str(tmp_path / "M.bin")
    binio.write_matrix(x, xp)
    binio.write_matrix(mask, mp)
    res2 = streaming.solve_out_of_core(xp, w, h, cfg, block_n=256, mask=mp)
    np.testing.assert_allclose(
        np.asarray(res2.w), np.asarray(res.w), rtol=1e-6, atol=1e-8
    )
    # masked + penalties compose
    cfgp = SolveConfig(max_iter=20, check_every=10, l1_h=0.02, l2_w=0.01)
    refp = solve_masked(x, w, h, mask, cfgp)
    resp = streaming.solve_out_of_core(x, w, h, cfgp, block_n=256, mask=mask)
    np.testing.assert_allclose(
        np.asarray(resp.cost_history), np.asarray(refp.cost_history), rtol=1e-5
    )


@pytest.mark.parametrize("beta", [2.0, 0.0, 1.5])
def test_streamed_beta_matches_in_memory(problem, beta):
    """beta-MU streaming: numerator AND denominator W-side GEMMs accumulate
    blockwise; result matches the in-memory beta solver."""
    x, w, h = problem
    cfg = SolveConfig(max_iter=20, check_every=10, beta=beta)
    ref = solve(x, w, h, cfg)
    res = streaming.solve_out_of_core(x, w, h, cfg, block_n=256)
    assert int(res.iterations) == 20
    np.testing.assert_allclose(
        np.asarray(res.w), np.asarray(ref.w), rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(res.cost_history), np.asarray(ref.cost_history), rtol=1e-5
    )


@pytest.mark.parametrize("block_n", [128, 250, 1000])
def test_streamed_hals_matches_in_memory(problem, block_n):
    """Streaming HALS: the column-local H row sweep decomposes over blocks
    exactly; the W sweep's global X H^T / H H^T accumulate blockwise."""
    x, w, h = problem
    cfg = SolveConfig(max_iter=20, check_every=10, beta=2.0, algorithm="hals")
    ref = solve(x, w, h, cfg)
    res = streaming.solve_out_of_core(x, w, h, cfg, block_n=block_n)
    assert int(res.iterations) == 20
    # HALS max(., 0) truncation: near-boundary entries have unbounded
    # RELATIVE sensitivity to blockwise fp summation order — compare with a
    # scale-relative atol and pin the Frobenius objective tightly
    for a, b in ((res.w, ref.w), (res.h, ref.h)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=5e-4, atol=1e-5 * max(float(np.abs(b).max()), 1e-6)
        )
    np.testing.assert_allclose(
        np.asarray(res.cost_history), np.asarray(ref.cost_history), rtol=1e-5
    )
    assert float(np.min(np.asarray(res.w))) >= 0.0
    assert float(np.min(np.asarray(res.h))) >= 0.0


def test_pick_block_n_lane_aligned():
    assert streaming.pick_block_n(96, 1000, block_bytes=4 * 96 * 300) == 256
    assert streaming.pick_block_n(96, 100) == 100  # capped at n
    # huge M: the byte budget WINS over lane alignment (two blocks are in
    # flight — a hard 128-column floor could exceed HBM for tall X)
    assert streaming.pick_block_n(10_000_000, 4096) == 6
    # at/above one lane tile the block is 128-aligned
    assert streaming.pick_block_n(96, 10_000, block_bytes=4 * 96 * 200) == 128


@pytest.mark.parametrize("kind", ["beta2", "reg", "hals"])
def test_streamed_int8_composes_with_families(problem, kind):
    """int8 X composes with the beta, penalized, and HALS streaming families
    single-device (the jnp block steps dequantize the (codes, scales) pair)."""
    from nmf_tpu.utils.config import Precision

    x, w, h = problem
    if kind == "beta2":
        cfg = SolveConfig(
            max_iter=20, check_every=10, beta=2.0,
            precision=Precision(x_dtype="int8"),
        )
    elif kind == "hals":
        cfg = SolveConfig(
            max_iter=20, check_every=10, beta=2.0, algorithm="hals",
            precision=Precision(x_dtype="int8"),
        )
    else:
        cfg = SolveConfig(
            max_iter=20, check_every=10, l1_h=0.02,
            precision=Precision(x_dtype="int8"),
        )
    ref = solve(x, w, h, cfg)  # in-memory int8: identical quantized data
    res = streaming.solve_out_of_core(x, w, h, cfg, block_n=256)
    assert int(res.iterations) == 20
    w_res, w_ref = np.asarray(res.w), np.asarray(ref.w)
    if kind == "hals":
        np.testing.assert_allclose(
            w_res, w_ref, rtol=5e-4, atol=1e-5 * float(np.abs(w_ref).max())
        )
    else:
        np.testing.assert_allclose(w_res, w_ref, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(res.cost_history), np.asarray(ref.cost_history), rtol=1e-5
    )


def test_streamed_masked_int8(problem):
    """Masked streaming composes with int8 X storage single-device: the
    streamed run quantizes each block AFTER zeroing unobserved entries
    (the in-memory masked prep's invariant), so it matches the in-memory
    int8 masked solve on identical quantized data."""
    from nmf_tpu.models.masked import solve_masked
    from nmf_tpu.parallel.mesh import make_mesh
    from nmf_tpu.utils.config import Precision

    x, w, h = problem
    rng = np.random.RandomState(13)
    mask = (rng.rand(*x.shape) > 0.3).astype(np.float32)
    cfg = SolveConfig(
        max_iter=20, check_every=10, precision=Precision(x_dtype="int8")
    )
    res = streaming.solve_out_of_core(x, w, h, cfg, block_n=256, mask=mask)
    ref = solve_masked(x, w, h, mask, cfg)
    np.testing.assert_allclose(
        np.asarray(res.w), np.asarray(ref.w), rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(res.cost_history), np.asarray(ref.cost_history), rtol=1e-5
    )
    # garbage at unobserved positions must not poison the blockwise scales
    # (same contract as the in-memory path, test_matrix_cells)
    x_garbage = x.copy()
    x_garbage[mask == 0] = 1e6
    dirty = streaming.solve_out_of_core(
        x_garbage, w, h, cfg, block_n=256, mask=mask
    )
    np.testing.assert_array_equal(np.asarray(dirty.w), np.asarray(res.w))
    # mesh + masked + int8 composes too (each shard dequantizes its block)
    res_m = streaming.solve_out_of_core(
        x, w, h, cfg, block_n=250, mask=mask, mesh=make_mesh(shape=(4, 2))
    )
    np.testing.assert_allclose(
        np.asarray(res_m.w), np.asarray(ref.w), rtol=2e-4, atol=1e-7
    )


# ---------------------------------------------------------------------------
# out-of-core transform (streaming H-only)
# ---------------------------------------------------------------------------


def _fit_w(problem):
    x, w, h = problem
    return np.asarray(solve(x, w, h, SolveConfig(max_iter=20)).w)


@pytest.mark.parametrize("block_n", [128, 256, 1000])
def test_transform_ooc_matches_in_memory_h_only(problem, block_n):
    from nmf_tpu import solve_h_only
    from nmf_tpu.models.streaming import transform_out_of_core

    x, w0, h0 = problem
    w = _fit_w(problem)
    cfg = SolveConfig(max_iter=25, check_every=25)
    res = transform_out_of_core(x, w, h0=h0, config=cfg, block_n=block_n)
    ref = solve_h_only(x, w, h0, cfg)
    np.testing.assert_allclose(res.h, np.asarray(ref.h), rtol=2e-6, atol=1e-8)
    # column-separable cost: block sum == global divergence
    np.testing.assert_allclose(res.cost, float(ref.cost), rtol=1e-6)
    assert res.iterations.shape == (len(res.blocks),)
    assert np.all(res.iterations == 25)


def test_transform_ooc_from_bin_file(problem, tmp_path):
    from nmf_tpu.models.streaming import transform_out_of_core

    x, _, h0 = problem
    w = _fit_w(problem)
    path = tmp_path / "X.bin"
    binio.write_matrix(x, path)
    cfg = SolveConfig(max_iter=10, check_every=10)
    res_file = transform_out_of_core(str(path), w, h0=h0, config=cfg, block_n=256)
    res_arr = transform_out_of_core(x, w, h0=h0, config=cfg, block_n=256)
    np.testing.assert_array_equal(res_file.h, res_arr.h)


def test_transform_ooc_seeded_inits_per_block(problem):
    """Without h0 each block solves from its own seeded uniform init and
    still converges to a sensible H (better than the init)."""
    from nmf_tpu import kl_divergence
    from nmf_tpu.models.streaming import transform_out_of_core

    x, _, _ = problem
    w = _fit_w(problem)
    cfg = SolveConfig(max_iter=60, check_every=20)
    res = transform_out_of_core(x, w, config=cfg, block_n=256, seed=4)
    import jax.numpy as jnp

    xc = jnp.asarray(clamp(x))
    c_fit = float(kl_divergence(xc, jnp.asarray(w), jnp.asarray(res.h)))
    rng = np.random.RandomState(4)
    h_rand = rng.rand(w.shape[1], x.shape[1]).astype(np.float32)
    c_rand = float(kl_divergence(xc, jnp.asarray(w), jnp.asarray(h_rand)))
    assert c_fit < 0.5 * c_rand
    np.testing.assert_allclose(res.cost, c_fit, rtol=1e-6)


def test_transform_ooc_per_block_convergence(problem):
    from nmf_tpu.models.streaming import transform_out_of_core

    x, _, h0 = problem
    w = _fit_w(problem)
    cfg = SolveConfig(max_iter=300, thresh=0.05, check_every=10)
    res = transform_out_of_core(x, w, h0=h0, config=cfg, block_n=256)
    assert np.any(res.converged)
    assert np.all(res.iterations <= 300)


@pytest.mark.parametrize("shape", [(4, 2), (2, 4)])
def test_transform_ooc_on_mesh_matches_single_device(problem, shape):
    from nmf_tpu.models.streaming import transform_out_of_core
    from nmf_tpu.parallel.mesh import make_mesh

    x, _, h0 = problem
    w = _fit_w(problem)
    # mesh requires N % c == 0: 1000 % 2 == 0; use c=2 shapes
    mesh = make_mesh(shape=shape)
    if x.shape[1] % shape[1]:
        pytest.skip("N not divisible by mesh cols")
    cfg = SolveConfig(max_iter=15, check_every=15)
    res_m = transform_out_of_core(x, w, h0=h0, config=cfg, block_n=256, mesh=mesh)
    res_s = transform_out_of_core(x, w, h0=h0, config=cfg, block_n=256)
    np.testing.assert_allclose(res_m.h, res_s.h, rtol=5e-5, atol=1e-7)
    np.testing.assert_allclose(res_m.cost, res_s.cost, rtol=1e-5)


def test_transform_ooc_int8_x(problem):
    from nmf_tpu.models.streaming import transform_out_of_core
    from nmf_tpu.utils.config import Precision

    x, _, h0 = problem
    w = _fit_w(problem)
    cfg8 = SolveConfig(
        max_iter=10, check_every=10, precision=Precision(x_dtype="int8")
    )
    cfg = SolveConfig(max_iter=10, check_every=10)
    res8 = transform_out_of_core(x, w, h0=h0, config=cfg8, block_n=256)
    ref = transform_out_of_core(x, w, h0=h0, config=cfg, block_n=256)
    np.testing.assert_allclose(res8.cost, ref.cost, rtol=0.05)


@pytest.mark.parametrize(
    "kind", ["hals", "beta", "regularized"]
)
def test_transform_ooc_families(problem, kind):
    from nmf_tpu import solve_h_only
    from nmf_tpu.models.streaming import transform_out_of_core

    x, _, h0 = problem
    w = _fit_w(problem)
    if kind == "hals":
        cfg = SolveConfig(max_iter=10, check_every=10, beta=2.0, algorithm="hals")
    elif kind == "beta":
        cfg = SolveConfig(max_iter=10, check_every=10, beta=2.0)
    else:
        cfg = SolveConfig(max_iter=10, check_every=10, l1_h=0.01, l2_h=0.001)
    res = transform_out_of_core(x, w, h0=h0, config=cfg, block_n=384)
    ref = solve_h_only(x, w, h0, cfg)
    np.testing.assert_allclose(res.h, np.asarray(ref.h), rtol=5e-6, atol=1e-8)


def test_transform_ooc_validation(problem):
    from nmf_tpu.models.streaming import transform_out_of_core
    from nmf_tpu.parallel.mesh import make_mesh
    from nmf_tpu.utils.config import Precision

    x, _, h0 = problem
    w = _fit_w(problem)
    with pytest.raises(ValueError):
        transform_out_of_core(x, w[:-1], config=SolveConfig(max_iter=1))
    with pytest.raises(ValueError):
        transform_out_of_core(x, w, h0=h0[:, :-1], config=SolveConfig(max_iter=1))
    # int8 + mesh composes (shard-local dequant); smoke it
    res = transform_out_of_core(
        x, w, h0=h0,
        config=SolveConfig(
            max_iter=5, check_every=5, precision=Precision(x_dtype="int8")
        ),
        block_n=256, mesh=make_mesh(shape=(2, 2)),
    )
    assert np.isfinite(res.cost)


def test_nmf_estimator_transform_out_of_core(problem):
    from nmf_tpu import NMF

    x, _, _ = problem
    model = NMF(n_components=12, max_iter=20, random_state=1)
    model.fit(x)
    h_mem = model.transform(x, max_iter=20)
    h_ooc = model.transform(x, max_iter=20, out_of_core=True)
    assert h_ooc.shape == h_mem.shape
    # same W, same families; different inits (per-block seeds) — both fits
    # must land at comparable objective values
    from nmf_tpu import kl_divergence
    import jax.numpy as jnp

    xc = jnp.asarray(clamp(x))
    c_mem = float(kl_divergence(xc, jnp.asarray(model.w_), jnp.asarray(h_mem)))
    c_ooc = float(kl_divergence(xc, jnp.asarray(model.w_), jnp.asarray(h_ooc)))
    assert abs(c_mem - c_ooc) / c_mem < 0.05


@pytest.mark.parametrize("kind", ["beta2", "reg", "hals", "masked"])
def test_streamed_int8_families_on_mesh(problem, kind):
    """int8 X storage composes with every mesh streaming family: each shard
    dequantizes its (codes, scales) block — mesh-streamed == single-device
    streamed on the identical quantized data."""
    from nmf_tpu.parallel.mesh import make_mesh
    from nmf_tpu.utils.config import Precision

    x, w, h = problem
    mesh = make_mesh(shape=(4, 2))
    mask = None
    if kind == "beta2":
        cfg = SolveConfig(
            max_iter=15, check_every=5, beta=2.0,
            precision=Precision(x_dtype="int8"),
        )
    elif kind == "hals":
        cfg = SolveConfig(
            max_iter=15, check_every=5, beta=2.0, algorithm="hals",
            precision=Precision(x_dtype="int8"),
        )
    elif kind == "reg":
        cfg = SolveConfig(
            max_iter=15, check_every=5, l1_h=0.02,
            precision=Precision(x_dtype="int8"),
        )
    else:
        cfg = SolveConfig(
            max_iter=15, check_every=5, precision=Precision(x_dtype="int8")
        )
        rng = np.random.RandomState(5)
        mask = (rng.rand(*x.shape) > 0.2).astype(np.float32)
    single = streaming.solve_out_of_core(x, w, h, cfg, block_n=256, mask=mask)
    meshed = streaming.solve_out_of_core(
        x, w, h, cfg, block_n=256, mesh=mesh, mask=mask
    )
    w_s = np.asarray(single.w)
    if kind == "hals":
        # truncation-boundary entries (max(0, .)): scale-relative atol, as
        # in test_streamed_hals_matches_in_memory
        tols = dict(rtol=5e-4, atol=1e-5 * float(np.abs(w_s).max()))
    else:
        tols = dict(rtol=5e-5, atol=1e-6 * float(np.abs(w_s).max()))
    np.testing.assert_allclose(np.asarray(meshed.w), w_s, **tols)
    np.testing.assert_allclose(
        np.asarray(meshed.cost_history),
        np.asarray(single.cost_history),
        rtol=1e-5,
    )


# ---------------------------------------------------------------------------
# streamed semi-adaptive (frozen template columns)
# ---------------------------------------------------------------------------


def test_streamed_semi_matches_in_memory(problem):
    from nmf_tpu import solve_semi

    x, w, h = problem
    cfg = SolveConfig(max_iter=20, check_every=10)
    ref = solve_semi(x, w, h, cfg, n_frozen=4)
    res = streaming.solve_out_of_core(x, w, h, cfg, block_n=256, n_frozen=4)
    np.testing.assert_allclose(
        np.asarray(res.w), np.asarray(ref.w), rtol=1e-5, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(res.h), np.asarray(ref.h), rtol=1e-5, atol=1e-8
    )
    np.testing.assert_array_equal(np.asarray(res.w)[:, :4], clamp(w)[:, :4])


def test_streamed_semi_on_mesh(problem):
    from nmf_tpu.parallel.mesh import make_mesh

    x, w, h = problem
    cfg = SolveConfig(max_iter=15, check_every=5)
    mesh = make_mesh(shape=(4, 2))
    res_m = streaming.solve_out_of_core(
        x, w, h, cfg, block_n=250, n_frozen=3, mesh=mesh
    )
    res_s = streaming.solve_out_of_core(x, w, h, cfg, block_n=250, n_frozen=3)
    np.testing.assert_allclose(
        np.asarray(res_m.w), np.asarray(res_s.w), rtol=5e-5, atol=1e-7
    )
    np.testing.assert_array_equal(np.asarray(res_m.w)[:, :3], clamp(w)[:, :3])
    with pytest.raises(NotImplementedError):
        streaming.solve_out_of_core(
            x, w, h, SolveConfig(max_iter=2, beta=2.0, algorithm="hals"),
            n_frozen=2,
        )


def test_streamed_masked_checkpoint_resume(problem, tmp_path):
    """Masked streaming composes with checkpoint/resume."""
    x, w, h = problem
    rng = np.random.RandomState(41)
    mask = (rng.rand(*x.shape) > 0.25).astype(np.float32)
    cfg = SolveConfig(max_iter=20, check_every=10)
    ref = streaming.solve_out_of_core(x, w, h, cfg, block_n=256, mask=mask)
    d = str(tmp_path / "ckm")
    streaming.solve_out_of_core(
        x, w, h, SolveConfig(max_iter=10, check_every=10),
        block_n=256, mask=mask, checkpoint_dir=d, checkpoint_every=10,
    )
    res = streaming.solve_out_of_core(
        x, w, h, cfg, block_n=256, mask=mask, checkpoint_dir=d,
        checkpoint_every=10,
    )
    assert int(res.iterations) == 20
    np.testing.assert_array_equal(np.asarray(res.w), np.asarray(ref.w))


def test_streamed_semi_checkpoint_resume(problem, tmp_path):
    """Frozen template columns survive checkpoint/resume: an interrupted
    streamed semi run resumes to the straight-run factors with the
    templates still intact."""
    x, w, h = problem
    cfg = SolveConfig(max_iter=20, check_every=10)
    ref = streaming.solve_out_of_core(x, w, h, cfg, block_n=256, n_frozen=4)
    d = str(tmp_path / "cksemi")
    streaming.solve_out_of_core(
        x, w, h, SolveConfig(max_iter=10, check_every=10),
        block_n=256, n_frozen=4, checkpoint_dir=d, checkpoint_every=10,
    )
    res = streaming.solve_out_of_core(
        x, w, h, cfg, block_n=256, n_frozen=4, checkpoint_dir=d,
        checkpoint_every=10,
    )
    assert int(res.iterations) == 20
    np.testing.assert_array_equal(np.asarray(res.w), np.asarray(ref.w))
    np.testing.assert_array_equal(np.asarray(res.w)[:, :4], clamp(w)[:, :4])


def test_transform_ooc_masked_matches_in_memory(problem, tmp_path):
    """Masked streamed transform == solve_masked_h_only (same warm start),
    from arrays and from .bin sources, single-device and on meshes."""
    from nmf_tpu import SolveConfig, solve_masked_h_only
    from nmf_tpu.models.streaming import transform_out_of_core
    from nmf_tpu.parallel.mesh import make_mesh

    x, w0, h0 = problem
    w = _fit_w(problem)
    rng = np.random.RandomState(51)
    mask = (rng.rand(*x.shape) > 0.3).astype(np.float32)
    cfg = SolveConfig(max_iter=15, check_every=15)
    ref = solve_masked_h_only(x, w, h0, mask, cfg)
    res = transform_out_of_core(x, w, h0=h0, config=cfg, block_n=256, mask=mask)
    np.testing.assert_allclose(res.h, np.asarray(ref.h), rtol=5e-5, atol=1e-7)
    np.testing.assert_allclose(res.cost, float(ref.cost), rtol=1e-5)
    # .bin sources for both X and the mask
    xp, mp = str(tmp_path / "X.bin"), str(tmp_path / "M.bin")
    binio.write_matrix(x, xp)
    binio.write_matrix(mask, mp)
    res_f = transform_out_of_core(xp, w, h0=h0, config=cfg, block_n=256, mask=mp)
    np.testing.assert_array_equal(res_f.h, res.h)
    # mesh
    res_m = transform_out_of_core(
        x, w, h0=h0, config=cfg, block_n=250, mask=mask,
        mesh=make_mesh(shape=(4, 2)),
    )
    np.testing.assert_allclose(res_m.h, res.h, rtol=5e-5, atol=1e-7)
    # guards
    with pytest.raises(NotImplementedError):
        transform_out_of_core(
            x, w, config=SolveConfig(beta=2.0), mask=mask, block_n=256
        )
    with pytest.raises(ValueError):
        transform_out_of_core(
            x, w, config=cfg, mask=mask[:, :-1], block_n=256
        )


def test_block_n_validation(problem):
    x, w, h = problem
    with pytest.raises(ValueError, match="block_n"):
        streaming.solve_out_of_core(x, w, h, SolveConfig(max_iter=2), block_n=0)
    with pytest.raises(ValueError, match="block_n"):
        streaming.transform_out_of_core(x, w, block_n=-8)


def test_transform_mask_matches_solve_mask_dtype(problem):
    """Solve and transform streams weight the SAME objective under bf16 X:
    both store the mask in the X wire dtype (shared _cast_mask)."""
    from nmf_tpu.models.masked import solve_masked_h_only
    from nmf_tpu.utils.config import Precision

    x, w, h = problem
    rng = np.random.RandomState(5)
    mask = (rng.rand(*x.shape) < 0.8).astype(np.float32) * 0.7  # real-valued
    cfg = SolveConfig(
        max_iter=8, check_every=8,
        precision=Precision("float32", "float32", "bfloat16"),
    )
    res = streaming.transform_out_of_core(
        x, w, config=cfg, block_n=x.shape[1], mask=mask, seed=2,
    )
    # in one block the streamed transform must equal the in-memory masked
    # h-only solve given the same bf16-stored mask
    import ml_dtypes

    h0 = np.maximum(
        np.random.RandomState(2).rand(w.shape[1], x.shape[1]).astype(np.float32),
        np.float32(cfg.eps),
    )
    ref = solve_masked_h_only(
        x, np.maximum(w, np.float32(cfg.eps)), h0,
        mask.astype(ml_dtypes.bfloat16).astype(np.float32), cfg,
    )
    np.testing.assert_allclose(
        res.h, np.asarray(ref.h), rtol=0,
        atol=2e-5 * float(np.asarray(ref.h).max()),
    )


@pytest.mark.parametrize("xd", ["float32", "bfloat16"])
def test_streamed_masked_nan_holes(problem, xd):
    """NaN/Inf garbage at unobserved entries must not poison the STREAMED
    masked solve or transform — the in-memory prep invariant reaches the
    host-side block prep for every storage dtype."""
    from nmf_tpu.utils.config import Precision

    x, w, h = problem
    rng = np.random.RandomState(23)
    mask = (rng.rand(*x.shape) > 0.3).astype(np.float32)
    holes = np.where(mask > 0, x, np.float32(np.nan)).astype(np.float32)
    cfg = SolveConfig(
        max_iter=6, check_every=3, precision=Precision(x_dtype=xd)
    )
    res = streaming.solve_out_of_core(holes, w, h, cfg, block_n=256, mask=mask)
    assert np.isfinite(np.asarray(res.w)).all()
    assert np.isfinite(float(res.cost))
    ref = streaming.solve_out_of_core(
        np.where(mask > 0, x, 0.0), w, h, cfg, block_n=256, mask=mask
    )
    np.testing.assert_array_equal(np.asarray(res.w), np.asarray(ref.w))

    tr = streaming.transform_out_of_core(
        holes, w, config=cfg, block_n=256, mask=mask, seed=3
    )
    assert np.isfinite(tr.h).all()
    tr_ref = streaming.transform_out_of_core(
        np.where(mask > 0, x, 0.0), w, config=cfg, block_n=256, mask=mask,
        seed=3,
    )
    np.testing.assert_array_equal(tr.h, tr_ref.h)


def test_streamed_masked_nan_holes_mesh(problem):
    from nmf_tpu.parallel.mesh import make_mesh

    x, w, h = problem
    x, w, h = x[:, :512], w, h[:, :512]
    rng = np.random.RandomState(29)
    mask = (rng.rand(*x.shape) > 0.3).astype(np.float32)
    holes = np.where(mask > 0, x, np.float32(np.inf)).astype(np.float32)
    mesh = make_mesh(shape=(4, 2))
    cfg = SolveConfig(max_iter=4, check_every=2)
    tr = streaming.transform_out_of_core(
        holes, w, config=cfg, block_n=256, mask=mask, mesh=mesh, seed=3
    )
    assert np.isfinite(tr.h).all()


def test_estimator_masked_out_of_core_transform(problem):
    """NMF.transform(mask=, out_of_core=True) reaches the streamed masked
    scorer (it used to raise NotImplementedError)."""
    from nmf_tpu.models.nmf import NMF

    x, w, h = problem
    est = NMF(n_components=w.shape[1], max_iter=8, random_state=0)
    est.fit(x[:, :300])
    rng = np.random.RandomState(31)
    x_new = x[:, 300:700]
    mask = (rng.rand(*x_new.shape) > 0.25).astype(np.float32)
    h_str = est.transform(
        np.where(mask > 0, x_new, np.nan), mask=mask, out_of_core=True
    )
    assert h_str.shape == (w.shape[1], x_new.shape[1])
    assert np.isfinite(h_str).all()


def test_pick_block_n_empty_raises():
    with pytest.raises(ValueError, match="non-empty"):
        streaming.pick_block_n(64, 0)
