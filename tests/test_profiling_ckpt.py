"""Tests for profiling utilities and sharded (orbax) checkpoints."""

import os

import numpy as np
import pytest

import jax

from nmf_tpu import SolveConfig
from nmf_tpu.parallel import make_mesh, sharded
from nmf_tpu.utils import checkpoint as ckpt
from nmf_tpu.utils.profiling import force_completion, stage_timings, trace


def test_stage_timings(small_problem):
    x, w, h = small_problem
    t = stage_timings(x, w, h, repeats=1)
    expected = {
        "recon_divide",
        "h_numerator",
        "w_numerator",
        "sums",
        "epilogues",
        "kl_cost",
        "full_step",
        "fused_step",      # legacy alias of full_step
        "null_dispatch",   # dispatch+fetch overhead baseline
    }
    assert set(t) == expected
    assert all(v > 0 for v in t.values())
    assert t["fused_step"] == t["full_step"]


def test_trace_writes_artifacts(tmp_path, small_problem):
    x, w, h = small_problem
    import jax.numpy as jnp

    with trace(str(tmp_path / "trace")):
        y = jnp.asarray(x) @ jnp.asarray(x).T
        force_completion(y)
    # the profiler lays down plugins/profile/<run>/*
    found = []
    for root, _, files in os.walk(tmp_path / "trace"):
        found.extend(files)
    assert found, "no trace artifacts written"


def test_sharded_checkpoint_roundtrip(tmp_path, small_problem):
    rng = np.random.RandomState(5)
    m, k, n = 128, 16, 160
    x = rng.rand(m, n).astype(np.float32)
    w = rng.rand(m, k).astype(np.float32)
    h = rng.rand(k, n).astype(np.float32)
    mesh = make_mesh(shape=(4, 2))
    res = sharded.solve_sharded(x, w, h, SolveConfig(max_iter=5), mesh=mesh)

    state = ckpt.CheckpointState(
        w=res.w, h=res.h, iteration=5, cost_history=[float(res.cost)]
    )
    step_dir = ckpt.save_checkpoint_sharded(str(tmp_path / "ck"), state)
    back = ckpt.load_checkpoint_sharded(step_dir, res.w, res.h)
    assert back.iteration == 5
    np.testing.assert_array_equal(np.asarray(back.w), np.asarray(res.w))
    np.testing.assert_array_equal(np.asarray(back.h), np.asarray(res.h))
    # restored arrays keep their sharding
    assert back.w.sharding == res.w.sharding


def test_sharded_checkpoint_fingerprint_refusal(tmp_path, small_problem):
    """Sharded meta carries the config fingerprint; resuming under a
    different objective is refused (same contract as load_checkpoint)."""
    import dataclasses

    x, w, h = small_problem
    mesh = make_mesh(shape=(4, 2))
    cfg = SolveConfig(max_iter=2)
    res = sharded.solve_sharded(x, w, h, cfg, mesh=mesh)
    state = ckpt.CheckpointState(w=res.w, h=res.h, iteration=2, cost_history=[])
    step_dir = ckpt.save_checkpoint_sharded(str(tmp_path / "ck"), state, cfg)
    # same config loads fine
    ckpt.load_checkpoint_sharded(step_dir, res.w, res.h, cfg)
    with pytest.raises(ValueError, match="refusing to mix objectives"):
        ckpt.load_checkpoint_sharded(
            step_dir, res.w, res.h, dataclasses.replace(cfg, beta=2.0)
        )


def test_sharded_checkpointed_solve_resume(tmp_path):
    """Pod-scale checkpointing: factors stay sharded across segments/resume."""
    import dataclasses

    from nmf_tpu import solve

    rng = np.random.RandomState(6)
    m, k, n = 128, 16, 160
    x = rng.rand(m, n).astype(np.float32)
    w = rng.rand(m, k).astype(np.float32)
    h = rng.rand(k, n).astype(np.float32)
    mesh = make_mesh(shape=(4, 2))
    cfg = SolveConfig(max_iter=30, check_every=10)
    d = str(tmp_path / "ck")
    # interrupted after 10, resumed to 30, all orbax-sharded
    ckpt.solve_with_checkpoints(
        x, w, h, dataclasses.replace(cfg, max_iter=10), d, every=10,
        mesh=mesh, sharded_checkpoints=True,
    )
    state = ckpt.solve_with_checkpoints(
        x, w, h, cfg, d, every=10, mesh=mesh, sharded_checkpoints=True,
    )
    assert state.iteration == 30
    # result factors are still sharded jax arrays
    assert hasattr(state.w, "sharding")
    ref = solve(x, w, h, cfg)
    np.testing.assert_allclose(
        np.asarray(state.w), np.asarray(ref.w), rtol=5e-5, atol=1e-7
    )
    with pytest.raises(ValueError, match="requires a mesh"):
        ckpt.solve_with_checkpoints(
            x, w, h, cfg, d, every=10, sharded_checkpoints=True
        )
