"""Pod-scale validation: the BASELINE.json config-5 program partitions cleanly.

Config 5: X of 1M x 131k, rank 512, sharded over a pod mesh.  No pod here, so
we validate what can be validated without one:

  * the sharded solve program LOWERS with abstract (no-memory) inputs at the
    full pod-scale shapes over an 8-device mesh — proving the shardings are
    consistent, every collective partitions, and the while_loop stays uniform;
  * the per-device memory arithmetic stays within a v5p HBM budget at the
    mesh the config names (v5p-64).

An actual numeric run at a scaled-down shape is covered by test_sharded.py.
"""

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from nmf_tpu import SolveConfig
from nmf_tpu.parallel.mesh import COL_AXIS, ROW_AXIS, make_mesh, nmf_shardings
from nmf_tpu.parallel.sharded import build_sharded_solver

M, N, K = 1_048_576, 131_072, 512  # BASELINE.json config 5


def test_podscale_program_lowers():
    mesh = make_mesh(shape=(4, 2))
    xs, ws, hs, _ = nmf_shardings(mesh)
    cfg = SolveConfig(max_iter=200, thresh=1e-5, check_every=25)
    fn = build_sharded_solver(cfg, mesh)
    from jax.sharding import NamedSharding, PartitionSpec

    rep = NamedSharding(mesh, PartitionSpec())
    abstract = (
        jax.ShapeDtypeStruct((M, N), np.float32, sharding=xs),
        jax.ShapeDtypeStruct((M, K), np.float32, sharding=ws),
        jax.ShapeDtypeStruct((K, N), np.float32, sharding=hs),
        jax.ShapeDtypeStruct((), np.float32, sharding=rep),
        jax.ShapeDtypeStruct((), np.float32, sharding=rep),  # initial_momentum
    )
    lowered = fn.lower(*abstract)  # raises if any sharding is inconsistent
    text = lowered.as_text()
    # the program contains the psum collectives over both axes
    assert "all-reduce" in text or "all_reduce" in text
    # outputs keep the canonical shardings
    out_info = jax.tree_util.tree_leaves(lowered.out_info)
    shapes = {tuple(o.shape) for o in out_info}
    assert (M, K) in shapes and (K, N) in shapes


def test_podscale_memory_budget():
    """Config 5 fits v5p-64: per-device arrays under HBM (95 GB/chip)."""
    r, c = 16, 4  # a v5p-64 mesh layout
    bytes_x = M // r * (N // c) * 4
    bytes_w = M // r * K * 4       # replicated over 'mc'
    bytes_h = K * (N // c) * 4     # replicated over 'mr'
    # solver peak: X + W + H + Z-free fused path temporaries (~W + H + K-sums)
    peak = bytes_x + 2 * (bytes_w + bytes_h)
    assert peak < 95e9, f"per-device peak {peak/1e9:.1f} GB exceeds v5p HBM"


def test_podscale_collective_volume():
    """Per-iteration comm is K-sized, not X-sized (the design invariant)."""
    r, c = 16, 4
    per_iter_floats = K * (N // c) + K * (M // r) + 2 * K + 1
    x_local_floats = (M // r) * (N // c)
    assert per_iter_floats < 0.03 * x_local_floats  # ~2.3% at config 5


@pytest.mark.parametrize("kind", ["reg", "masked", "h_only", "hals"])
def test_podscale_extension_programs_lower(kind):
    """The round-2 extension solvers also partition cleanly at config-5
    shapes (regularized / masked / HALS / H-only inference on the mesh)."""
    from nmf_tpu.parallel.sharded import (
        build_sharded_h_solver,
        build_sharded_masked_solver,
    )

    mesh = make_mesh(shape=(4, 2))
    xs, ws, hs, _ = nmf_shardings(mesh)
    rep = NamedSharding(mesh, P())
    ax = jax.ShapeDtypeStruct((M, N), np.float32, sharding=xs)
    aw = jax.ShapeDtypeStruct((M, K), np.float32, sharding=ws)
    ah = jax.ShapeDtypeStruct((K, N), np.float32, sharding=hs)
    ac = jax.ShapeDtypeStruct((), np.float32, sharding=rep)
    if kind == "reg":
        cfg = SolveConfig(max_iter=200, check_every=25, l1_h=0.01, l2_w=0.01)
        fn = build_sharded_solver(cfg, mesh)
        lowered = fn.lower(ax, aw, ah, ac, ac)
    elif kind == "masked":
        cfg = SolveConfig(max_iter=200, check_every=25)
        fn = build_sharded_masked_solver(cfg, mesh)
        lowered = fn.lower(ax, aw, ah, ax, ac, ac)  # mask shards like X
    elif kind == "hals":
        cfg = SolveConfig(max_iter=200, check_every=25, beta=2.0, algorithm="hals")
        fn = build_sharded_solver(cfg, mesh)
        lowered = fn.lower(ax, aw, ah, ac, ac)
    else:
        cfg = SolveConfig(max_iter=200, check_every=25)
        fn = build_sharded_h_solver(cfg, mesh)
        lowered = fn.lower(ax, aw, ah, ac, ac)
    text = lowered.as_text()
    assert "all-reduce" in text or "all_reduce" in text


def test_podscale_tile_sparse_program_lowers():
    """Tile-sparse on the mesh partitions at a pod-scale tile population:
    a 1M x 131k X at 1% occupancy in (128,128) tiles is ~84k tiles ->
    ~10.5k tiles/device on 4x2; abstract lowering proves the shard_map
    partitioning without allocating any of it."""
    from nmf_tpu.models.sparse_tiled import _tiled_sharded_fns

    mesh = make_mesh(shape=(4, 2))
    cfg = SolveConfig(max_iter=200, check_every=25)
    fn = _tiled_sharded_fns(cfg, 64, mesh)
    both = NamedSharding(mesh, P((ROW_AXIS, COL_AXIS)))
    ws = NamedSharding(mesh, P(ROW_AXIS, None))
    hs = NamedSharding(mesh, P(None, COL_AXIS))
    rep = NamedSharding(mesh, P())
    t_per_dev = 10_496  # chunk-aligned tiles per device
    t_glob = 8 * t_per_dev
    abstract = (
        (
            jax.ShapeDtypeStruct((t_glob, 128, 128), np.float32, sharding=both),
            jax.ShapeDtypeStruct((t_glob,), np.int32, sharding=both),
            jax.ShapeDtypeStruct((t_glob,), np.int32, sharding=both),
        ),
        jax.ShapeDtypeStruct((M, K), np.float32, sharding=ws),
        jax.ShapeDtypeStruct((K, N), np.float32, sharding=hs),
        jax.ShapeDtypeStruct((), np.float32, sharding=rep),
        jax.ShapeDtypeStruct((), np.float32, sharding=rep),  # initial_momentum
    )
    lowered = fn.lower(*abstract)
    assert "all-reduce" in lowered.as_text() or "all_reduce" in lowered.as_text()


@pytest.mark.parametrize("family", ["kl", "beta", "reg", "hals"])
def test_podscale_int8_streaming_blocks_lower(family):
    """The int8 x family x mesh streaming steps partition at config-5
    shapes: uint8 codes shard like X, per-column scales over 'mc'."""
    from nmf_tpu.models.streaming import _sharded_block_fns
    from nmf_tpu.utils.config import Precision

    mesh = make_mesh(shape=(4, 2))
    xs, ws, hs, _ = nmf_shardings(mesh)
    rep = NamedSharding(mesh, P())
    scales = NamedSharding(mesh, P(COL_AXIS))
    prec = Precision(x_dtype="int8")
    if family == "beta":
        cfg = SolveConfig(max_iter=200, check_every=25, beta=2.0, precision=prec)
        a2 = jax.ShapeDtypeStruct((M, K), np.float32, sharding=ws)
    elif family == "reg":
        cfg = SolveConfig(max_iter=200, check_every=25, l1_h=0.01, precision=prec)
        a2 = jax.ShapeDtypeStruct((K,), np.float32, sharding=rep)
    elif family == "hals":
        cfg = SolveConfig(
            max_iter=200, check_every=25, beta=2.0, algorithm="hals",
            precision=prec,
        )
        a2 = jax.ShapeDtypeStruct((K, K), np.float32, sharding=rep)
    else:
        cfg = SolveConfig(max_iter=200, check_every=25, precision=prec)
        a2 = jax.ShapeDtypeStruct((K,), np.float32, sharding=rep)
    step_acc, _, cost_block, _, _ = _sharded_block_fns(cfg, mesh)
    bn = 8192  # one streamed column block
    codes = jax.ShapeDtypeStruct((M, bn), np.uint8, sharding=xs)
    sc = jax.ShapeDtypeStruct((bn,), np.float32, sharding=scales)
    aw = jax.ShapeDtypeStruct((M, K), np.float32, sharding=ws)
    ah = jax.ShapeDtypeStruct((K, bn), np.float32, sharding=hs)
    a1 = jax.ShapeDtypeStruct((M, K), np.float32, sharding=ws)
    lowered = step_acc.lower(aw, ah, (codes, sc), a1, a2)
    assert "all-reduce" in lowered.as_text() or "all_reduce" in lowered.as_text()
    cost_block.lower(aw, ah, (codes, sc))


def test_podscale_int8_h_only_lowers():
    """Pod-scale int8 inference: the sharded H-only program partitions with
    quantized X (the serving path at 1/4 the HBM)."""
    from nmf_tpu.parallel.sharded import build_sharded_h_solver
    from nmf_tpu.utils.config import Precision

    mesh = make_mesh(shape=(4, 2))
    xs, ws, hs, _ = nmf_shardings(mesh)
    rep = NamedSharding(mesh, P())
    scales = NamedSharding(mesh, P(COL_AXIS))
    cfg = SolveConfig(
        max_iter=200, check_every=25, precision=Precision(x_dtype="int8")
    )
    fn = build_sharded_h_solver(cfg, mesh)
    codes = jax.ShapeDtypeStruct((M, N), np.uint8, sharding=xs)
    sc = jax.ShapeDtypeStruct((N,), np.float32, sharding=scales)
    aw = jax.ShapeDtypeStruct((M, K), np.float32, sharding=ws)
    ah = jax.ShapeDtypeStruct((K, N), np.float32, sharding=hs)
    ac = jax.ShapeDtypeStruct((), np.float32, sharding=rep)
    lowered = fn.lower((codes, sc), aw, ah, ac, ac)
    assert "all-reduce" in lowered.as_text() or "all_reduce" in lowered.as_text()


def test_podscale_online_block_lowers():
    """The online learner's sharded block update partitions at config-5
    shapes (W/A row-sharded, block X tiled, c replicated)."""
    from nmf_tpu.models.online import _online_sharded_jit

    mesh = make_mesh(shape=(4, 2))
    xs, ws, hs, _ = nmf_shardings(mesh)
    rep = NamedSharding(mesh, P())
    cfg = SolveConfig()
    fn = _online_sharded_jit(cfg, 20, mesh)
    bn = 8192
    aw = jax.ShapeDtypeStruct((M, K), np.float32, sharding=ws)
    aa = jax.ShapeDtypeStruct((M, K), np.float32, sharding=ws)
    ac = jax.ShapeDtypeStruct((K,), np.float32, sharding=rep)
    ax = jax.ShapeDtypeStruct((M, bn), np.float32, sharding=xs)
    ah = jax.ShapeDtypeStruct((K, bn), np.float32, sharding=hs)
    ar = jax.ShapeDtypeStruct((), np.float32, sharding=rep)
    lowered = fn.lower(aw, aa, ac, ax, ah, ar)
    assert "all-reduce" in lowered.as_text() or "all_reduce" in lowered.as_text()
