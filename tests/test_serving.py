"""AOT serving artifacts (nmf_tpu/serving.py): export → save → load → call.

The reference has no serving path (its binary refits both factors per run,
nmf.cu:37-45); this is the production analog of its one real application —
scoring new data against a trained dictionary.  The contract under test:

  * a loaded artifact reproduces ``solve_h_only`` (same config, jnp backend)
    to float32 round-off on block-aligned inputs, for every exportable
    family (plain KL, beta, regularized, HALS, accelerate, int8/bf16 X);
  * tail padding cannot perturb real columns (the H half-update is
    column-separable — module docstring proof);
  * unexportable knobs (pallas/autotune backend, live_metrics) raise;
  * the on-disk format round-trips and rejects foreign/newer files.
"""

import os
import zipfile

import numpy as np
import pytest

from nmf_tpu.models.nmf import solve_h_only
from nmf_tpu.serving import (
    FORMAT_VERSION,
    ServingResult,
    export_transform,
    load_transform,
    save_transform,
)
from nmf_tpu.utils.config import EPS_DEFAULT, Precision, SolveConfig

M, K, NB = 48, 5, 16


@pytest.fixture(scope="module")
def problem():
    rng = np.random.RandomState(7)
    w = rng.rand(M, K).astype(np.float32) + 0.1
    x = rng.rand(M, 3 * NB).astype(np.float32)
    h0 = np.maximum(
        rng.rand(K, 3 * NB).astype(np.float32), np.float32(EPS_DEFAULT)
    )
    return w, x, h0


def _roundtrip(tmp_path, w, config, n_block=NB, platforms=("cpu",)):
    path = os.path.join(str(tmp_path), "model.nmfz")
    save_transform(path, w, n_block, config, platforms=platforms)
    return load_transform(path)


CONFIGS = {
    "plain-kl": SolveConfig(max_iter=40, backend="jnp"),
    "thresh": SolveConfig(max_iter=200, thresh=1e-4, check_every=10,
                          backend="jnp"),
    "beta-2": SolveConfig(max_iter=40, beta=2.0, backend="jnp"),
    "reg": SolveConfig(max_iter=40, l1_h=0.01, l2_h=0.1, backend="jnp"),
    "hals": SolveConfig(max_iter=40, beta=2.0, algorithm="hals",
                        backend="jnp"),
    "accel": SolveConfig(max_iter=40, accelerate=True, backend="jnp"),
    "bf16-x": SolveConfig(
        max_iter=40, backend="jnp",
        precision=Precision("bfloat16", "float32", "bfloat16"),
    ),
    "bf16-state": SolveConfig(
        max_iter=40, backend="jnp",
        precision=Precision("bfloat16", "bfloat16", "float32"),
    ),
    "f32-fast": SolveConfig(
        max_iter=40, backend="jnp",
        precision=Precision("float32_fast", "float32", "float32"),
    ),
    "int8-x": SolveConfig(
        max_iter=40, backend="jnp",
        precision=Precision("float32", "float32", "int8"),
    ),
    "int8-rowblocks": SolveConfig(
        max_iter=40, backend="jnp",
        precision=Precision("float32", "float32", "int8", x_quant_rows=16),
    ),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_matches_solve_h_only(tmp_path, problem, name):
    """Block-aligned serving == the live library solve, per family."""
    w, x, h0 = problem
    config = CONFIGS[name]
    t = _roundtrip(tmp_path, w, config)
    res = t(x, h0=h0)
    if config.thresh == 0:
        ref_h = np.asarray(solve_h_only(x, w, h0, config).h, np.float32)
        # different program shapes (full-X vs per-block) reorder f32 dot
        # reductions; round-off level only
        np.testing.assert_allclose(
            res.h, ref_h, rtol=0, atol=2e-5 * ref_h.max()
        )
        assert np.all(res.block_iterations == config.max_iter)
        assert not res.converged
    else:
        # thresholded stops are per block (each block's cost is its own
        # convergence scalar) — compare block-by-block, where the exported
        # program and the live solver see identical problems
        for b in range(3):
            sl = slice(b * NB, (b + 1) * NB)
            ref = solve_h_only(x[:, sl], w, h0[:, sl], config)
            ref_h = np.asarray(ref.h, np.float32)
            np.testing.assert_allclose(
                res.h[:, sl], ref_h, rtol=0, atol=2e-5 * ref_h.max()
            )
            assert res.block_iterations[b] == int(ref.iterations)
            assert res.block_converged[b] == bool(ref.converged)
    assert res.h.shape == (K, x.shape[1])
    assert res.block_iterations.shape == (3,)
    assert np.isfinite(res.cost)


def test_padding_cannot_perturb_real_columns(tmp_path, problem):
    """Column separability: a tail-padded block returns bitwise-identical
    H for the real columns (same compiled program, zero-padded extras)."""
    w, x, h0 = problem
    t = _roundtrip(tmp_path, w, SolveConfig(max_iter=30, backend="jnp"))
    n_cut = 2 * NB + 5  # tail block: 5 real + 11 padded columns
    full = t(x, h0=h0)
    cut = t(x[:, :n_cut], h0=h0[:, :n_cut])
    np.testing.assert_array_equal(cut.h, full.h[:, :n_cut])


def test_ragged_and_single_column(tmp_path, problem):
    w, x, h0 = problem
    t = _roundtrip(tmp_path, w, SolveConfig(max_iter=10, backend="jnp"))
    one = t(x[:, :1], h0=h0[:, :1])
    assert one.h.shape == (K, 1)
    assert len(one.block_iterations) == 1
    with pytest.raises(ValueError, match="no columns"):
        t(x[:, :0])


def test_generated_h0_matches_cli_convention(tmp_path, problem):
    """h0=None seeds block b from RandomState(seed + b) at the block's REAL
    width — so block 0 of a block-aligned call is exactly the CLI
    transform's RandomState(seed).rand(k, n) convention (serve ==
    transform at equal shapes), while streaming callers never materialize
    a full (k, n) init."""
    w, x, _ = problem
    t = _roundtrip(tmp_path, w, SolveConfig(max_iter=10, backend="jnp"))
    n = x.shape[1]
    h0 = np.concatenate(
        [
            np.maximum(
                np.random.RandomState(3 + b).rand(K, NB).astype(np.float32),
                np.float32(EPS_DEFAULT),
            )
            for b in range(n // NB)
        ],
        axis=1,
    )
    np.testing.assert_array_equal(t(x, seed=3).h, t(x, h0=h0).h)
    # single-block call == the full-width CLI convention
    rng = np.random.RandomState(3)
    h0_full = np.maximum(
        rng.rand(K, NB).astype(np.float32), np.float32(EPS_DEFAULT)
    )
    np.testing.assert_array_equal(
        t(x[:, :NB], seed=3).h, t(x[:, :NB], h0=h0_full).h
    )


def test_shape_validation(tmp_path, problem):
    w, x, h0 = problem
    t = _roundtrip(tmp_path, w, SolveConfig(max_iter=5, backend="jnp"))
    with pytest.raises(ValueError, match="X must be"):
        t(x[:-1])
    with pytest.raises(ValueError, match="h0 must be"):
        t(x, h0=h0[:, :-1])


def test_unexportable_configs_raise(problem):
    w, _, _ = problem
    with pytest.raises(ValueError, match="Mosaic"):
        export_transform(w, NB, SolveConfig(backend="pallas"))
    with pytest.raises(ValueError, match="Mosaic"):
        export_transform(w, NB, SolveConfig(backend="autotune"))
    with pytest.raises(ValueError, match="callback"):
        export_transform(w, NB, SolveConfig(live_metrics=True))
    with pytest.raises(ValueError, match="n_block"):
        export_transform(w, 0, SolveConfig(backend="jnp"))
    with pytest.raises(ValueError, match="2-D"):
        export_transform(w[:, 0], NB, SolveConfig(backend="jnp"))


def test_auto_backend_exports_jnp_path(tmp_path, problem):
    """backend='auto' (the default) must not pull device-dependent picks
    into the artifact — it pins to the portable jnp path at export time."""
    w, x, h0 = problem
    t = _roundtrip(tmp_path, w, SolveConfig(max_iter=10))  # backend="auto"
    assert t.config.backend == "jnp"
    ref = solve_h_only(x, w, h0, SolveConfig(max_iter=10, backend="jnp"))
    np.testing.assert_allclose(
        t(x, h0=h0).h, np.asarray(ref.h), rtol=0, atol=1e-5
    )


def test_artifact_metadata_and_rejects(tmp_path, problem):
    w, _, _ = problem
    config = SolveConfig(max_iter=12, thresh=1e-3, backend="jnp")
    t = _roundtrip(tmp_path, w, config)
    assert (t.m, t.k, t.n_block) == (M, K, NB)
    assert t.config == config
    np.testing.assert_array_equal(t.w, w)
    # plain artifacts keep writing v1 so older loaders can read them
    # (masked artifacts write FORMAT_VERSION — test_masked_artifact_version_gate)
    assert t.meta["format_version"] == 1

    bogus = os.path.join(str(tmp_path), "bogus.nmfz")
    with zipfile.ZipFile(bogus, "w") as zf:
        zf.writestr("meta.json", '{"magic": "something-else"}')
    with pytest.raises(ValueError, match="not an nmf_tpu serving artifact"):
        load_transform(bogus)

    newer = os.path.join(str(tmp_path), "newer.nmfz")
    with zipfile.ZipFile(newer, "w") as zf:
        zf.writestr(
            "meta.json",
            '{"magic": "nmf_tpu-serving", "format_version": %d}'
            % (FORMAT_VERSION + 1),
        )
    with pytest.raises(ValueError, match="newer"):
        load_transform(newer)


def test_empty_platforms_rejected(problem):
    """jax.export would silently substitute the host platform — the artifact
    must never be mislabeled."""
    w, _, _ = problem
    with pytest.raises(ValueError, match="at least one lowering target"):
        export_transform(w, NB, SolveConfig(backend="jnp"), platforms=())


def test_meta_records_lowered_platforms(tmp_path, problem):
    """meta.json carries exported.platforms (what the program actually
    lowered for), not the raw user input."""
    w, _, _ = problem
    path = os.path.join(str(tmp_path), "m.nmfz")
    save_transform(path, w, NB, SolveConfig(backend="jnp"),
                   platforms=("CPU",))
    t = load_transform(path)
    assert [p.lower() for p in t.platforms] == ["cpu"]


def test_unknown_config_fields_warn_and_drop(tmp_path, problem):
    """A NEWER writer may add SolveConfig knobs; a deployed reader keeps
    serving (default semantics for the unknown knob) instead of crashing."""
    import json as _json
    import shutil

    w, x, h0 = problem
    path = os.path.join(str(tmp_path), "m.nmfz")
    save_transform(path, w, NB, SolveConfig(max_iter=10, backend="jnp"),
                   platforms=("cpu",))
    doctored = os.path.join(str(tmp_path), "newer-writer.nmfz")
    shutil.copy(path, doctored)
    with zipfile.ZipFile(path) as zf:
        meta = _json.loads(zf.read("meta.json"))
        program = zf.read("program.bin")
        wnpy = zf.read("w.npy")
    meta["config"]["some_future_knob"] = 42
    meta["config"]["precision"]["future_dtype"] = "fp4"
    with zipfile.ZipFile(doctored, "w") as zf:
        zf.writestr("meta.json", _json.dumps(meta))
        zf.writestr("program.bin", program)
        zf.writestr("w.npy", wnpy)
    with pytest.warns(UserWarning, match="some_future_knob"):
        t = load_transform(doctored)
    assert t.config.max_iter == 10
    assert t(x[:, :NB], h0=h0[:, :NB]).h.shape == (K, NB)


def test_truncated_artifact_raises_valueerror(tmp_path):
    path = os.path.join(str(tmp_path), "truncated.nmfz")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(
            "meta.json",
            '{"magic": "nmf_tpu-serving", "format_version": 1}',
        )
    with pytest.raises(ValueError, match="truncated artifact"):
        load_transform(path)
    empty = os.path.join(str(tmp_path), "empty.nmfz")
    with zipfile.ZipFile(empty, "w"):
        pass
    with pytest.raises(ValueError, match="not an nmf_tpu serving artifact"):
        load_transform(empty)


def test_multiplatform_lowering_includes_tpu(problem):
    """The default artifact lowers for tpu AND cpu from a CPU-only process
    (cross-platform lowering is the point of jax.export)."""
    w, _, _ = problem
    exported = export_transform(
        w, NB, SolveConfig(max_iter=5, backend="jnp"), platforms=("tpu", "cpu")
    )
    assert set(p.lower() for p in exported.platforms) == {"tpu", "cpu"}


def test_cli_export_serve_roundtrip(tmp_path, problem):
    """CLI: export → serve == transform at the same h0/config.

    Multi-block serving shares an explicit --h0 with the full-width
    transform (the DEFAULT init is per-block seeded so streaming callers
    never materialize a (k, n) matrix — with h0=None, serve == transform
    holds at single-block shapes, covered below and in the e2e harness)."""
    from nmf_tpu import cli
    from nmf_tpu.io import binio

    w, x, h0 = problem
    wp = os.path.join(str(tmp_path), "W.bin")
    xp = os.path.join(str(tmp_path), "X.bin")
    h0p = os.path.join(str(tmp_path), "H0.bin")
    ap = os.path.join(str(tmp_path), "model.nmfz")
    hs = os.path.join(str(tmp_path), "Hserve.bin")
    ht = os.path.join(str(tmp_path), "Htr.bin")
    binio.write_matrix(w, wp)
    binio.write_matrix(x, xp)
    binio.write_matrix(h0, h0p)
    assert cli.main([
        "export", wp, "-o", ap, "--block-cols", str(NB),
        "--platforms", "cpu", "--max-iter", "20", "-q",
    ]) == 0
    assert cli.main(["serve", ap, xp, "-o", hs, "--h0", h0p, "-q"]) == 0
    assert cli.main([
        "transform", xp, wp, "-o", ht, "--max-iter", "20",
        "--backend", "jnp", "--h0", h0p, "-q",
    ]) == 0
    a, b = binio.read_matrix(hs), binio.read_matrix(ht)
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-5 * np.abs(b).max())
    # default-h0 parity at a single-block shape: bit-identical
    xs = os.path.join(str(tmp_path), "X1.bin")
    binio.write_matrix(x[:, :NB], xs)
    hs1 = os.path.join(str(tmp_path), "Hserve1.bin")
    ht1 = os.path.join(str(tmp_path), "Htr1.bin")
    assert cli.main(["serve", ap, xs, "-o", hs1, "-q"]) == 0
    assert cli.main([
        "transform", xs, wp, "-o", ht1, "--max-iter", "20",
        "--backend", "jnp", "-q",
    ]) == 0
    np.testing.assert_array_equal(
        binio.read_matrix(hs1), binio.read_matrix(ht1)
    )


def test_cli_export_rejects_inapplicable_flags(tmp_path, problem):
    from nmf_tpu import cli
    from nmf_tpu.io import binio

    w, _, _ = problem
    wp = os.path.join(str(tmp_path), "W.bin")
    binio.write_matrix(w, wp)
    out = os.path.join(str(tmp_path), "m.nmfz")
    assert cli.main(["export", wp, "-o", out, "--backend", "pallas"]) == 2
    # --block-n is the STREAMING flag; the artifact width is --block-cols
    assert cli.main(["export", wp, "-o", out, "--block-n", "64"]) == 2
    assert cli.main(["export", wp, "-o", out, "--platforms", ","]) == 2
    assert not os.path.exists(out)


MESH_CONFIGS = {
    "plain-kl": SolveConfig(max_iter=25, backend="jnp"),
    "hals": SolveConfig(max_iter=25, beta=2.0, algorithm="hals",
                        backend="jnp"),
    "reg": SolveConfig(max_iter=25, l1_h=0.01, l2_h=0.1, backend="jnp"),
    "accel": SolveConfig(max_iter=25, accelerate=True, backend="jnp"),
    "bf16-x": SolveConfig(
        max_iter=25, backend="jnp",
        precision=Precision("bfloat16", "float32", "bfloat16"),
    ),
}


@pytest.mark.parametrize("name", sorted(MESH_CONFIGS))
def test_mesh_artifact_matches_solve_h_only(tmp_path, problem, name):
    """A mesh_shape artifact (shard_map solver over an AbstractMesh) serves
    on a real 4x2 device mesh and reproduces the live solve."""
    w, x, h0 = problem
    config = MESH_CONFIGS[name]
    path = os.path.join(str(tmp_path), "mesh.nmfz")
    save_transform(path, w, NB, config, platforms=("cpu",),
                   mesh_shape=(4, 2))
    t = load_transform(path)
    assert t.mesh_shape == (4, 2)
    res = t(x, h0=h0)  # 3 blocks, canonical placement handled by the loader
    ref = solve_h_only(x, w, h0, config)
    ref_h = np.asarray(ref.h, np.float32)
    np.testing.assert_allclose(res.h, ref_h, rtol=0, atol=5e-5 * ref_h.max())


def test_mesh_artifact_padding_and_shapes(tmp_path, problem):
    w, x, h0 = problem
    path = os.path.join(str(tmp_path), "mesh.nmfz")
    save_transform(path, w, NB, SolveConfig(max_iter=10, backend="jnp"),
                   platforms=("cpu",), mesh_shape=(2, 4))
    t = load_transform(path)
    n_cut = NB + 3  # ragged tail on the mesh path too
    cut = t(x[:, :n_cut], h0=h0[:, :n_cut])
    full = t(x, h0=h0)
    np.testing.assert_array_equal(cut.h, full.h[:, :n_cut])


def test_mesh_export_validation(problem):
    w, _, _ = problem
    # M=48 not divisible by 5 mesh rows; NB=16 not divisible by 3 cols
    with pytest.raises(ValueError, match="divisible"):
        export_transform(w, NB, SolveConfig(backend="jnp"),
                         platforms=("cpu",), mesh_shape=(5, 1))
    with pytest.raises(ValueError, match="divisible"):
        export_transform(w, NB, SolveConfig(backend="jnp"),
                         platforms=("cpu",), mesh_shape=(1, 3))
    with pytest.raises(ValueError, match="int8"):
        export_transform(
            w, NB,
            SolveConfig(backend="jnp",
                        precision=Precision(x_dtype="int8")),
            platforms=("cpu",), mesh_shape=(4, 2),
        )


def test_mesh_artifact_rejects_wrong_mesh(tmp_path, problem):
    from nmf_tpu.parallel.mesh import make_mesh

    w, _, _ = problem
    path = os.path.join(str(tmp_path), "mesh.nmfz")
    save_transform(path, w, NB, SolveConfig(max_iter=5, backend="jnp"),
                   platforms=("cpu",), mesh_shape=(4, 2))
    with pytest.raises(ValueError, match="exported for a 4x2 mesh"):
        load_transform(path, mesh=make_mesh(shape=(2, 2)))


def test_cli_mesh_export_serve(tmp_path, problem):
    from nmf_tpu import cli
    from nmf_tpu.io import binio

    w, x, _ = problem
    wp = os.path.join(str(tmp_path), "W.bin")
    xp = os.path.join(str(tmp_path), "X.bin")
    ap = os.path.join(str(tmp_path), "mesh.nmfz")
    hp = os.path.join(str(tmp_path), "H.bin")
    binio.write_matrix(w, wp)
    binio.write_matrix(x, xp)
    assert cli.main([
        "export", wp, "-o", ap, "--block-cols", str(NB), "--mesh", "4x2",
        "--platforms", "cpu", "--max-iter", "15", "-q",
    ]) == 0
    assert cli.main(["serve", ap, xp, "-o", hp, "--mesh", "4x2", "-q"]) == 0
    h = binio.read_matrix(hp)
    assert h.shape == (K, x.shape[1])
    assert np.isfinite(h).all()


def test_stream_bin_matches_in_memory(tmp_path, problem):
    """stream_bin == __call__ on the loaded matrix (same h0 convention,
    same per-block program); the out_path variant writes the identical
    .bin and returns h=None."""
    from nmf_tpu.io import binio

    w, x, _ = problem
    x = x[:, : 2 * NB + 5]  # ragged tail through the streaming path too
    xp = os.path.join(str(tmp_path), "X.bin")
    binio.write_matrix(x, xp)
    t = _roundtrip(tmp_path, w, SolveConfig(max_iter=15, backend="jnp"))
    mem = t(x, seed=4)
    streamed = t.stream_bin(xp, seed=4)
    np.testing.assert_array_equal(streamed.h, mem.h)
    np.testing.assert_array_equal(
        streamed.block_iterations, mem.block_iterations
    )
    hp = os.path.join(str(tmp_path), "H.bin")
    disk = t.stream_bin(xp, out_path=hp, seed=4)
    assert disk.h is None
    np.testing.assert_array_equal(binio.read_matrix(hp), mem.h)
    np.testing.assert_array_equal(disk.block_costs, streamed.block_costs)


def test_stream_bin_validation(tmp_path, problem):
    from nmf_tpu.io import binio

    w, x, _ = problem
    xp = os.path.join(str(tmp_path), "Xbad.bin")
    binio.write_matrix(x[:-1], xp)  # wrong row count
    t = _roundtrip(tmp_path, w, SolveConfig(max_iter=5, backend="jnp"))
    with pytest.raises(ValueError, match="rows"):
        t.stream_bin(xp)


def test_no_prefetch_bit_identical(tmp_path, problem):
    """prefetch=False (serial scheduling, CLI --no-prefetch) changes only
    the overlap, never the bytes."""
    from nmf_tpu.io import binio

    w, x, _ = problem
    xp = os.path.join(str(tmp_path), "X.bin")
    binio.write_matrix(x, xp)
    t = _roundtrip(tmp_path, w, SolveConfig(max_iter=10, backend="jnp"))
    np.testing.assert_array_equal(t(x, seed=1, prefetch=False).h,
                                  t(x, seed=1).h)
    np.testing.assert_array_equal(
        t.stream_bin(xp, seed=1, prefetch=False).h,
        t.stream_bin(xp, seed=1).h,
    )


def test_stream_bin_failure_leaves_no_output(tmp_path, problem):
    """A stream that dies mid-run must not leave a header-complete but
    payload-truncated .bin at out_path (the output appears atomically)."""
    from nmf_tpu.io import binio

    w, x, _ = problem
    xp = os.path.join(str(tmp_path), "X.bin")
    binio.write_matrix(x, xp)
    # truncate the source after the header + one block of payload
    data = open(xp, "rb").read()
    with open(xp, "wb") as f:
        f.write(data[: 8 + M * NB * 4])
    hp = os.path.join(str(tmp_path), "H.bin")
    t = _roundtrip(tmp_path, w, SolveConfig(max_iter=5, backend="jnp"))
    with pytest.raises(ValueError):
        t.stream_bin(xp, out_path=hp)
    assert not os.path.exists(hp)
    assert not os.path.exists(hp + ".part")


def test_h0_list_input_accepted(tmp_path, problem):
    """Array-likes coerce the same way in __call__ and stream_bin."""
    from nmf_tpu.io import binio

    w, x, _ = problem
    x = x[:, :NB]
    xp = os.path.join(str(tmp_path), "X1.bin")
    binio.write_matrix(x, xp)
    t = _roundtrip(tmp_path, w, SolveConfig(max_iter=5, backend="jnp"))
    h0 = [[0.5] * NB] * K
    np.testing.assert_array_equal(
        t(x, h0=h0).h, t.stream_bin(xp, h0=h0).h
    )


def test_load_rejects_corrupt_w(tmp_path, problem):
    """A tampered w.npy fails loudly at load, not as an opaque program
    calling-convention error at first dispatch."""
    w, _, _ = problem
    path = os.path.join(str(tmp_path), "m.nmfz")
    save_transform(path, w, NB, SolveConfig(backend="jnp"),
                   platforms=("cpu",))
    import io as _io
    import json as _json

    with zipfile.ZipFile(path, "r") as zf:
        meta = zf.read("meta.json")
        prog = zf.read("program.bin")
    bad = _io.BytesIO()
    np.save(bad, np.zeros((M, K + 1), np.float32))
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("meta.json", meta)
        zf.writestr("program.bin", prog)
        zf.writestr("w.npy", bad.getvalue())
    with pytest.raises(ValueError, match="corrupt artifact"):
        load_transform(path)


def test_cli_serve_out_of_core(tmp_path, problem):
    from nmf_tpu import cli
    from nmf_tpu.io import binio

    w, x, _ = problem
    wp = os.path.join(str(tmp_path), "W.bin")
    xp = os.path.join(str(tmp_path), "X.bin")
    ap = os.path.join(str(tmp_path), "m.nmfz")
    h_mem = os.path.join(str(tmp_path), "Hmem.bin")
    h_str = os.path.join(str(tmp_path), "Hstr.bin")
    binio.write_matrix(w, wp)
    binio.write_matrix(x, xp)
    assert cli.main([
        "export", wp, "-o", ap, "--block-cols", str(NB),
        "--platforms", "cpu", "--max-iter", "10", "-q",
    ]) == 0
    assert cli.main(["serve", ap, xp, "-o", h_mem, "-q"]) == 0
    assert cli.main([
        "serve", ap, xp, "-o", h_str, "--out-of-core", "-q",
    ]) == 0
    np.testing.assert_array_equal(
        binio.read_matrix(h_str), binio.read_matrix(h_mem)
    )


def test_cli_info_describes_artifact(tmp_path, problem, capsys):
    from nmf_tpu import cli

    w, _, _ = problem
    ap = os.path.join(str(tmp_path), "m.nmfz")
    save_transform(ap, w, NB, SolveConfig(max_iter=7, backend="jnp"),
                   platforms=("cpu",))
    assert cli.main(["info", ap]) == 0
    out = capsys.readouterr().out
    assert "serving artifact" in out
    assert f"W {M}x{K}" in out and f"block {NB} cols" in out
    assert "max_iter 7" in out


def test_serving_result_aggregates():
    r = ServingResult(
        h=np.zeros((2, 3), np.float32),
        block_iterations=np.asarray([10, 20], np.int32),
        block_costs=np.asarray([1.5, 2.5], np.float32),
        block_converged=np.asarray([True, False]),
        n_block=2,
    )
    assert r.cost == 4.0
    assert r.iterations == 20
    assert not r.converged


# ---------------------------------------------------------------------------
# masked serving artifacts (missing-data scoring at serve time)
# ---------------------------------------------------------------------------


def _masked_roundtrip(tmp_path, w, config, n_block=NB, mesh_shape=None):
    path = os.path.join(str(tmp_path), "masked.nmfz")
    save_transform(path, w, n_block, config, platforms=("cpu",),
                   mesh_shape=mesh_shape, masked=True)
    return path


def test_masked_artifact_matches_solve_masked_h_only(tmp_path, problem):
    from nmf_tpu.models.masked import solve_masked_h_only

    w, x, h0 = problem
    rng = np.random.RandomState(11)
    mask = (rng.rand(*x.shape) > 0.3).astype(np.float32)
    config = SolveConfig(max_iter=25, backend="jnp", l1_h=0.01)
    t = load_transform(_masked_roundtrip(tmp_path, w, config))
    assert t.masked
    res = t(x, h0=h0, mask=mask)
    ref = solve_masked_h_only(x, w, h0, mask, config)
    ref_h = np.asarray(ref.h, np.float32)
    np.testing.assert_allclose(res.h, ref_h, rtol=0, atol=2e-5 * ref_h.max())
    assert res.h.shape == (K, x.shape[1])


def test_masked_artifact_padding_fully_inert(tmp_path, problem):
    """Padded columns carry mask 0 — fully unobserved, so they contribute
    nothing to the masked objective: ragged vs exact-width results agree."""
    w, x, h0 = problem
    rng = np.random.RandomState(12)
    mask = (rng.rand(*x.shape) > 0.3).astype(np.float32)
    config = SolveConfig(max_iter=10, backend="jnp")
    t = load_transform(_masked_roundtrip(tmp_path, w, config))
    n_cut = 2 * NB + 5  # ragged tail
    res = t(x[:, :n_cut], h0=h0[:, :n_cut], mask=mask[:, :n_cut])
    # block-aligned reference over the same columns, block by block
    for b in range(2):
        sl = slice(b * NB, (b + 1) * NB)
        ref = t(x[:, sl], h0=h0[:, sl], mask=mask[:, sl])
        np.testing.assert_array_equal(res.h[:, sl], ref.h)


def test_masked_artifact_mask_contract(tmp_path, problem):
    w, x, h0 = problem
    config = SolveConfig(max_iter=5, backend="jnp")
    t = load_transform(_masked_roundtrip(tmp_path, w, config))
    with pytest.raises(ValueError, match="requires a mask"):
        t(x)
    with pytest.raises(ValueError, match="mask shape"):
        t(x, mask=np.ones((1, 1), np.float32))
    # streaming a masked artifact needs the mask .bin alongside X
    with pytest.raises(ValueError, match="mask_path"):
        t.stream_bin("nope.bin")
    # plain artifacts reject a mask
    plain = _roundtrip(tmp_path, w, config)
    with pytest.raises(ValueError, match="takes no mask"):
        plain(x, mask=np.ones_like(x))
    # masked + non-KL families reject at export
    with pytest.raises(ValueError, match="KL"):
        save_transform(
            os.path.join(str(tmp_path), "bad.nmfz"), w, NB,
            SolveConfig(beta=2.0, backend="jnp"), platforms=("cpu",),
            masked=True,
        )


def test_masked_artifact_version_gate(tmp_path, problem):
    """Masked artifacts write format v2 (older loaders reject them with a
    clean error); plain artifacts keep writing v1."""
    w, _, _ = problem
    config = SolveConfig(max_iter=5, backend="jnp")
    t_plain = _roundtrip(tmp_path, w, config)
    assert t_plain.meta["format_version"] == 1
    t_masked = load_transform(_masked_roundtrip(tmp_path, w, config))
    assert t_masked.meta["format_version"] == 2
    # v3 = quantized-input artifacts; v4 = masked x quantized-input
    assert FORMAT_VERSION == 4


def test_masked_mesh_artifact(tmp_path, problem):
    from nmf_tpu.models.masked import solve_masked_h_only
    from nmf_tpu.parallel.mesh import make_mesh

    w, x, h0 = problem
    rng = np.random.RandomState(14)
    mask = (rng.rand(*x.shape) > 0.25).astype(np.float32)
    config = SolveConfig(max_iter=15, backend="jnp")
    path = _masked_roundtrip(tmp_path, w, config, mesh_shape=(4, 2))
    mesh = make_mesh(shape=(4, 2))
    t = load_transform(path, mesh=mesh)
    res = t(x, h0=h0, mask=mask)
    ref = solve_masked_h_only(x, w, h0, mask, config)
    ref_h = np.asarray(ref.h, np.float32)
    np.testing.assert_allclose(res.h, ref_h, rtol=0, atol=5e-5 * ref_h.max())


def test_cli_masked_export_serve(tmp_path, problem):
    from nmf_tpu import cli
    from nmf_tpu.io import binio
    from nmf_tpu.models.masked import solve_masked_h_only

    w, x, h0 = problem
    rng = np.random.RandomState(15)
    mask = (rng.rand(*x.shape) > 0.3).astype(np.float32)
    wp = os.path.join(str(tmp_path), "W.bin")
    xp = os.path.join(str(tmp_path), "X.bin")
    mp = os.path.join(str(tmp_path), "M.bin")
    h0p = os.path.join(str(tmp_path), "H0.bin")
    ap = os.path.join(str(tmp_path), "m.nmfz")
    hp = os.path.join(str(tmp_path), "H.bin")
    for arr, p in ((w, wp), (x, xp), (mask, mp), (h0, h0p)):
        binio.write_matrix(arr, p)
    assert cli.main([
        "export", wp, "-o", ap, "--block-cols", str(NB), "--masked",
        "--platforms", "cpu", "--max-iter", "10", "-q",
    ]) == 0
    assert cli.main([
        "serve", ap, xp, "-o", hp, "--mask", mp, "--h0", h0p, "-q",
    ]) == 0
    ref = solve_masked_h_only(x, w, h0, mask, SolveConfig(max_iter=10, backend="jnp"))
    ref_h = np.asarray(ref.h, np.float32)
    np.testing.assert_allclose(
        binio.read_matrix(hp), ref_h, rtol=0, atol=2e-5 * ref_h.max()
    )
    # masked + --out-of-core streams the mask .bin alongside X and must
    # reproduce the in-memory serve (h0 defaults differ only by seed
    # convention, so pin the same h0 via a full-width in-memory reference)
    hp2 = os.path.join(str(tmp_path), "H_ooc.bin")
    assert cli.main([
        "serve", ap, xp, "-o", hp2, "--mask", mp, "--out-of-core", "-q",
    ]) == 0
    t = load_transform(ap)
    in_mem = t(x, seed=0, mask=mask)
    np.testing.assert_array_equal(binio.read_matrix(hp2), in_mem.h)


def test_load_rejects_meta_program_drift(tmp_path, problem):
    """meta.json is cross-checked against the deserialized program's own
    input signature: a drifted n_block or masked flag fails at load, not as
    an opaque calling-convention error at first dispatch."""
    import io as _io
    import json as _json

    w, _, _ = problem
    path = os.path.join(str(tmp_path), "m.nmfz")
    save_transform(path, w, NB, SolveConfig(backend="jnp"),
                   platforms=("cpu",))
    with zipfile.ZipFile(path, "r") as zf:
        meta = _json.loads(zf.read("meta.json"))
        prog = zf.read("program.bin")
        wnpy = zf.read("w.npy")

    def rewrite(meta_dict, out):
        with zipfile.ZipFile(out, "w") as zf:
            zf.writestr("meta.json", _json.dumps(meta_dict))
            zf.writestr("program.bin", prog)
            zf.writestr("w.npy", wnpy)

    drifted = dict(meta, n_block=NB * 2)
    p1 = os.path.join(str(tmp_path), "drift_nb.nmfz")
    rewrite(drifted, p1)
    with pytest.raises(ValueError, match="corrupt artifact"):
        load_transform(p1)
    flipped = dict(meta, masked=True)
    p2 = os.path.join(str(tmp_path), "drift_mask.nmfz")
    rewrite(flipped, p2)
    with pytest.raises(ValueError, match="corrupt artifact"):
        load_transform(p2)


# ---------------------------------------------------------------------------
# Quantized-input artifacts (format v3): the program takes host-quantized
# (codes, scales) instead of f32 X, so serve-time H2D moves uint8 codes —
# ~4x less traffic on the link-bound serving path.  Contract: bit-identical
# to the in-program-quantization artifact (only WHERE the quantization runs
# differs; ops/quant's NumPy twins are bit-exact by test_quant).


def _quant_configs():
    return {
        "int8-cols": CONFIGS["int8-x"],
        "int8-rowblocks": CONFIGS["int8-rowblocks"],
    }


@pytest.mark.parametrize("name", sorted(_quant_configs()))
def test_quantized_artifact_bit_identical(tmp_path, problem, name):
    """Quantized-input serving == in-program-quantization serving, bitwise —
    including the eps-clamped zero padding of a ragged tail block."""
    w, x, h0 = problem
    config = _quant_configs()[name]
    plain = os.path.join(str(tmp_path), "plain.nmfz")
    quant = os.path.join(str(tmp_path), "quant.nmfz")
    save_transform(plain, w, NB, config, platforms=("cpu",))
    save_transform(
        quant, w, NB, config, platforms=("cpu",), quantized_input=True
    )
    tq = load_transform(quant)
    assert tq.meta["format_version"] == 3
    assert tq.quantized
    n_cut = 2 * NB + 5  # ragged tail: padding quantizes identically
    for xs, h0s in ((x, h0), (x[:, :n_cut], h0[:, :n_cut])):
        ref = load_transform(plain)(xs, h0=h0s)
        res = tq(xs, h0=h0s)
        np.testing.assert_array_equal(res.h, ref.h)
        np.testing.assert_array_equal(
            res.block_iterations, ref.block_iterations
        )
        np.testing.assert_array_equal(res.block_costs, ref.block_costs)


def test_quantized_artifact_stream_bin(tmp_path, problem):
    """Out-of-core serving through a quantized artifact matches in-memory."""
    from nmf_tpu.io import binio

    w, x, h0 = problem
    config = CONFIGS["int8-x"]
    path = os.path.join(str(tmp_path), "q.nmfz")
    save_transform(path, w, NB, config, platforms=("cpu",),
                   quantized_input=True)
    t = load_transform(path)
    xp = os.path.join(str(tmp_path), "X.bin")
    binio.write_matrix(x, xp)
    out = os.path.join(str(tmp_path), "H.bin")
    streamed = t.stream_bin(xp, out_path=out, seed=3)
    in_mem = t(x, seed=3)
    np.testing.assert_array_equal(binio.read_matrix(out), in_mem.h)
    np.testing.assert_array_equal(
        streamed.block_iterations, in_mem.block_iterations
    )


def test_quantized_export_validation(problem):
    """quantized_input is int8-only — the violation fails eagerly at
    export with an actionable message (mesh_shape and masked compose; see
    the dedicated tests below)."""
    w, _, _ = problem
    with pytest.raises(ValueError, match="int8"):
        export_transform(w, NB, SolveConfig(max_iter=5, backend="jnp"),
                         quantized_input=True)
    cfg = CONFIGS["int8-x"]
    # the in-program int8 x mesh exclusion stands, and its message points
    # at the composition that DOES work
    with pytest.raises(ValueError, match="quantized_input=True"):
        export_transform(w, NB, cfg, mesh_shape=(4, 2))


@pytest.mark.parametrize("mesh_shape", [None, (2, 4)])
@pytest.mark.parametrize("name", sorted(_quant_configs()))
def test_masked_quantized_artifact_bit_identical(tmp_path, problem, name,
                                                 mesh_shape):
    """Masked x quantized-input (format v4): the host reproduces the
    in-program masked prep exactly — clamp, zero unobserved (incl. NaN
    garbage), quantize — so results match the masked in-program-int8
    artifact bitwise single-device (and to psum tolerance on a mesh),
    while the wire carries uint8 codes."""
    w, x, h0 = problem
    config = _quant_configs()[name]
    rng = np.random.RandomState(7)
    mask = (rng.rand(*x.shape) > 0.25).astype(np.float32)
    xg = x.copy()
    xg[mask == 0] = np.nan  # unobserved entries are garbage by contract
    plain = os.path.join(str(tmp_path), "plain.nmfz")
    quant = os.path.join(str(tmp_path), "quant.nmfz")
    save_transform(plain, w, NB, config, platforms=("cpu",), masked=True)
    save_transform(quant, w, NB, config, platforms=("cpu",), masked=True,
                   mesh_shape=mesh_shape, quantized_input=True)
    tq = load_transform(quant)
    assert tq.quantized and tq.masked
    assert tq.meta["format_version"] == 4
    n_cut = NB + 5  # ragged tail: mask/X pad and quantize identically
    for xs, h0s, ms in (
        (xg, h0, mask), (xg[:, :n_cut], h0[:, :n_cut], mask[:, :n_cut]),
    ):
        ref = load_transform(plain)(xs, h0=h0s, mask=ms)
        res = tq(xs, h0=h0s, mask=ms)
        ref_h = np.asarray(ref.h, np.float32)
        if mesh_shape is None:
            np.testing.assert_array_equal(res.h, ref_h)
            np.testing.assert_array_equal(
                res.block_costs, ref.block_costs
            )
        else:
            np.testing.assert_allclose(
                res.h, ref_h, rtol=0, atol=5e-5 * ref_h.max()
            )
        np.testing.assert_array_equal(
            res.block_iterations, ref.block_iterations
        )


@pytest.mark.parametrize("name", sorted(_quant_configs()))
def test_quantized_mesh_artifact_matches_single_device(tmp_path, problem, name):
    """Mesh x quantized-input serving: host-quantized (codes, scales)
    blocks feed the shard_map solver — whole-column host quantization IS
    the solver's scale layout, so the per-shard exclusion that bars
    in-program int8 on meshes does not apply here.  The mesh artifact
    must reproduce the single-device quantized artifact (clamp-after-psum
    parity) including a ragged tail, for per-column AND row-block scales."""
    w, x, h0 = problem
    config = _quant_configs()[name]
    single = os.path.join(str(tmp_path), "single.nmfz")
    mesh = os.path.join(str(tmp_path), "mesh.nmfz")
    save_transform(single, w, NB, config, platforms=("cpu",),
                   quantized_input=True)
    save_transform(mesh, w, NB, config, platforms=("cpu",),
                   mesh_shape=(4, 2), quantized_input=True)
    tm = load_transform(mesh)
    assert tm.quantized and tm.mesh_shape == (4, 2)
    # per-column scales place correctly under v3 loaders (so stay v3);
    # a mesh artifact with a 2-D row-block table needs v4 (a v3 loader
    # would place it with the 1-D ('mc',) spec)
    expect_v = 4 if config.precision.x_quant_rows else 3
    assert tm.meta["format_version"] == expect_v
    ts = load_transform(single)
    n_cut = NB + 5  # ragged tail quantizes/pads identically on the mesh
    for xs, h0s in ((x, h0), (x[:, :n_cut], h0[:, :n_cut])):
        ref = ts(xs, h0=h0s)
        res = tm(xs, h0=h0s)
        ref_h = np.asarray(ref.h, np.float32)
        np.testing.assert_allclose(
            res.h, ref_h, rtol=0, atol=5e-5 * ref_h.max()
        )
        np.testing.assert_array_equal(
            res.block_iterations, ref.block_iterations
        )


def test_quantized_meta_program_drift_rejected(tmp_path, problem):
    """A plain artifact whose meta claims quantized_input fails the
    program-signature cross-check at load (f32 first input, not uint8)."""
    import json as _json

    w, _, _ = problem
    path = os.path.join(str(tmp_path), "p.nmfz")
    save_transform(path, w, NB, CONFIGS["int8-x"], platforms=("cpu",))
    with zipfile.ZipFile(path, "r") as zf:
        meta = _json.loads(zf.read("meta.json"))
        prog = zf.read("program.bin")
        wnpy = zf.read("w.npy")
    bad = os.path.join(str(tmp_path), "drift.nmfz")
    with zipfile.ZipFile(bad, "w") as zf:
        zf.writestr(
            "meta.json",
            _json.dumps(dict(meta, quantized_input=True, format_version=3)),
        )
        zf.writestr("program.bin", prog)
        zf.writestr("w.npy", wnpy)
    with pytest.raises(ValueError, match="corrupt artifact"):
        load_transform(bad)


def test_cli_quantized_export_serve(tmp_path, problem):
    """CLI --quantized-input export serves bit-identically to the plain
    int8 artifact through the same `serve` invocation."""
    from nmf_tpu import cli
    from nmf_tpu.io import binio

    w, x, h0 = problem
    wp = os.path.join(str(tmp_path), "W.bin")
    xp = os.path.join(str(tmp_path), "X.bin")
    h0p = os.path.join(str(tmp_path), "H0.bin")
    for arr, p in ((w, wp), (x, xp), (h0, h0p)):
        binio.write_matrix(arr, p)
    outs = {}
    for label, extra in (("plain", []), ("quant", ["--quantized-input"])):
        ap = os.path.join(str(tmp_path), f"{label}.nmfz")
        hp = os.path.join(str(tmp_path), f"H_{label}.bin")
        assert cli.main([
            "export", wp, "-o", ap, "--block-cols", str(NB),
            "--platforms", "cpu", "--max-iter", "10",
            "--x-dtype", "int8", "-q", *extra,
        ]) == 0
        assert cli.main(["serve", ap, xp, "-o", hp, "--h0", h0p, "-q"]) == 0
        outs[label] = binio.read_matrix(hp)
    np.testing.assert_array_equal(outs["quant"], outs["plain"])
    # non-int8 export with the flag fails loudly
    ap = os.path.join(str(tmp_path), "bad.nmfz")
    assert cli.main([
        "export", wp, "-o", ap, "--block-cols", str(NB),
        "--platforms", "cpu", "--quantized-input", "-q",
    ]) == 2


@pytest.mark.parametrize("quantized", [False, True])
def test_masked_artifact_stream_bin(tmp_path, problem, quantized):
    """Masked artifacts serve out-of-core: the mask .bin's column blocks
    stream off disk alongside X's, and the result matches the in-memory
    masked call exactly (same per-block program and h0 convention)."""
    from nmf_tpu.io import binio

    w, x, h0 = problem
    config = CONFIGS["int8-x"] if quantized else SolveConfig(
        max_iter=20, backend="jnp"
    )
    rng = np.random.RandomState(11)
    mask = (rng.rand(*x.shape) > 0.3).astype(np.float32)
    path = os.path.join(str(tmp_path), "m.nmfz")
    save_transform(path, w, NB, config, platforms=("cpu",), masked=True,
                   quantized_input=quantized)
    t = load_transform(path)
    xp = os.path.join(str(tmp_path), "X.bin")
    mp = os.path.join(str(tmp_path), "mask.bin")
    binio.write_matrix(x, xp)
    binio.write_matrix(mask, mp)
    out = os.path.join(str(tmp_path), "H.bin")
    streamed = t.stream_bin(xp, out_path=out, seed=3, mask_path=mp)
    in_mem = t(x, seed=3, mask=mask)
    np.testing.assert_array_equal(binio.read_matrix(out), in_mem.h)
    np.testing.assert_array_equal(
        streamed.block_iterations, in_mem.block_iterations
    )
    np.testing.assert_array_equal(streamed.block_costs, in_mem.block_costs)

    # contract: masked artifacts demand mask_path; unmasked reject it;
    # a mask whose shape disagrees with X is caught before any work
    with pytest.raises(ValueError, match="requires a mask"):
        t.stream_bin(xp)
    plain = os.path.join(str(tmp_path), "p.nmfz")
    save_transform(plain, w, NB, SolveConfig(max_iter=5, backend="jnp"),
                   platforms=("cpu",))
    with pytest.raises(ValueError, match="takes no mask"):
        load_transform(plain).stream_bin(xp, mask_path=mp)
    short = os.path.join(str(tmp_path), "short.bin")
    binio.write_matrix(mask[:, :-1], short)
    with pytest.raises(ValueError, match="must match X"):
        t.stream_bin(xp, mask_path=short)


# --- default-gate serving-composition slices (VERDICT r04 weak #6) --------
# Fixed-seed cases through the SAME driver the nightly fuzz uses
# (serving_cases.run_serving_composition), so a v4-composition regression
# fails inside the 2-minute gate instead of waiting for the slow tier.


@pytest.mark.parametrize(
    "case",
    [
        # the full v4 composition: masked x quantized x mesh, ragged tail,
        # row-block scale table (qrows=4 -> 2-D scales)
        dict(m=16, k=4, nb=8, n=20, iters=5, masked=True, quant=True,
             qrows=4, mesh_shape=(4, 2), seed=11),
        # ragged tail through the plain quantized wire (per-column scales)
        dict(m=12, k=3, nb=6, n=15, iters=4, masked=False, quant=True,
             qrows=0, mesh_shape=None, seed=12),
        # masked mesh artifact without quantization (mask rides the wire)
        dict(m=8, k=2, nb=4, n=10, iters=3, masked=True, quant=False,
             qrows=0, mesh_shape=(4, 2), seed=13),
    ],
    ids=["masked-quant-mesh-v4-rowblock", "quant-ragged-tail", "masked-mesh"],
)
def test_serving_composition_default_gate(case):
    from serving_cases import run_serving_composition

    run_serving_composition(**case)
