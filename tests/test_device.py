"""Device-generation tuning table and persistent autotune cache."""

import json
import os

import numpy as np
import pytest

from nmf_tpu.utils import autotune
from nmf_tpu.utils.device import GENERIC, ChipSpec, chip_spec, chip_spec_for


def test_known_device_kinds_resolve():
    v5e = chip_spec_for("TPU v5 lite")
    assert v5e.family == "v5e" and v5e.measured
    assert v5e.bf16_tflops == 197.0 and v5e.f32_tflops == 33.0
    assert v5e.block_m == 512 and v5e.block_n == 1024
    assert v5e.max_fused_k == 2048

    v5p = chip_spec_for("TPU v5p")
    assert v5p.family == "v5p" and not v5p.measured
    assert v5p.bf16_tflops == 459.0

    v6e = chip_spec_for("TPU v6 lite")
    assert v6e.family == "v6e" and v6e.bf16_tflops == 918.0

    v4 = chip_spec_for("TPU v4")
    assert v4.family == "v4"
    # conservative v3 row shrinks the VMEM/tile budgets
    v3 = chip_spec_for("TPU v3")
    assert v3.max_fused_k < v5e.max_fused_k
    assert v3.vmem_words_bf16 < v5e.vmem_words_bf16


def test_unknown_device_falls_back_to_generic():
    spec = chip_spec_for("SomeFutureAccelerator 9000")
    assert spec is GENERIC
    assert spec.bf16_tflops is None and spec.f32_tflops is None
    assert spec.peak_tflops("bfloat16") is None
    # but tiling/budget defaults are the conservative measured ones
    assert spec.block_m == 512 and spec.max_fused_k == 2048


def test_chip_spec_on_cpu_backend_is_generic():
    # tests run on the CPU backend (conftest): device_kind is not a TPU
    spec = chip_spec()
    assert isinstance(spec, ChipSpec)
    assert spec.family == "generic"


def test_supported_uses_device_ceiling(monkeypatch):
    from nmf_tpu.ops.pallas import fused_mu
    from nmf_tpu.utils import device as device_mod

    assert fused_mu.supported(2048)
    assert not fused_mu.supported(2049)
    small = ChipSpec(
        family="tiny", measured=False, bf16_tflops=None, f32_tflops=None,
        vmem_words_f32=100_000, vmem_words_bf16=200_000,
        block_m=128, block_n=256, max_fused_k=64,
    )
    monkeypatch.setattr(device_mod, "chip_spec", lambda device=None: small)
    monkeypatch.setattr("nmf_tpu.ops.pallas.fused_mu.chip_spec", lambda device=None: small)
    assert fused_mu.supported(64)
    assert not fused_mu.supported(65)


def test_rule_pick_uses_spec_thresholds(monkeypatch):
    from nmf_tpu.utils import device as device_mod

    # default thresholds: small rank -> pallas (bf16), big square -> jnp
    assert autotune.rule_pick(512, 30, 3445, "bfloat16") == "pallas"
    assert autotune.rule_pick(8192, 512, 8192, "bfloat16") == "jnp"
    # a spec that disables both fusion regimes must pick jnp for small k
    off = ChipSpec(
        family="off", measured=False, bf16_tflops=None, f32_tflops=None,
        vmem_words_f32=1_500_000, vmem_words_bf16=3_000_000,
        block_m=512, block_n=1024, max_fused_k=2048,
        fused_small_k=0, fused_single_tile_n=False,
    )
    monkeypatch.setattr("nmf_tpu.utils.autotune.chip_spec", lambda device=None: off)
    assert autotune.rule_pick(512, 30, 3445, "bfloat16") == "jnp"


@pytest.fixture
def disk_cache(tmp_path, monkeypatch):
    path = str(tmp_path / "autotune.json")
    monkeypatch.setenv(autotune._CACHE_ENV, path)
    autotune.clear_cache()
    yield path
    autotune.clear_cache()


def _big_cfg():
    from nmf_tpu.utils.config import SolveConfig

    return SolveConfig(backend="autotune")


def test_autotune_disk_cache_hit_skips_measurement(disk_cache, monkeypatch):
    """A prepopulated disk cache must answer without measuring (measuring
    costs minutes on remote-compile platforms)."""
    import jax

    m, k, n = 2048, 128, 1100  # above MIN_AUTOTUNE_ELEMENTS
    kind = jax.devices()[0].device_kind or "unknown"
    # the disk key carries the full dtype triple (matmul/x/state): winners
    # measured under different X/state storage must not collide
    key = autotune._disk_key(kind, "float32/float32/float32", m, k, n)
    with open(disk_cache, "w") as f:
        json.dump({key: "pallas"}, f)

    def boom(*a, **k):
        raise AssertionError("measured despite disk cache hit")

    monkeypatch.setattr(autotune, "_measure", boom)
    assert autotune.pick_backend(_big_cfg(), m, k, n) == "pallas"
    # and it is now memoized in-process too
    assert autotune.pick_backend(_big_cfg(), m, k, n) == "pallas"


def test_autotune_measurement_persists_to_disk(disk_cache, monkeypatch):
    m, k, n = 2048, 128, 1100
    times = iter([1.0, 2.0])  # pallas faster than jnp
    monkeypatch.setattr(autotune, "_measure", lambda *a, **k: next(times))
    assert autotune.pick_backend(_big_cfg(), m, k, n) == "pallas"
    data = json.load(open(disk_cache))
    assert list(data.values()) == ["pallas"]

    # a fresh process (cleared memory cache) reuses the stored winner
    autotune.clear_cache()
    monkeypatch.setattr(
        autotune, "_measure",
        lambda *a, **k: pytest.fail("re-measured despite disk cache"),
    )
    assert autotune.pick_backend(_big_cfg(), m, k, n) == "pallas"


def test_autotune_corrupt_cache_is_ignored(disk_cache, monkeypatch):
    with open(disk_cache, "w") as f:
        f.write("{not json")
    m, k, n = 2048, 128, 1100
    times = iter([2.0, 1.0])  # jnp faster
    monkeypatch.setattr(autotune, "_measure", lambda *a, **k: next(times))
    assert autotune.pick_backend(_big_cfg(), m, k, n) == "jnp"
    assert json.load(open(disk_cache))  # rewritten clean


def test_bench_fraction_of_peak_none_off_tpu():
    import bench

    assert bench.peak_tflops("bfloat16") is None  # CPU backend -> unknown


def test_hwparity_gate_quick_cpu():
    """The numerics gate itself: on CPU (jnp only) the oracle comparison
    must pass at quick dims for every precision policy."""
    import bench

    out = bench.run_check(quick=True)
    assert out["ok"], out
    # the full user-selectable numerics matrix (round 3), one row per cell,
    # plus the host/program quantizer bitwise-twin check (round 5 — the
    # on-device form of the contract that caught the 2026-08-19 TPU
    # boundary-code divergence)
    assert set(out["policies"]) == {
        "float32", "float32_fast", "bfloat16",
        "x_bfloat16", "x_int8", "x_int8_rowblocks", "state_bfloat16",
        "strict", "quant_twins",
    }
    for name, entry in out["policies"].items():
        if name == "strict":
            assert entry["cost_vs_padded_oracle_rel"] < 1e-3
        elif name == "quant_twins":
            assert entry["columns_bitwise"] and entry["rowblocks_bitwise"]
        else:
            assert entry["jnp_cost_vs_oracle_rel"] < 1e-3


def test_archive_metric_fields_and_rows(tmp_path):
    """Archive rows are aggregatable: new rows get structured
    workload/shape/k/dtype fields stamped from the metric name, and rows
    written before the fields existed are backfilled at read time, so
    archive_rows can group any cell (VERDICT r03 weak #2/#5 prerequisite)."""
    import bench

    assert bench.metric_fields(
        "mu_iters_per_sec[regression 4096x350 rank 128 bfloat16]"
    ) == {
        "workload": "regression", "shape": "4096x350", "k": 128,
        "dtype": "bfloat16", "x_dtype": "float32",
    }
    assert bench.metric_fields(
        "mu_iters_per_sec[flagship 10240x10240 rank 256 bfloat16 x-int8]"
    )["x_dtype"] == "int8"
    ts = bench.metric_fields(
        "tile_sparse_iters_per_sec[8192x8192 k=128 tile=128 occ=0.125 float32]"
    )
    assert ts == {
        "workload": "tile_sparse", "shape": "8192x8192", "k": 128,
        "tile": 128, "occupancy": 0.125, "dtype": "float32",
    }
    assert bench.metric_fields("nonsense") == {}
    assert bench.metric_fields("mu_iters_per_sec[weird]") == {}

    path = str(tmp_path / "archive.jsonl")
    # a pre-field (round <= 3 style) row, written raw
    import json as _json

    with open(path, "w") as f:
        f.write(_json.dumps({
            "metric": "mu_iters_per_sec[regression 4096x350 rank 128 bfloat16]",
            "backend": "jnp", "device_kind": "TPU v5 lite",
            "repeat_iters_per_sec": [100.0, 110.0], "ts": 1.0,
        }) + "\n")
    # a new row goes through archive_append -> fields stamped on disk
    bench.archive_append({
        "metric": "mu_iters_per_sec[regression 4096x350 rank 128 bfloat16]",
        "backend": "pallas", "device_kind": "TPU v5 lite",
        "repeat_iters_per_sec": [90.0, 95.0],
    }, path=path)
    with open(path) as f:
        lines = [_json.loads(l) for l in f]
    assert "workload" not in lines[0] and lines[1]["workload"] == "regression"
    assert lines[1]["k"] == 128 and lines[1]["dtype"] == "bfloat16"

    # grouping: BOTH rows (old backfilled + new stamped) match field filters
    rows = bench.archive_rows(path, workload="regression", dtype="bfloat16")
    assert len(rows) == 2
    assert {r["backend"] for r in rows} == {"jnp", "pallas"}
    # archive_stats still keys on the exact metric string
    st = bench.archive_stats(
        "mu_iters_per_sec[regression 4096x350 rank 128 bfloat16]",
        "jnp", "TPU v5 lite", path=path,
    )
    assert st["archive_sessions"] == 1 and st["archive_repeats"] == 2


def test_bench_serving_workload_cpu(tmp_path):
    """``bench.py --workload serving`` machinery on CPU: the .nmfz export/
    load/call loop measures, the quantized-input variant quarters the wire
    payload, the metric parses into structured fields, and serving repeats
    (columns/s) pool through archive_stats (VERDICT r03 #8)."""
    import bench

    stats = bench.run_serving(
        64, 8, 256, iters=3, block_n=128, dtype="float32", x_dtype="float32"
    )
    assert stats["cols_per_sec"] > 0
    assert len(stats["repeat_cols_per_sec"]) == 3
    assert stats["artifact_bytes"] > 0 and np.isfinite(stats["total_cost"])
    # ADVICE r04: each rep is paired with its own just-probed roofline, and
    # the probe spread is reported so a lucky probe can't set the headline
    assert len(stats["fraction_of_peak_per_rep"]) == 3
    assert len(stats["h2d_gbps_probes"]) == 3
    assert stats["fraction_of_peak"] == pytest.approx(
        float(np.median(stats["fraction_of_peak_per_rep"]))
    )

    q = bench.run_serving(
        64, 8, 256, iters=3, block_n=128, dtype="float32", x_dtype="int8"
    )
    # wire = X payload (quartered by int8 codes) + the f32 h0 blocks the
    # pipeline ships alongside every X block (k*n*4 bytes per call)
    h0_gb = 4 * 8 * 256 / 1e9
    x_gb = 64 * 256 * 4 / 1e9
    assert stats["wire_gb_per_call"] == pytest.approx(x_gb + h0_gb, rel=1e-6)
    assert q["wire_gb_per_call"] == pytest.approx(x_gb / 4 + h0_gb, rel=1e-6)

    metric = "serving_cols_per_sec[serving 2048x16384 rank 128 bfloat16 x-int8]"
    assert bench.metric_fields(metric) == {
        "workload": "serving", "shape": "2048x16384", "k": 128,
        "dtype": "bfloat16", "x_dtype": "int8",
    }
    path = str(tmp_path / "archive.jsonl")
    bench.archive_append(
        {"metric": metric, "backend": "serving", "device_kind": "cpu",
         "repeat_cols_per_sec": [100.0, 200.0]},
        path=path,
    )
    st = bench.archive_stats(metric, "serving", "cpu", path=path)
    assert st["archive_repeats"] == 2
    # serving medians are labeled in their own unit (columns/s), never as
    # iters/s — a consumer pooling across workloads must not misread units
    assert st["archive_median_cols_per_sec"] == 150.0
    assert "archive_median_iters_per_sec" not in st

    # a dtype-less 4-token metric must return {} cleanly (guard, not
    # swallowed IndexError)
    assert bench.metric_fields(
        "mu_iters_per_sec[flagship 10240x10240 rank 256]"
    ) == {}
