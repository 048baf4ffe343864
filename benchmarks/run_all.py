"""Run the full benchmark matrix (the BASELINE.json configs) on this chip.

    python benchmarks/run_all.py [--quick] [--out benchmarks/results.json]

Covers:
  1. regression dims (4096x350, K=128) — the repo's md5-test workload
  2. ISMIR source-separation dims (1025x4000, K=32) + convergence-to-1e-5 run
  3. north-star 10240x10240 K=256, fp32 vs bf16 precision study
  4. batched: vmap over 128 independent 513x2000 K=32 spectrograms
  5. pod-scale: validated by abstract lowering in tests/test_podscale.py
     (no pod on this host) — recorded here as a pointer.

Emits one JSON file plus a human-readable table on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# runnable as `python benchmarks/run_all.py` without installation; the
# benchmarks dir itself is importable too (shared tile_sparse_tune pieces)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# BEFORE any jax import: the env var is read at JAX init, and without it
# every re-run pays the full ~30-program remote-compile matrix again
# (10-60 s per program, degraded sessions 5+ min — CLAUDE.md)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def _sync(arrays) -> None:
    import jax

    for a in arrays:
        np.asarray(jax.device_get(a[(slice(0, 1),) * a.ndim]))


def time_steps(step, w, h, x, short, long, repeats=3):
    """Per-iteration seconds for each repeat (long/short differencing)."""
    import jax

    @jax.jit
    def run(w, h, x, n):
        return jax.lax.fori_loop(0, n, lambda _, wh: step(wh[0], wh[1], x), (w, h))

    _sync(run(w, h, x, 2))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(run(w, h, x, short))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        _sync(run(w, h, x, long))
        tl = time.perf_counter() - t0
        times.append((tl - ts) / (long - short))
    return times


def bench_shape(m, k, n, dtype, backend, short, long, workload=None):
    import jax.numpy as jnp

    from nmf_tpu.models.solver import resolve_step_fn
    from nmf_tpu.utils.config import Precision, SolveConfig

    rng = np.random.RandomState(0)
    x = jnp.asarray(np.maximum(rng.rand(m, n).astype(np.float32), 2.2204e-16))
    w = jnp.asarray(rng.rand(m, k).astype(np.float32))
    h = jnp.asarray(rng.rand(k, n).astype(np.float32))
    cfg = SolveConfig(precision=Precision(dtype), backend=backend, track_cost=False)
    step = resolve_step_fn(cfg)
    times = time_steps(step, w, h, x, short, long)
    flops = 8.0 * m * n * k
    from nmf_tpu.utils.device import chip_spec

    peak = chip_spec().peak_tflops(dtype)
    # same validity filter + MEDIAN headline policy as bench.run_single:
    # drop sync artifacts (non-positive differences) and above-peak repeats
    valid = [
        t for t in times
        if t > 0 and (peak is None or flops / t / 1e12 <= peak)
    ] or [t for t in times if t > 0]
    if not valid:
        # every repeat was a sync artifact: report the failure, archive
        # NOTHING (a negative rate would poison the >=3-session medians)
        return {
            "shape": f"{m}x{n} k={k}", "dtype": dtype, "backend": backend,
            "us_per_iter": float("nan"), "iters_per_sec": float("nan"),
            "tflops": float("nan"),
            "suspect": "all repeats non-positive (long/short sync artifact)",
        }
    per = float(np.median(valid))
    tflops = flops / per / 1e12
    row = {
        "shape": f"{m}x{n} k={k}",
        "dtype": dtype,
        "backend": backend,
        "us_per_iter": per * 1e6,
        "iters_per_sec": 1.0 / per,
        "tflops": tflops,
    }
    if peak is not None and tflops > peak:
        # physically impossible: the long/short differencing mis-measured
        # (this platform's block_until_ready is unreliable) — flag it so the
        # committed results never present bogus rows as evidence
        row["suspect"] = f"exceeds {peak:.0f} TF/s device peak; re-measure"
    if workload is not None and "suspect" not in row:
        # pool with bench.py's archive (identical metric naming) so rule
        # tables can be retuned from >=3 sessions of medians
        import jax

        import bench as _bench

        metric = f"mu_iters_per_sec[{workload} {m}x{n} rank {k} {dtype}]"
        _bench.archive_append(
            {
                "metric": metric,
                "backend": backend,
                "device_kind": jax.devices()[0].device_kind,
                "repeat_iters_per_sec": [round(1.0 / t, 3) for t in valid],
            }
        )
    return row


def bench_convergence(m, k, n, thresh, dtype="float32"):
    """ISMIR config 2: iterate to 1e-5 rel-change; report iters + seconds."""
    import nmf_tpu as nt

    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    # stage on device up front: ~17 MB of per-call H2D over the 0.01-0.05
    # GB/s link (2-3x variable) would otherwise swing the timed seconds
    # independently of solver speed
    x = jnp.asarray(rng.rand(m, n).astype(np.float32))
    w = jnp.asarray(rng.rand(m, k).astype(np.float32))
    h = jnp.asarray(rng.rand(k, n).astype(np.float32))
    _sync([x, w, h])
    cfg = nt.SolveConfig(
        max_iter=100_000, thresh=thresh, check_every=25,
        precision=nt.Precision(dtype),
    )
    warm = nt.solve(x, w, h, cfg)  # warm compile
    _sync([warm.w])  # ...and SYNC it (block_until_ready no-ops here)
    t0 = time.perf_counter()
    res = nt.solve(x, w, h, cfg)
    it = int(res.iterations)
    cost = float(res.cost)
    dt = time.perf_counter() - t0
    return {
        "shape": f"{m}x{n} k={k}",
        "thresh": thresh,
        "iters_to_converge": it,
        "seconds": dt,
        "final_cost": cost,
        "converged": bool(res.converged),
    }


def bench_batched(batch, m, k, n, iters, dtype="bfloat16"):
    import jax

    import nmf_tpu as nt

    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    # stage on device up front: H2D of ~500 MB through the tunnel must not
    # pollute the compute timing
    xs = jnp.asarray(rng.rand(batch, m, n).astype(np.float32))
    ws = jnp.asarray(rng.rand(batch, m, k).astype(np.float32))
    hs = jnp.asarray(rng.rand(batch, k, n).astype(np.float32))
    _sync([xs, ws, hs])
    cfg = nt.SolveConfig(
        max_iter=iters, track_cost=False, precision=nt.Precision(dtype)
    )
    res = nt.solve_batched(xs, ws, hs, cfg)
    _sync([res.w])
    t0 = time.perf_counter()
    res = nt.solve_batched(xs, ws, hs, cfg)
    _sync([res.w])
    dt = time.perf_counter() - t0
    problem_iters_per_sec = batch * iters / dt
    return {
        "batch": batch,
        "shape": f"{m}x{n} k={k}",
        "dtype": dtype,
        "iters": iters,
        "seconds": dt,
        "problem_iters_per_sec": problem_iters_per_sec,
        "tflops": 8.0 * m * n * k * problem_iters_per_sec / 1e12,
    }


def bench_restarts(r, m, k, n, dtype="bfloat16", long=400):
    """Model selection: R restarts in ONE compiled batch (shared X) vs R
    sequential solves, straight warmed wall timing (see _rate).

    Use SMALL member dims: batching one program over R members is a
    structural win when a single member under-fills the chip or per-call
    dispatch dominates (every launch is a tunnel RPC here).  At members
    >= ~2048^2 one problem already keeps the MXU busy and the gap narrows
    (measured 3.3x at 8x 2048^2 vs 9.3x at 16x 512x1024 on v5e)."""
    import jax
    import jax.numpy as jnp

    import nmf_tpu as nt

    rng = np.random.RandomState(0)
    x_np = rng.rand(m, n).astype(np.float32)
    x_dev = jnp.asarray(x_np)
    inits = [nt.scaled_random_init(x_np, k, seed=s) for s in range(r)]
    # everything staged on device up front: per-call H2D on this link is
    # slow AND 2-3x variable, which would swamp the differencing
    w0s = jnp.asarray(np.stack([w for w, _ in inits]))
    h0s = jnp.asarray(np.stack([h for _, h in inits]))
    _sync([x_dev, w0s, h0s])

    def _rate(run):
        # straight wall timing (warmed, best of 3): dispatch overhead is
        # PART of what the sequential loop pays per member, so it belongs
        # in the measurement, and every input is device-resident so no H2D
        # rides the timed region.  (Differencing is useless here — at
        # small member dims the compute delta is milliseconds while this
        # platform's per-dispatch noise is tens of milliseconds.)
        run(long)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run(long)
            best = min(best, time.perf_counter() - t0)
        return long / best  # ensemble iterations per second

    def run_batched(iters):
        cfg = nt.SolveConfig(
            max_iter=iters, check_every=10**9, precision=nt.Precision(dtype)
        )
        res = nt.solve_restarts(x_dev, w0s=w0s, h0s=h0s, config=cfg)
        _sync([res.results.w])

    def run_sequential(iters):
        cfg = nt.SolveConfig(
            max_iter=iters, check_every=10**9, precision=nt.Precision(dtype)
        )
        outs = [
            nt.solve(x_dev, w0s[i], h0s[i], cfg) for i in range(r)
        ]
        _sync([o.w for o in outs])

    # _rate returns ensemble-iterations/s (each counts all R members once)
    batched_ips = _rate(run_batched) * r       # -> problem-iters/s
    sequential_ips = _rate(run_sequential) * r
    row = {
        "restarts": r,
        "shape": f"{m}x{n} k={k}",
        "dtype": dtype,
        "batched_problem_iters_per_sec": batched_ips,
        "sequential_problem_iters_per_sec": sequential_ips,
        "speedup_vs_sequential": batched_ips / sequential_ips,
    }
    if row["speedup_vs_sequential"] > 1.5 * r:
        row["suspect"] = f"speedup exceeds 1.5x the member count {r}; re-measure"
    return row


def bench_transform_ooc(m, k, n, iters=50, block_n=2048):
    """Serving throughput: stream-once H-only inference against a fixed W.

    Unlike solve_out_of_core (one X stream per ITERATION, link-bound) the
    transform visits each block once, so the metric is columns/second of
    end-to-end wall time — transfers, per-block solves (``iters`` H
    updates), and the H download all included."""
    import jax

    import nmf_tpu as nt

    rng = np.random.RandomState(0)
    x = rng.rand(m, n).astype(np.float32)
    w = np.maximum(rng.rand(m, k).astype(np.float32), np.float32(2.2204e-16))
    cfg = nt.SolveConfig(
        max_iter=iters, check_every=iters,
        precision=nt.Precision("bfloat16"),
    )
    # warm the per-width programs, then time end-to-end (this IS the
    # serving path: host source -> device solves -> host H)
    nt.transform_out_of_core(x[:, : 2 * block_n], w, config=cfg, block_n=block_n)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res = nt.transform_out_of_core(x, w, config=cfg, block_n=block_n)
        best = min(best, time.perf_counter() - t0)
    return {
        "shape": f"{m}x{n} k={k}",
        "dtype": "bfloat16",
        "iters_per_block": iters,
        "block_n": block_n,
        "seconds": best,
        "columns_per_sec": n / best,
        "total_cost": float(res.cost),
    }


def bench_serving_artifact(m, k, n, iters=50, block_n=2048):
    """AOT serving: `.nmfz` artifact throughput on the same workload as
    bench_transform_ooc, so the two rows compare directly.

    The artifact path pays ZERO tracing at serve time (the program is
    deserialized StableHLO) — the row records export/load/first-dispatch
    costs separately from the steady-state columns/second.  The exported
    program is the portable jnp path (serving.py:110-127), while the live
    transform row may pick a fused backend; compare accordingly."""
    import tempfile

    import nmf_tpu as nt
    from nmf_tpu.serving import load_transform, save_transform

    rng = np.random.RandomState(0)
    x = rng.rand(m, n).astype(np.float32)
    w = np.maximum(rng.rand(m, k).astype(np.float32), np.float32(2.2204e-16))
    cfg = nt.SolveConfig(
        max_iter=iters, check_every=iters, precision=nt.Precision("bfloat16")
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "model.nmfz")
        t0 = time.perf_counter()
        save_transform(path, w, block_n, cfg)
        export_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        t = load_transform(path)
        load_s = time.perf_counter() - t0
        artifact_bytes = os.path.getsize(path)
        # first dispatch compiles the deserialized program once; steady-state
        # calls reuse the executable (jit wrapper caches it)
        t0 = time.perf_counter()
        t(x[:, : block_n])
        first_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            res = t(x)
            best = min(best, time.perf_counter() - t0)
    return {
        "shape": f"{m}x{n} k={k}",
        "dtype": "bfloat16",
        "iters_per_block": iters,
        "block_n": block_n,
        "artifact_bytes": artifact_bytes,
        "export_seconds": export_s,
        "load_seconds": load_s,
        "first_dispatch_seconds": first_s,
        "seconds": best,
        "columns_per_sec": n / best,
        "total_cost": float(res.cost),
    }


def bench_serving_quantized_input(m, k, n, iters=50, block_n=2048):
    """VERDICT-r03 weak #6 measurement: int8 serving with HOST quantization
    ((codes, scales) program inputs, format v3) vs in-program quantization
    (f32 X over the link) — identical solves, only the H2D payload differs
    (~4x: uint8 codes vs f32).  On this host's measured 0.01-0.05 GB/s link
    the transfer dominates serve time, so the row decides whether the
    quantized-input artifact is the serving default for int8 configs."""
    import tempfile

    import nmf_tpu as nt
    from nmf_tpu.serving import load_transform, save_transform

    rng = np.random.RandomState(0)
    x = rng.rand(m, n).astype(np.float32)
    w = np.maximum(rng.rand(m, k).astype(np.float32), np.float32(2.2204e-16))
    cfg = nt.SolveConfig(
        max_iter=iters, check_every=iters,
        precision=nt.Precision(x_dtype="int8"),
    )
    out = {
        "shape": f"{m}x{n} k={k}",
        "dtype": "int8-x",
        "iters_per_block": iters,
        "block_n": block_n,
    }
    hs = {}
    with tempfile.TemporaryDirectory() as d:
        for label, quant in (("in_program", False), ("quantized_input", True)):
            path = os.path.join(d, f"{label}.nmfz")
            save_transform(path, w, block_n, cfg, quantized_input=quant)
            t = load_transform(path)
            t(x[:, :block_n])  # warm (compile + first-dispatch stall)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                res = t(x)
                best = min(best, time.perf_counter() - t0)
            hs[label] = res.h
            out[label] = {
                "seconds": best,
                "columns_per_sec": n / best,
                "artifact_bytes": os.path.getsize(path),
            }
    out["bit_identical"] = bool(
        np.array_equal(hs["in_program"], hs["quantized_input"])
    )
    out["speedup_quantized_vs_in_program"] = (
        out["in_program"]["seconds"] / out["quantized_input"]["seconds"]
    )
    return out


def precision_study(m, k, n, iters=100):
    """Config 3: fp32 vs bf16-matmul/fp32-accum — speed and cost agreement."""
    import nmf_tpu as nt

    rng = np.random.RandomState(0)
    x = rng.rand(m, n).astype(np.float32)
    w = rng.rand(m, k).astype(np.float32)
    h = rng.rand(k, n).astype(np.float32)
    out = {}
    for dtype in ("float32", "float32_fast", "bfloat16"):
        cfg = nt.SolveConfig(
            max_iter=iters, check_every=iters, precision=nt.Precision(dtype)
        )
        res = nt.solve(x, w, h, cfg)
        out[dtype] = float(res.cost)
    out["rel_cost_gap"] = abs(out["bfloat16"] - out["float32"]) / out["float32"]
    out["rel_cost_gap_fast"] = abs(out["float32_fast"] - out["float32"]) / out["float32"]
    return out


def bench_tile_sparse(m, k, n, tile=128, occ_frac=0.08, seed=0):
    """Clustered-sparse X: tiled block-sparse solver vs the dense hot path.

    Iteration-rate ratio should track the occupancy advantage (compute is
    proportional to occupied tiles; the dense path always pays M x N).
    """
    import jax

    from nmf_tpu.models import sparse_tiled as st
    from nmf_tpu.models.solver import solve
    from nmf_tpu.utils.config import SolveConfig

    # ONE generator for both harnesses (tile_sparse_tune owns it): two
    # copies had already begun to drift in their timing guards
    from tile_sparse_tune import build_problem

    x, w, h = build_problem(m, k, n, tile, occ_frac, seed=seed)
    tx = st.tiles_from_dense(x, tile=(tile, tile))
    occupancy, occupied = tx.occupancy(), int(tx.tiles.shape[0])
    eps = np.float32(2.2204e-16)
    # X device-resident up front: this host link runs at ~0.01-0.05 GB/s
    # with 2-3x variance, so per-call uploads of the 256 MB X would swamp
    # (and randomize) the iteration timing.  W/H stay host-side — they are
    # donated per call, small, and their upload cost cancels in the
    # long/short differencing.
    from nmf_tpu.models.sparse_tiled import TileSparseX, _pad_tiles_np

    tls, trs, tcs = _pad_tiles_np(
        np.asarray(tx.tiles), np.asarray(tx.rows), np.asarray(tx.cols), 64
    )
    tx = TileSparseX(
        tiles=jax.device_put(tls),
        rows=jax.device_put(trs),
        cols=jax.device_put(tcs),
        shape=tx.shape,
    )
    x_dev = jax.device_put(np.maximum(x, eps))
    w_dev = jax.device_put(np.maximum(w, eps))
    h_dev = jax.device_put(np.maximum(h, eps))

    def rate(fn, short, long):
        def run(iters):
            cfg = SolveConfig(max_iter=iters, check_every=10**9, track_cost=False)
            # device-side copies per call: the solvers donate W/H, and a
            # per-call HOST upload would dominate the timing on this link
            r = fn(w_dev + 0, h_dev + 0, cfg)
            _sync((r.w,))
            return r

        # warm BOTH exact configs before timing (the jitted program caches
        # key on the config, and first dispatch stalls on this platform)
        run(short)
        run(long)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); run(short); ts = time.perf_counter() - t0
            t0 = time.perf_counter(); run(long); tl = time.perf_counter() - t0
            if tl > ts:  # a tl <= ts round is a sync artifact, not a rate
                best = min(best, (tl - ts) / (long - short))
        return 1.0 / best if best != float("inf") else float("nan")

    tiled_ips = rate(
        lambda w_, h_, c: st.solve_sparse_tiled(tx, w_, h_, c), 200, 1200
    )
    dense_ips = rate(
        lambda w_, h_, c: solve(x_dev, w_, h_, c, clamp_inputs=False), 200, 1200
    )
    row = {
        "shape": f"{m}x{n} k={k}",
        "tile": tile,
        "occupancy": occupancy,
        "occupied_tiles": occupied,
        "tiled_iters_per_sec": tiled_ips,
        "dense_iters_per_sec": dense_ips,
        "speedup_vs_dense": tiled_ips / dense_ips,
    }
    ideal = 1.0 / max(occupancy, 1e-9)
    if row["speedup_vs_dense"] > ideal * 1.5:
        row["suspect"] = (
            f"speedup exceeds 1.5x the occupancy bound {ideal:.1f}x; re-measure"
        )
    return row


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="benchmarks/results.json")
    ap.add_argument("--quick", action="store_true", help="smaller flagship timings")
    args = ap.parse_args(argv)

    import jax

    results = {"device": str(jax.devices()[0]), "configs": {}}
    cfgs = results["configs"]

    print("== speed matrix ==", file=sys.stderr)
    flag_iters = (10, 40) if args.quick else (20, 120)
    for label, (m, k, n, s, l, wl) in {
        "regression_4096x350_k128": (4096, 128, 350, 500, 2500, "regression"),
        "paper_512x3445_k30": (512, 30, 3445, 500, 2500, "paper"),
        "ismir_1025x4000_k32": (1025, 32, 4000, 500, 2500, "ismir"),
        "flagship_10240x10240_k256": (10240, 256, 10240, *flag_iters, "flagship"),
    }.items():
        rows = []
        for dtype in ("bfloat16", "float32", "float32_fast"):
            for backend in ("pallas", "jnp"):
                r = bench_shape(m, k, n, dtype, backend, s, l, workload=wl)
                rows.append(r)
                print(
                    f"{label:28s} {dtype:9s} {backend:6s} "
                    f"{r['us_per_iter']:10.1f} us/it {r['tflops']:8.2f} TF/s",
                    file=sys.stderr,
                )
        cfgs[label] = rows

    print("== convergence (config 2) ==", file=sys.stderr)
    conv = bench_convergence(1025, 32, 4000, 1e-5)
    cfgs["ismir_convergence_1e-5"] = conv
    print(json.dumps(conv), file=sys.stderr)

    print("== accelerated convergence (config 2, accelerate=True) ==", file=sys.stderr)
    import bench as _bench

    acc = _bench.run_converge("bfloat16", "auto")
    cfgs["ismir_converge_accel_bf16"] = acc
    print(json.dumps(acc), file=sys.stderr)

    print("== precision study (config 3) ==", file=sys.stderr)
    ps = precision_study(10240, 256, 10240, iters=60 if args.quick else 100)
    cfgs["precision_study_10240_k256"] = ps
    print(json.dumps(ps), file=sys.stderr)

    print("== batched (config 4) ==", file=sys.stderr)
    bt = bench_batched(128, 513, 32, 2000, iters=50 if args.quick else 100)
    cfgs["batched_128x_513x2000_k32"] = bt
    print(json.dumps(bt), file=sys.stderr)

    print("== model selection (16 restarts, one batch) ==", file=sys.stderr)
    rs = bench_restarts(16, 512, 32, 1024)
    cfgs["restarts_16x_512x1024_k32"] = rs
    print(json.dumps(rs), file=sys.stderr)

    print("== out-of-core streaming ==", file=sys.stderr)
    import bench as bench_mod

    ooc = {}
    for x_dtype in ("float32", "int8"):
        r = bench_mod.run_oocore(
            2048, 128, 8192, iters=3, dtype="bfloat16", x_dtype=x_dtype
        )
        ooc[x_dtype] = r
        print(
            f"oocore x_dtype={x_dtype:8s} {r['ms_per_iter']:8.0f} ms/it  "
            f"{r['fraction_of_peak']:.2f} of H2D roofline  "
            f"({r['streamed_gb_per_iter']:.3f} GB/iter @ {r['h2d_gbps']:.3f} GB/s)",
            file=sys.stderr,
        )
    cfgs["oocore_2048x8192_k128"] = ooc

    print("== out-of-core transform (serving) ==", file=sys.stderr)
    tro = bench_transform_ooc(2048, 128, 16384)
    cfgs["transform_ooc_2048x16384_k128"] = tro
    print(json.dumps(tro), file=sys.stderr)

    print("== serving artifact (.nmfz, same workload) ==", file=sys.stderr)
    srv = bench_serving_artifact(2048, 128, 16384)
    cfgs["serving_artifact_2048x16384_k128"] = srv
    print(json.dumps(srv), file=sys.stderr)

    print("== serving int8: quantized-input vs in-program ==", file=sys.stderr)
    sqi = bench_serving_quantized_input(2048, 128, 16384)
    cfgs["serving_quantized_input_2048x16384_k128"] = sqi
    print(json.dumps(sqi), file=sys.stderr)

    print("== tile-sparse (clustered 8% occupancy) ==", file=sys.stderr)
    tsrow = bench_tile_sparse(8192, 128, 8192)
    cfgs["tile_sparse_8192x8192_k128"] = tsrow
    print(json.dumps(tsrow), file=sys.stderr)

    cfgs["podscale_config5"] = {
        "note": "validated by abstract lowering over an 8-device mesh "
        "(tests/test_podscale.py); no pod attached to this host"
    }

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
