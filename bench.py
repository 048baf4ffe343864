"""Benchmark CLI: MU-iterations/sec on the north-star workload.

Prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary workload (BASELINE.json north star): 10k x 10k dense X, rank 256,
bf16 MXU inputs / f32 accumulation, fused Pallas step, fixed iterations
(track_cost off — matching the reference's pure graph-replay loop,
nmf.cu:113-115, which computes no cost either).

Timing methodology: this environment's device platform does not block in
``jax.block_until_ready`` reliably, so every measurement forces completion by
fetching a scalar slice of the results, and the per-iteration time is the
difference between a long and a short run (cancelling dispatch/fetch
constants).

Baselines (the reference repo publishes no numbers beyond its paper):
  * paper workload (512x3445, K=30): the reference CUDA ran 200 iterations in
    0.6 s on a GTX 280 (nmf_ismir_2009.pdf p.1 abstract, p.5-6 s5.3.3)
    -> 333.33 iters/s, measured.  vs_baseline on this workload is a direct
    like-for-like implementation comparison (different hardware, same task).
  * other workloads: derived from the reference's sustained ~141 GFLOP/s
    (423 MFLOP/iter at 333 iters/s): baseline_iters_per_sec =
    141e9 / flops_per_iter.  The extras report fraction-of-peak so the
    efficiency comparison on equal-FLOP hardware (reference: 141/622 = 22.7%
    of its GPU's peak) can be read directly.

Usage:
    python bench.py                       # north-star 10k x 10k rank-256
    python bench.py --workload paper      # 512x3445 rank-30 (ISMIR 2009)
    python bench.py --workload regression # 4096x350 rank-128 (repo fixtures)
    python bench.py --dtype float32 --backend jnp
    python bench.py --workload serving [--x-dtype int8]  # .nmfz throughput
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# Compiles on this platform go through a remote service (10-60 s each);
# a persistent cache makes repeat bench runs start in seconds.
try:
    os.makedirs(os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"), exist_ok=True)
except OSError:
    pass


WORKLOADS = {
    # name: (M, K, N, short_iters, long_iters)
    "flagship": (10_240, 256, 10_240, 20, 120),
    "paper": (512, 30, 3445, 500, 3000),
    "regression": (4096, 128, 350, 500, 3000),
    "ismir": (1025, 32, 4000, 500, 3000),  # BASELINE.json config 2 dims
}

# Reference CUDA sustained throughput derived from the paper (see docstring).
REFERENCE_GFLOPS = 141.0
REFERENCE_PAPER_IPS = 200 / 0.6  # measured: 200 iters in 0.6 s


def peak_tflops(dtype: str):
    """Roofline peak for the current device generation, or None if unknown.

    Per-generation values (and the v5e-measured effective f32-HIGHEST peak)
    live in nmf_tpu/utils/device.py.
    """
    from nmf_tpu.utils.device import chip_spec

    return chip_spec().peak_tflops(dtype)


def flops_per_iter(m: int, k: int, n: int) -> float:
    """4 GEMMs per MU iteration (2 per half-update), 2*M*N*K each."""
    return 8.0 * m * n * k


def _sync(arrays) -> None:
    for a in arrays:
        import jax

        np.asarray(jax.device_get(a[:1, :1]))


def run_single(m, k, n, short, long, dtype, backend, x_dtype="float32") -> dict:
    import jax
    import jax.numpy as jnp

    from nmf_tpu.models.solver import resolve_step_fn
    from nmf_tpu.utils.config import Precision, SolveConfig

    cfg = SolveConfig(
        precision=Precision(matmul_dtype=dtype, x_dtype=x_dtype),
        backend=backend,
        track_cost=False,
    )
    step = resolve_step_fn(cfg)
    eps = np.float32(2.2204e-16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(np.maximum(rng.rand(m, n).astype(np.float32), eps))
    if x_dtype == "int8":
        from nmf_tpu.ops.quant import quantize_columns

        x = quantize_columns(x, float(eps))
    else:
        x = x.astype(jnp.dtype(x_dtype))
    w = jnp.asarray(rng.rand(m, k).astype(np.float32))
    h = jnp.asarray(rng.rand(k, n).astype(np.float32))

    @jax.jit
    def run(w, h, x, n_steps):
        return jax.lax.fori_loop(
            0, n_steps, lambda _, wh: step(wh[0], wh[1], x), (w, h)
        )

    def _measure(rounds):
        times = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            _sync(run(w, h, x, short))
            t_short = time.perf_counter() - t0
            t0 = time.perf_counter()
            _sync(run(w, h, x, long))
            t_long = time.perf_counter() - t0
            times.append((t_long - t_short) / (long - short))
        return times

    _sync(run(w, h, x, 3))  # compile + warm
    times = _measure(3)
    peak = peak_tflops(dtype)

    def _tflops(per):
        return flops_per_iter(m, k, n) / per / 1e12

    # a result above the device peak is physically impossible — the
    # long/short differencing mis-measured (block_until_ready is unreliable
    # on this platform); re-measure and flag if it still exceeds the peak
    # rather than reporting bogus numbers
    suspect = None
    if peak is not None and _tflops(min(times)) > peak:
        times += _measure(3)
        if _tflops(min(times)) > peak:
            suspect = f"exceeds {peak:.0f} TF/s device peak; timing unreliable"
    # keep only physically-possible repeats for the summary stats: positive
    # (a t_long <= t_short difference is a sync artifact that would turn the
    # median/best/archive negative) and at-or-below the device peak
    valid = [
        t for t in times if t > 0 and (peak is None or _tflops(t) <= peak)
    ] or [t for t in times if t > 0]
    if not valid:
        # every repeat was a sync artifact (t_long <= t_short): report the
        # failure loudly with NO numbers — negative rates must never reach
        # the cross-session archive (repeat list stays empty on purpose)
        return {
            "ms_per_iter": float("nan"),
            "iters_per_sec": float("nan"),
            "best_iters_per_sec": float("nan"),
            "repeat_iters_per_sec": [],
            "achieved_tflops": float("nan"),
            "fraction_of_peak": None,
            "suspect": "all repeats non-positive (long/short sync artifact)",
        }
    med = float(np.median(valid))
    tflops = _tflops(med)
    out = {
        # headline stats are the session MEDIAN (best-of flatters on a
        # shared chip with +-2x noise; see benchmarks/RESULTS.md)
        "ms_per_iter": med * 1e3,
        "iters_per_sec": 1.0 / med,
        "best_iters_per_sec": 1.0 / min(valid),
        "repeat_iters_per_sec": [1.0 / t for t in valid],
        "achieved_tflops": tflops,
        "fraction_of_peak": (tflops / peak) if peak else None,
    }
    if suspect:
        out["suspect"] = suspect
    return out


def measure_h2d_bw(blk: np.ndarray) -> float:
    """H2D bandwidth (bytes/s) for a representative wire block.

    By SIZE DIFFERENCING: each probe pays the same dispatch + scalar-fetch
    latency (high on this link — CLAUDE.md), so timing one transfer mixes
    latency into bandwidth; the big-minus-small difference isolates the
    payload term.  Two rounds, keep the best (the link fluctuates 2-3x
    minute to minute)."""
    import time as _time

    import jax

    dev = jax.devices()[0]
    small = np.ascontiguousarray(blk[:, : max(1, blk.shape[1] // 8)])

    def _put_fetch(arr):
        t0 = _time.perf_counter()
        a = jax.device_put(arr, dev)
        np.asarray(jax.device_get(a[:1, :1]))
        return _time.perf_counter() - t0

    _put_fetch(small), _put_fetch(blk)  # warm both paths
    bw = 0.0
    for _ in range(2):
        dt = _put_fetch(blk) - _put_fetch(small)
        if dt > 0:
            bw = max(bw, (blk.nbytes - small.nbytes) / dt)
    if bw == 0.0:  # differencing degenerated: single-transfer estimate
        bw = blk.nbytes / _put_fetch(blk)
    return bw


def run_oocore(m, k, n, iters, dtype, x_dtype) -> dict:
    """Out-of-core streaming bench: iteration rate vs the H2D roofline.

    Out-of-core iteration time is lower-bounded by bytes(X)/H2D_bandwidth
    (X crosses the host link once per iteration); the quality metric is the
    fraction of that roofline achieved, i.e. how completely double-buffered
    compute hides behind the transfer.
    """
    import time as _time

    import jax

    from nmf_tpu.models.streaming import pick_block_n, solve_out_of_core
    from nmf_tpu.utils.config import Precision, SolveConfig

    rng = np.random.RandomState(0)
    x = np.maximum(rng.rand(m, n).astype(np.float32), np.float32(2.2204e-16))
    w = rng.rand(m, k).astype(np.float32)
    h = rng.rand(k, n).astype(np.float32)
    iters_cfg = SolveConfig(
        precision=Precision(matmul_dtype=dtype, x_dtype=x_dtype),
        track_cost=False,
        max_iter=iters,
    )
    bn = pick_block_n(m, n)
    # the raw H2D roofline is probed with the exact wire payload — but
    # BRACKETING the timed run (below), not here: the link fluctuates 2-3x
    # minute to minute and the warm runs take long enough for it to drift
    # (ADVICE r04, same pairing as run_serving)
    blk = x[:, :bn]
    if x_dtype == "int8":
        from nmf_tpu.ops.quant import quantize_columns_np

        blk = quantize_columns_np(blk, 2.2204e-16)[0]
    elif x_dtype == "bfloat16":
        import ml_dtypes

        blk = blk.astype(ml_dtypes.bfloat16)

    # compile + warm TWICE with the IDENTICAL config (the per-block jits are
    # keyed by it, and this platform shows a one-off first-dispatch stall per
    # program that must not land in the timed run).  SYNC each warm run —
    # with track_cost=False the streamed loop performs no host fetch of its
    # own, so unsynced warms would drain inside the timed window.
    for _ in range(2):
        r_warm = solve_out_of_core(x, w, h, iters_cfg, block_n=bn)
        np.asarray(jax.device_get(r_warm.w[:1, :1]))
    bw_before = measure_h2d_bw(blk)
    t0 = _time.perf_counter()
    res = solve_out_of_core(x, w, h, iters_cfg, block_n=bn)
    np.asarray(jax.device_get(res.w[:1, :1]))
    per_iter = (_time.perf_counter() - t0) / iters
    bw_after = measure_h2d_bw(blk)
    h2d_bw = float(np.median([bw_before, bw_after]))
    wire_bytes = x.nbytes // {"float32": 1, "bfloat16": 2, "int8": 4}[x_dtype]
    roofline = wire_bytes / h2d_bw  # seconds/iteration at pure-transfer speed
    return {
        "ms_per_iter": per_iter * 1e3,
        "iters_per_sec": 1.0 / per_iter,
        "achieved_tflops": flops_per_iter(m, k, n) / per_iter / 1e12,
        "fraction_of_peak": roofline / per_iter,  # of the H2D roofline
        "h2d_gbps": h2d_bw / 1e9,
        "h2d_gbps_probes": [bw_before / 1e9, bw_after / 1e9],
        "streamed_gb_per_iter": wire_bytes / 1e9,
    }


def run_serving(m, k, n, iters, block_n, dtype, x_dtype) -> dict:
    """AOT ``.nmfz`` serving throughput vs the H2D roofline.

    Serve time on this host is dominated by shipping X over the measured
    0.01-0.05 GB/s link (CLAUDE.md), so the quality metric is the fraction
    of the pure-transfer roofline achieved (wire bytes of one call / H2D
    bandwidth, over the measured wall per call).  ``x_dtype="int8"`` serves
    the quantized-input artifact (format v3: host-quantized (codes, scales)
    program inputs, ~4x less wire traffic); float32 ships X raw.  The
    served program is the portable jnp path (serving.py), deserialized
    StableHLO — zero tracing at serve time.  This is the reference's own
    motivation measured end to end: feeding a fixed pipeline faster than
    real time (nmf_ismir_2009.pdf p.1 abstract, 33x real-time).
    """
    import tempfile

    from nmf_tpu.ops.quant import quantize_columns_np
    from nmf_tpu.serving import load_transform, save_transform
    from nmf_tpu.utils.config import Precision, SolveConfig

    rng = np.random.RandomState(0)
    eps = np.float32(2.2204e-16)
    x = np.maximum(rng.rand(m, n).astype(np.float32), eps)
    w = np.maximum(rng.rand(m, k).astype(np.float32), eps)
    quant = x_dtype == "int8"
    wire_blk = (
        quantize_columns_np(x[:, :block_n], float(eps))[0]
        if quant else x[:, :block_n]
    )
    cfg = SolveConfig(
        max_iter=iters, check_every=iters,
        precision=Precision(matmul_dtype=dtype, x_dtype=x_dtype),
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "model.nmfz")
        t0 = time.perf_counter()
        save_transform(path, w, block_n, cfg, quantized_input=quant)
        export_s = time.perf_counter() - t0
        t = load_transform(path)
        artifact_bytes = os.path.getsize(path)
        # first dispatch compiles the deserialized program once and pays
        # this platform's one-off first-dispatch stall; report it apart
        # from the steady state
        t0 = time.perf_counter()
        t(x[:, :block_n])
        first_s = time.perf_counter() - t0
        # warm the FULL-width call once (prefetch pipeline, every block);
        # __call__ drains H to host, so the warm is synced by construction
        t(x)
        # probe the link IMMEDIATELY BEFORE each timed rep and pair the rep
        # with its own roofline: the link fluctuates 2-3x minute to minute
        # (CLAUDE.md), so a single probe taken at a different moment than
        # the serves makes fraction_of_peak swing or exceed 1.0 across
        # sessions (ADVICE r04) — the paired quotient cancels the drift.
        reps, bws = [], []
        for _ in range(3):
            bws.append(measure_h2d_bw(wire_blk))
            t0 = time.perf_counter()
            res = t(x)
            reps.append(time.perf_counter() - t0)
    # roofline: wire bytes of one full call at the measured link bandwidth.
    # The call ships the X payload (uint8 codes quarter the f32 width;
    # per-column scales are noise) PLUS an f32 h0 block per X block
    # (serving.ServingTransform._place_block) — at k=128 that is ~11% of
    # the f32 wire and ~20% of the int8 wire; omitting it would UNDERSTATE
    # fraction_of_peak (a smaller wire estimate lowers the roofline
    # numerator), and by more for int8.
    wire_bytes = x.nbytes // (4 if quant else 1) + 4 * k * n
    # per-rep fraction = (wire_bytes / bw_probed_just_before) / rep_wall;
    # the session headline is the MEDIAN of those paired quotients, and the
    # probe spread is reported so a retune can reject a lucky-probe session
    fractions = [(wire_bytes / bw) / r for bw, r in zip(bws, reps)]
    med = float(np.median(reps))
    return {
        "seconds_per_call": med,
        "cols_per_sec": n / med,
        "best_cols_per_sec": n / min(reps),
        "repeat_cols_per_sec": [n / r for r in reps],
        "fraction_of_peak": float(np.median(fractions)),
        "fraction_of_peak_per_rep": fractions,
        "h2d_gbps": float(np.median(bws)) / 1e9,
        "h2d_gbps_probes": [b / 1e9 for b in bws],
        "wire_gb_per_call": wire_bytes / 1e9,
        "artifact_bytes": artifact_bytes,
        "export_seconds": export_s,
        "first_dispatch_seconds": first_s,
        "total_cost": float(np.sum(np.asarray(res.block_costs))),
    }


ARCHIVE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "benchmarks", "archive.jsonl"
)


def metric_fields(metric: str) -> dict:
    """Structured ``workload/shape/k/dtype/x_dtype`` fields parsed from a
    metric name, e.g. ``mu_iters_per_sec[flagship 10240x10240 rank 256
    bfloat16 x-int8]`` or ``tile_sparse_iters_per_sec[8192x8192 k=128
    tile=128 occ=0.125 float32]``.

    ``archive_append`` stamps these onto every new row so ``archive_stats``
    can group/filter cells without string surgery; rows archived before the
    fields existed (rounds <= 3 carry only metric/backend/ts) are backfilled
    at read time through this same parser, so the whole archive aggregates
    uniformly.  Returns {} for names it does not recognize.
    """
    lb, rb = metric.find("["), metric.rfind("]")
    if lb < 0 or rb <= lb:
        return {}
    kind = metric[:lb]
    toks = metric[lb + 1 : rb].split()
    out: dict = {}
    try:
        if (
            kind in ("mu_iters_per_sec", "serving_cols_per_sec")
            # >= 5: toks[4] (dtype) is read below — a 4-token name would
            # IndexError into the blanket except and lose ALL its fields
            and len(toks) >= 5
            and toks[2] == "rank"
        ):
            out = {
                "workload": toks[0],
                "shape": toks[1],
                "k": int(toks[3]),
                "dtype": toks[4],
                "x_dtype": "float32",
            }
            for t in toks[5:]:
                if t.startswith("x-"):
                    out["x_dtype"] = t[2:]
        elif kind == "tile_sparse_iters_per_sec" and toks:
            out = {"workload": "tile_sparse", "shape": toks[0]}
            for t in toks[1:]:
                if t.startswith("k="):
                    out["k"] = int(t[2:])
                elif t.startswith("tile="):
                    out["tile"] = int(t[5:])
                elif t.startswith("occ="):
                    out["occupancy"] = float(t[4:])
                elif "=" not in t:
                    out["dtype"] = t
    except (ValueError, IndexError):
        return {}
    return out


def archive_append(entry: dict, path: str = ARCHIVE_PATH) -> None:
    """Append one measurement record (ALL repeats, not best-of) to the
    cross-session archive.  Headline numbers in RESULTS.md are medians over
    this archive — single-session numbers on this shared chip swing +-2x
    (CLAUDE.md), so no rule table or tile choice may be retuned from one
    session's data.

    Every row is stamped with the structured workload/shape/k/dtype fields
    (parsed from the metric name via :func:`metric_fields`) so the archive
    is aggregatable without string surgery (VERDICT r03 weak #2/#5)."""
    entry = dict(entry, ts=time.time())
    for key, val in metric_fields(entry.get("metric", "")).items():
        entry.setdefault(key, val)
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "a") as f:
            f.write(json.dumps(entry) + "\n")
    except OSError:
        pass  # read-only checkout: bench still reports, just doesn't archive


def archive_rows(path: str = ARCHIVE_PATH, **field_filters) -> list:
    """All archive rows matching the given field filters (e.g.
    ``workload="regression", dtype="bfloat16"``), with rows from before the
    structured fields existed backfilled through :func:`metric_fields` so
    the whole archive participates.  Each returned row carries the merged
    fields."""
    rows = []
    try:
        with open(path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                merged = dict(metric_fields(rec.get("metric", "")), **rec)
                if all(merged.get(k) == v for k, v in field_filters.items()):
                    rows.append(merged)
    except OSError:
        pass
    return rows


def archive_stats(
    metric: str, backend: str, device_kind: str, path: str = ARCHIVE_PATH
) -> dict:
    """Median + IQR of iters/s pooled over every archived repeat for this
    (metric, backend, device_kind), and the number of contributing sessions."""
    pool, sessions = [], 0
    for rec in archive_rows(
        path, metric=metric, backend=backend, device_kind=device_kind
    ):
        # serving rows pool columns/s repeats; the metric filter above keeps
        # units homogeneous within any one aggregation
        reps = (
            rec.get("repeat_iters_per_sec")
            or rec.get("repeat_cols_per_sec")
            or []
        )
        if reps:
            pool.extend(reps)
            sessions += 1
    if not pool:
        return {}
    q25, med, q75 = np.percentile(pool, [25, 50, 75])
    # key names carry the pooled unit: serving metrics pool columns/s, so
    # labeling their median "iters_per_sec" would be a ~300x unit confusion
    # for any consumer aggregating across workloads
    unit = (
        "cols_per_sec" if metric.startswith("serving_") else "iters_per_sec"
    )
    return {
        f"archive_median_{unit}": round(float(med), 3),
        f"archive_iqr_{unit}": round(float(q75 - q25), 3),
        "archive_sessions": sessions,
        "archive_repeats": len(pool),
    }


def run_converge(dtype: str, backend: str) -> dict:
    """Time-to-solution benchmark (BASELINE config 2: 1025x4000 rank 32,
    converge to 1e-5 rel-change): plain MU vs the safeguarded accelerated
    solver (``SolveConfig.accelerate``).

    Reports both the stop-criterion iteration counts and the
    equal-final-cost comparison (iterations/wall-time for the accelerated
    run to first reach plain MU's converged cost) — the honest metric, since
    a better optimizer keeps making progress and so triggers the rel-change
    stop later at a lower cost.
    """
    import dataclasses
    import jax

    from nmf_tpu.models.solver import solve
    from nmf_tpu.utils.config import Precision, SolveConfig

    m, k, n = 1025, 32, 4000
    rng = np.random.RandomState(0)
    eps = np.float32(2.2204e-16)
    x = np.maximum(rng.rand(m, n).astype(np.float32), eps)
    w0 = rng.rand(m, k).astype(np.float32)
    h0 = rng.rand(k, n).astype(np.float32)
    check = 25
    cfg_p = SolveConfig(
        max_iter=6000, thresh=1e-5, check_every=check,
        precision=Precision(dtype), backend=backend,
    )
    cfg_a = dataclasses.replace(cfg_p, accelerate=True)

    def _timed(cfg):
        # warm the EXACT config (jit keys on it) and SYNC the warm run: its
        # execution + this platform's one-off first-dispatch stall must not
        # drain into the timed run (block_until_ready no-ops here)
        warm = solve(x, w0, h0, cfg)
        np.asarray(jax.device_get(warm.w[:1, :1]))
        t0 = time.perf_counter()
        res = solve(x, w0, h0, cfg)
        np.asarray(jax.device_get(res.w[:1, :1]))
        dt = time.perf_counter() - t0
        return res, dt

    plain, t_p = _timed(cfg_p)
    accel, t_a = _timed(cfg_a)
    hist_a = np.asarray(accel.cost_history)[: int(accel.num_checks)]
    it_p, it_a = int(plain.iterations), int(accel.iterations)
    cost_p, cost_a = float(plain.cost), float(accel.cost)
    reached = np.nonzero(hist_a <= cost_p)[0]
    it_a_to_cost = (int(reached[0]) + 1) * check if reached.size else None
    sec_per_it_a = t_a / max(it_a, 1)
    out = {
        "plain_iters": it_p,
        "plain_cost": cost_p,
        "plain_seconds": round(t_p, 4),
        "accel_iters": it_a,
        "accel_cost": cost_a,
        "accel_seconds": round(t_a, 4),
        "accel_iters_to_plain_cost": it_a_to_cost,
        "iters_speedup_to_plain_cost": (
            round(it_p / it_a_to_cost, 3) if it_a_to_cost else None
        ),
        "wall_speedup_to_plain_cost": (
            round(t_p / (sec_per_it_a * it_a_to_cost), 3)
            if it_a_to_cost
            else None
        ),
        "final_cost_rel_gap": (cost_a - cost_p) / abs(cost_p),
    }
    return out


def _np_oracle_mu(x, w, h, iters):
    """The SAME NumPy oracle the test suite gates on (tests/oracle.py) —
    imported, not re-implemented, so the on-device HWPARITY gate and the CI
    parity tests can never silently disagree about reference semantics."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    try:
        from oracle import clamp, np_kl, np_solve
    finally:
        sys.path.pop(0)
    eps = np.float32(2.2204e-16)
    w, h = np_solve(clamp(x), w, h, iters, eps=eps)
    return w, h, float(np_kl(clamp(x), w, h, eps=eps))


def _np_oracle_mu_padded(x, w, h, iters):
    """NumPy oracle of the reference algorithm INCLUDING its padding
    artifacts (PAD_MULT-32 buffers, clamps/sums over padded extents —
    matrix.cu:191, 277-278, 396-397): the strict-mode parity target."""
    from nmf_tpu.models.strict import pad_to_mult

    eps = np.float32(2.2204e-16)
    m, k = w.shape
    n = h.shape[1]
    xp = np.maximum(pad_to_mult(x), eps)
    wp = np.maximum(pad_to_mult(w), eps)
    hp = np.maximum(pad_to_mult(h), eps)
    for _ in range(iters):
        z = xp / np.maximum(wp @ hp, eps)
        sumw = np.maximum(wp.sum(axis=0, dtype=np.float32), eps)
        hp = hp * (wp.T @ z) / sumw[:, None]
        z = xp / np.maximum(wp @ hp, eps)
        sumh = np.maximum(hp.sum(axis=1, dtype=np.float32), eps)
        wp = wp * (z @ hp.T) / sumh[None, :]
    y = np.maximum(wp @ hp, eps)
    cost = float(
        np.sum(xp * (np.log(xp) - np.log(y)) - xp + y, dtype=np.float64)
    )
    return wp[:m, :k], hp[:k, :n], cost


# The full user-selectable numerics matrix, one gate row per cell.
# Cost tolerances are vs the clean NumPy oracle unless stated; the factor
# threshold gates pallas-vs-jnp W drift — LOOSE by design (200
# multiplicative iterations amplify rounding-order differences on a
# non-identifiable problem; bf16's measured backend drift is ~0.08, so the
# 0.5 gate is a drift ALARM, not an accuracy spec).
_CHECK_CELLS = [
    # name, Precision kwargs, cost_tol, cost_ref, backend_cost_tol, w_tol
    ("float32", dict(matmul_dtype="float32"), 1e-4, "oracle", 1e-5, 1e-2),
    ("float32_fast", dict(matmul_dtype="float32_fast"), 1e-4, "f32_jnp", 1e-4, 1e-1),
    ("bfloat16", dict(matmul_dtype="bfloat16"), 1e-3, "oracle", 1e-3, 5e-1),
    ("x_bfloat16", dict(matmul_dtype="bfloat16", x_dtype="bfloat16"), 1e-2, "oracle", 1e-3, 5e-1),
    ("x_int8", dict(matmul_dtype="float32", x_dtype="int8"), 1e-2, "oracle", 1e-3, 5e-1),
    # per-(row-block, column) int8 scales: jnp-only by contract (the fused
    # kernels' scales operand is per-column; resolve_step_fn raises), so
    # the backend-agreement legs are skipped automatically below
    ("x_int8_rowblocks", dict(matmul_dtype="float32", x_dtype="int8", x_quant_rows=64), 1e-2, "oracle", 1e-3, 5e-1),
    # state_bfloat16 CARRIES the factors in bf16: each backend injects its
    # own ~2^-8 rounding per iteration into a non-identifiable system, so
    # backend trajectories legitimately diverge to different equally-good
    # minima (measured W maxrel 1.5 on chip at cost agreement 4e-5).  The
    # factor gate is therefore catastrophic-only; the cost gates stay tight.
    ("state_bfloat16", dict(matmul_dtype="bfloat16", state_dtype="bfloat16"), 1e-2, "oracle", 1e-3, 10.0),
]


def run_check(quick: bool = False) -> dict:
    """Hardware numerics gate: compiled-Pallas == jnp == NumPy oracle ON THE
    ACTUAL DEVICE at the reference regression dims, across EVERY
    user-selectable numerics cell (the reference's device-executed
    regression, test_output.sh:5-18, generalized to the policy matrix).
    Emits the HWPARITY artifact (driver-committed each round).

    Per cell: each backend's final cost is gated against the NumPy oracle
    (or the exact-f32 jnp run for float32_fast, whose whole point is
    f32-grade agreement), backend-vs-backend cost agreement is gated, and
    the pallas-vs-jnp W deviation is gated by a loose per-tier drift alarm
    (see _CHECK_CELLS).  A final `strict` row runs the padded-EPS
    replication mode against its own padded NumPy oracle.
    """
    import jax

    from nmf_tpu.models.solver import solve
    from nmf_tpu.models.strict import solve_strict
    from nmf_tpu.utils.config import Precision, SolveConfig

    if quick:
        m, k, n, iters = 256, 16, 130, 20
    else:
        m, k, n, iters = 4096, 128, 350, 200
    rng = np.random.RandomState(0)
    x = np.maximum(rng.rand(m, n).astype(np.float32), np.float32(2.2204e-16))
    w0 = rng.rand(m, k).astype(np.float32)
    h0 = rng.rand(k, n).astype(np.float32)
    _, _, oracle_cost = _np_oracle_mu(x, w0, h0, iters)

    on_tpu = jax.default_backend() == "tpu"

    def _run(prec_kwargs, backend):
        cfg = SolveConfig(
            max_iter=iters, check_every=iters,
            precision=Precision(**prec_kwargs), backend=backend,
        )
        res = solve(x, w0, h0, cfg)
        return float(res.cost), np.asarray(res.w, np.float32)

    def _maxrel(a, b):
        return float(np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-30)))

    out = {
        "artifact": "hwparity",
        "device": str(jax.devices()[0]),
        "device_kind": jax.devices()[0].device_kind,
        "workload": f"{m}x{n} rank {k}, {iters} iterations (seed 0)",
        "oracle_cost": oracle_cost,
        "policies": {},
    }
    f32_jnp_cost = None
    for name, prec_kwargs, cost_tol, cost_ref, be_tol, w_tol in _CHECK_CELLS:
        jnp_only = bool(prec_kwargs.get("x_quant_rows"))
        backends = ("jnp", "pallas") if (on_tpu and not jnp_only) else ("jnp",)
        entry = {}
        costs, ws = {}, {}
        for backend in backends:
            c, wres = _run(prec_kwargs, backend)
            costs[backend], ws[backend] = c, wres
            entry[f"{backend}_cost"] = c
            entry[f"{backend}_cost_vs_oracle_rel"] = abs(c - oracle_cost) / abs(
                oracle_cost
            )
        if name == "float32":
            f32_jnp_cost = costs["jnp"]
        ref_cost = oracle_cost if cost_ref == "oracle" else f32_jnp_cost
        checks = [
            abs(costs[b] - ref_cost) / abs(ref_cost) <= cost_tol
            for b in backends
        ]
        if len(backends) == 2:
            entry["pallas_vs_jnp_cost_rel"] = abs(
                costs["pallas"] - costs["jnp"]
            ) / abs(costs["jnp"])
            entry["pallas_vs_jnp_w_maxrel"] = _maxrel(ws["pallas"], ws["jnp"])
            entry["w_drift_threshold"] = w_tol
            checks.append(entry["pallas_vs_jnp_cost_rel"] <= be_tol)
            checks.append(entry["pallas_vs_jnp_w_maxrel"] <= w_tol)
        entry["ok"] = bool(all(checks))
        out["policies"][name] = entry

    # host/program quantizer twins must emit IDENTICAL bytes ON THE DEVICE
    # — the serving formats' bitwise contract (quantized-input artifacts
    # compare md5-for-md5 against in-program quantization; e2e 7b-7d).
    # This is exactly the check that caught the 2026-08-19 TPU divergence
    # (uncanonicalized floor(x*inv+0.5): XLA:TPU divide rounding + FMA
    # contraction shifted boundary codes; fixed by ops/quant's
    # comparison-based canonical definition).
    import jax.numpy as jnp

    from nmf_tpu.ops import quant as _quant

    eps_q = float(np.float32(2.2204e-16))
    qj, sj = jax.jit(lambda a: _quant.quantize_columns(a, eps_q))(
        jnp.asarray(x)
    )
    qn, sn = _quant.quantize_columns_np(x, eps_q)
    cols_ok = bool(
        (np.asarray(jax.device_get(qj)) == qn).all()
        and (np.asarray(jax.device_get(sj)) == sn).all()
    )
    qrj, srj = jax.jit(lambda a: _quant.quantize_rowblocks(a, eps_q, 64))(
        jnp.asarray(x)
    )
    qrn, srn = _quant.quantize_rowblocks_np(x, eps_q, 64)
    rows_ok = bool(
        (np.asarray(jax.device_get(qrj)) == qrn).all()
        and (np.asarray(jax.device_get(srj)) == srn).all()
    )
    out["policies"]["quant_twins"] = {
        "columns_bitwise": cols_ok,
        "rowblocks_bitwise": rows_ok,
        "ok": cols_ok and rows_ok,
    }

    # strict padded-EPS replication vs its own padded oracle (f32 class)
    _, _, strict_oracle_cost = _np_oracle_mu_padded(x, w0, h0, iters)
    sres = solve_strict(
        x, w0, h0, SolveConfig(max_iter=iters, check_every=iters)
    )
    strict_rel = abs(float(sres.cost) - strict_oracle_cost) / abs(
        strict_oracle_cost
    )
    out["policies"]["strict"] = {
        "cost": float(sres.cost),
        "padded_oracle_cost": strict_oracle_cost,
        "cost_vs_padded_oracle_rel": strict_rel,
        "ok": bool(strict_rel <= 1e-4),
    }
    out["ok"] = all(e["ok"] for e in out["policies"].values())
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--workload",
        choices=list(WORKLOADS) + ["oocore", "converge", "serving"],
        default="flagship",
    )
    ap.add_argument(
        "--no-archive",
        action="store_true",
        help="skip appending this run's repeats to benchmarks/archive.jsonl",
    )
    ap.add_argument(
        "--check",
        action="store_true",
        help="run the hardware numerics gate (HWPARITY artifact) instead of "
        "a speed benchmark",
    )
    ap.add_argument(
        "--quick", action="store_true", help="small dims for --check smoke runs"
    )
    ap.add_argument(
        "--dtype",
        choices=["bfloat16", "float32", "float32_fast"],
        default="bfloat16",
    )
    ap.add_argument(
        "--x-dtype",
        choices=["float32", "bfloat16", "int8"],
        default="float32",
        help="storage dtype of X",
    )
    ap.add_argument(
        "--backend",
        choices=["best", "auto", "jnp", "pallas"],
        default="best",
        help="'best' measures both implementations and reports the faster",
    )
    args = ap.parse_args(argv)

    if args.workload == "serving" and args.x_dtype == "bfloat16":
        # the serve wire is either raw f32 X or int8 (codes, scales); a bf16
        # X storage dtype never crosses the link at serve time.  Rejected
        # BEFORE the backend probe: an arg error must not wait 300 s.
        print(json.dumps({
            "metric": "serving_unavailable", "value": None, "unit": "n/a",
            "vs_baseline": None,
            "error": "--workload serving supports --x-dtype float32|int8",
        }))
        return 1

    # Bounded backend-init probe: when the chip tunnel is down, the first
    # jax.devices() HANGS indefinitely (measured 2026-08-17/18 outages) —
    # a driver capturing this process would record NOTHING.  Probe in a
    # daemon thread and emit a diagnosable JSON record instead of hanging.
    import threading

    _probe_ok = threading.Event()
    _probe_exc = []

    def _probe():
        try:
            import jax as _jax

            _jax.devices()
        except BaseException as e:  # noqa: BLE001 — reported, not hidden
            _probe_exc.append(e)
            return
        _probe_ok.set()

    _t = threading.Thread(target=_probe, daemon=True)
    _t.start()
    _t.join(timeout=300.0)
    if not _probe_ok.is_set():
        # distinguish a CRASH (plugin/env error, immediate) from the HANG
        # (tunnel down) — a driver reading this record needs the right
        # diagnosis
        err = (
            f"device backend initialization FAILED: {_probe_exc[0]!r}"
            if _probe_exc
            else "device backend initialization did not complete in 300 s "
                 "— TPU tunnel down (known outage mode)"
        )
        print(json.dumps({
            "metric": "bench_unavailable",
            "value": None,
            "unit": "n/a",
            "vs_baseline": None,
            "error": err + "; no measurement possible",
        }))
        return 1

    import jax

    if args.check:
        print(json.dumps(run_check(quick=args.quick)))
        return 0

    if args.workload == "converge":
        backend = "auto" if args.backend == "best" else args.backend
        stats = run_converge(args.dtype, backend)
        record = {
            "metric": f"converge_iters_speedup[1025x4000 rank 32 {args.dtype} thresh 1e-5]",
            # headline: iterations to reach plain MU's converged cost
            "value": stats["iters_speedup_to_plain_cost"],
            "unit": "x fewer iterations",
            # baseline = plain MU (the reference algorithm), so speedup IS
            # the vs_baseline ratio
            "vs_baseline": stats["iters_speedup_to_plain_cost"],
            "baseline_kind": "plain MU on the same chip/config (reference algorithm)",
            "device": str(jax.devices()[0]),
            "device_kind": jax.devices()[0].device_kind,
            "backend": backend,
            **stats,
        }
        print(json.dumps(record))
        return 0

    if args.workload == "oocore":
        m, k, n = 2048, 128, 8192  # 64 MB X streamed per iteration
        stats = run_oocore(m, k, n, iters=3, dtype=args.dtype, x_dtype=args.x_dtype)
        xd_tag = "" if args.x_dtype == "float32" else f" x-{args.x_dtype}"
        record = {
            "metric": f"oocore_iters_per_sec[{m}x{n} rank {k} {args.dtype}{xd_tag}]",
            "value": round(stats["iters_per_sec"], 4),
            "unit": "iters/s",
            # baseline: the H2D roofline (1.0 == transfer-bound speed of light)
            "vs_baseline": round(stats["fraction_of_peak"], 4),
            "ms_per_iter": round(stats["ms_per_iter"], 2),
            "achieved_tflops": round(stats["achieved_tflops"], 3),
            "h2d_gbps": round(stats["h2d_gbps"], 4),
            "streamed_gb_per_iter": round(stats["streamed_gb_per_iter"], 3),
            "baseline_kind": "H2D roofline (bytes(X) / measured link bandwidth)",
            "device": str(jax.devices()[0]),
            "backend": "stream",
        }
        print(json.dumps(record))
        return 0

    if args.workload == "serving":
        m, k, n, block_n = 2048, 128, 16384, 2048  # = run_all serving rows
        stats = run_serving(m, k, n, 50, block_n, args.dtype, args.x_dtype)
        xd_tag = "" if args.x_dtype == "float32" else f" x-{args.x_dtype}"
        metric = f"serving_cols_per_sec[serving {m}x{n} rank {k} {args.dtype}{xd_tag}]"
        device_kind = jax.devices()[0].device_kind
        record = {
            "metric": metric,
            "value": round(stats["cols_per_sec"], 1),
            "unit": "columns/s",
            # baseline: the H2D roofline (1.0 == transfer-bound speed of light)
            "vs_baseline": round(stats["fraction_of_peak"], 4),
            "baseline_kind": "H2D roofline (wire bytes of one call / "
                             "measured link bandwidth)",
            "device": str(jax.devices()[0]),
            "device_kind": device_kind,
            "backend": "serving",
            **{kk: (round(vv, 4) if isinstance(vv, float) else vv)
               for kk, vv in stats.items() if kk != "repeat_cols_per_sec"},
        }
        if not args.no_archive and device_kind != "cpu":
            # CPU-forced debug runs must never feed the chip's cross-session
            # medians (archive_stats filters by device_kind, but the rows
            # would still accumulate as noise)
            archive_append({
                "metric": metric,
                "backend": "serving",
                "device_kind": device_kind,
                "repeat_cols_per_sec": [
                    round(v, 1) for v in stats["repeat_cols_per_sec"]
                ],
            })
            record.update(archive_stats(metric, "serving", device_kind))
        print(json.dumps(record))
        return 0

    m, k, n, short, long = WORKLOADS[args.workload]
    if args.backend == "best":
        # the fused Pallas kernels are TPU-only; off-TPU measure just jnp.
        # int8-X excludes pallas: Mosaic's uint8 cast path is ~1000x slower
        # than the math (see benchmarks/RESULTS.md), so 'best' would stall.
        on_tpu = jax.default_backend() == "tpu"
        backends = (
            ("pallas", "jnp") if on_tpu and args.x_dtype != "int8" else ("jnp",)
        )
        candidates = {
            be: run_single(m, k, n, short, long, args.dtype, be, args.x_dtype)
            for be in backends
        }
        # NaN-safe pick: an all-sync-artifact candidate (ms_per_iter=NaN)
        # must never beat a valid measurement (min() with NaN first keeps
        # the NaN); only if EVERY candidate failed do we report the failure
        finite = {
            be: st for be, st in candidates.items()
            if np.isfinite(st["ms_per_iter"])
        }
        backend_used, stats = min(
            (finite or candidates).items(),
            key=lambda kv: kv[1]["ms_per_iter"],
        )
    else:
        backend_used = args.backend
        stats = run_single(
            m, k, n, short, long, args.dtype, args.backend, args.x_dtype
        )

    if args.workload == "paper":
        baseline_ips = REFERENCE_PAPER_IPS
        baseline_kind = "measured (ISMIR-2009: 200 iters / 0.6 s on GTX 280)"
    else:
        baseline_ips = REFERENCE_GFLOPS * 1e9 / flops_per_iter(m, k, n)
        baseline_kind = "derived (reference CUDA sustained 141 GFLOP/s)"

    # the X storage dtype is part of the workload identity: int8/bf16-X
    # repeats must not pool into the f32-X archive medians (the canonical
    # f32 name stays unsuffixed so existing archive rows keep matching)
    xd_tag = "" if args.x_dtype == "float32" else f" x-{args.x_dtype}"
    metric = f"mu_iters_per_sec[{args.workload} {m}x{n} rank {k} {args.dtype}{xd_tag}]"
    device_kind = jax.devices()[0].device_kind
    record = {
        "metric": metric,
        # session MEDIAN of the repeats (best-of flatters +-2x chip noise)
        "value": round(stats["iters_per_sec"], 3),
        "unit": "iters/s",
        "vs_baseline": round(stats["iters_per_sec"] / baseline_ips, 2),
        "ms_per_iter": round(stats["ms_per_iter"], 4),
        "best_iters_per_sec": round(stats["best_iters_per_sec"], 3),
        "achieved_tflops": round(stats["achieved_tflops"], 3),
        "fraction_of_peak": (
            round(stats["fraction_of_peak"], 4)
            if stats["fraction_of_peak"] is not None
            else None
        ),
        "baseline_iters_per_sec": round(baseline_ips, 4),
        "baseline_kind": baseline_kind,
        "device": str(jax.devices()[0]),
        "device_kind": device_kind,
        "backend": backend_used,
    }
    if stats.get("suspect"):
        record["suspect"] = stats["suspect"]
    # strict JSON: a failed measurement's NaN must serialize as null, not
    # the non-standard NaN token (consumers json.loads these lines)
    for key, val in list(record.items()):
        if isinstance(val, float) and not np.isfinite(val):
            record[key] = None
    if not args.no_archive and device_kind != "cpu":
        # CPU-forced debug runs must never feed the chip's cross-session
        # medians (this bit a CPU drive of the serving workload once)
        archive_append(
            {
                "metric": metric,
                "backend": backend_used,
                "device_kind": device_kind,
                "repeat_iters_per_sec": [
                    round(v, 3) for v in stats["repeat_iters_per_sec"]
                ],
            }
        )
        record.update(archive_stats(metric, backend_used, device_kind))
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
