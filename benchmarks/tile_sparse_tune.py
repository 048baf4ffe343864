"""Tile-sparse kernel tuning harness: paired, interleaved measurements.

Measures candidate tile-sparse configurations A/B/C/... in INTERLEAVED
rounds (A B C A B C ...), so slow drift of the shared chip cancels in the
per-round ratios; reports per-candidate medians and the median paired ratio
vs the first (baseline) candidate, and appends every repeat to
benchmarks/archive.jsonl (the cross-session store — CLAUDE.md forbids
retuning from a single session's numbers; this harness exists to make the
multi-session medians accumulate).

    python benchmarks/tile_sparse_tune.py [--rounds 5] [--m 8192] [--k 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def build_problem(m, k, n, tile, occ_frac, seed=0):
    """Clustered-sparse X (same generator as run_all.bench_tile_sparse)."""
    rng = np.random.RandomState(seed)
    mb, nb = m // tile, n // tile
    occ = rng.rand(mb, nb) < occ_frac
    x = np.zeros((m, n), np.float32)
    for i, j in zip(*np.nonzero(occ)):
        blk = rng.rand(tile, tile).astype(np.float32)
        blk[rng.rand(tile, tile) < 0.5] = 0
        x[i * tile:(i + 1) * tile, j * tile:(j + 1) * tile] = blk
    w = rng.rand(m, k).astype(np.float32)
    h = rng.rand(k, n).astype(np.float32)
    return x, w, h


def make_runner(x, w, h, tile, chunk, backend, dtype):
    """Device-resident closure timing iterations/sec for one config."""
    import jax

    from nmf_tpu.models import sparse_tiled as st
    from nmf_tpu.utils.config import Precision, SolveConfig

    eps = np.float32(2.2204e-16)
    tx = st.tiles_from_dense(x, tile=(tile, tile))
    # TRUE occupancy, captured BEFORE chunk padding (the pad tiles are inert
    # zeros; counting them inflated occ=0.08 data to 0.125 at chunk=256)
    true_occ = float(tx.occupancy())
    tls, trs, tcs = st._pad_tiles_np(
        np.asarray(tx.tiles), np.asarray(tx.rows), np.asarray(tx.cols), chunk
    )
    tx = st.TileSparseX(
        tiles=jax.device_put(tls),
        rows=jax.device_put(trs),
        cols=jax.device_put(tcs),
        shape=tx.shape,
    )
    w_dev = jax.device_put(np.maximum(w, eps))
    h_dev = jax.device_put(np.maximum(h, eps))

    def run(iters):
        cfg = SolveConfig(
            max_iter=iters, check_every=10 ** 9, track_cost=False,
            backend=backend, precision=Precision(dtype),
        )
        r = st.solve_sparse_tiled(tx, w_dev + 0, h_dev + 0, cfg, chunk=chunk)
        np.asarray(jax.device_get(r.w[:1, :1]))
        return r

    def measure(short=200, long=1200):
        for _ in range(4):
            t0 = time.perf_counter(); run(short); ts = time.perf_counter() - t0
            t0 = time.perf_counter(); run(long); tl = time.perf_counter() - t0
            if tl > ts:  # a non-positive difference is a sync artifact and
                return (long - short) / (tl - ts)  # must not reach the archive
        raise RuntimeError(
            "timing sync failed 4x (t_long <= t_short): platform too noisy"
        )

    # warm both exact configs (jit keys on them; one-off dispatch stall)
    run(200), run(1200)
    return measure, true_occ


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--m", type=int, default=8192)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--occ", type=float, default=0.08)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--no-archive", action="store_true")
    ap.add_argument(
        "--tiles", default=None,
        help="comma list of tile sizes: tile-SIZE study on ONE dense X "
        "(clustered at --cluster granularity, so larger tiles pay real "
        "fill-in — the data-format trade, docs/ROADMAP.md)",
    )
    ap.add_argument(
        "--cluster", type=int, default=None,
        help="nonzero-cluster granularity of the generated X "
        "(default: --tile)",
    )
    args = ap.parse_args(argv)

    import jax

    import bench  # repo-root bench.py: archive helpers

    device_kind = jax.devices()[0].device_kind
    cluster = args.cluster or args.tile
    x, w, h = build_problem(args.m, args.k, args.n, cluster, args.occ)

    if args.tiles:
        sizes = [int(s) for s in args.tiles.split(",")]
        candidates = []
        for t in sizes:
            candidates.append(
                (f"pallas-t{t}", dict(chunk=64, backend="pallas", tile=t))
            )
            candidates.append(
                (f"jnp-c64-t{t}", dict(chunk=64, backend="jnp", tile=t))
            )
    else:
        candidates = [
            ("pallas", dict(chunk=64, backend="pallas")),
            ("jnp-c64", dict(chunk=64, backend="jnp")),
            ("jnp-c128", dict(chunk=128, backend="jnp")),
            ("jnp-c256", dict(chunk=256, backend="jnp")),
        ]
    runners = {}
    occ_by_name = {}
    for name, kw in candidates:
        measure, true_occ = make_runner(x, w, h, kw.get("tile", args.tile),
                                        kw["chunk"], kw["backend"], args.dtype)
        runners[name] = measure
        occ_by_name[name] = true_occ
    # the metric name must be stable across candidate lists/order so the
    # >=3-session archive pooling accumulates: key it on the REQUESTED
    # occupancy; per-candidate true fill-in (tile-size dependent) is a field
    occupancy = float(args.occ)

    rows = {name: [] for name, _ in candidates}
    for r in range(args.rounds):
        for name, _ in candidates:          # interleaved: drift cancels
            rows[name].append(runners[name]())

    base = candidates[0][0]
    tile_tag = (
        f"tiles={args.tiles} cluster={cluster}" if args.tiles
        else f"tile={args.tile}"
    )
    out = {
        "metric": f"tile_sparse_iters_per_sec[{args.m}x{args.n} k={args.k} "
        f"{tile_tag} occ={occupancy:.3f} {args.dtype}]",
        "device_kind": device_kind,
        "occupancy": occupancy,
        "rounds": args.rounds,
        "candidates": {},
    }
    for name, _ in candidates:
        med = float(np.median(rows[name]))
        ratios = [a / b for a, b in zip(rows[name], rows[base])]
        out["candidates"][name] = {
            "median_iters_per_sec": round(med, 2),
            "repeats": [round(v, 2) for v in rows[name]],
            "median_ratio_vs_baseline": round(float(np.median(ratios)), 3),
            "occupancy": round(occ_by_name[name], 4),
        }
        if not args.no_archive:
            bench.archive_append(
                {
                    "metric": out["metric"],
                    "backend": name,
                    "device_kind": device_kind,
                    "repeat_iters_per_sec": [round(v, 3) for v in rows[name]],
                }
            )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
