"""Post-queue retune advisor for the two VERDICT-r03 rule disputes.

Rule tables may only be re-derived from >= 3 archived sessions per side
(CLAUDE.md: single-session numbers on this shared chip swing +-2x).  This
tool pools benchmarks/archive.jsonl and decides, mechanically:

  1. regression-dims bf16 backend (utils/autotune.rule_pick's
     single-lane-tile-N branch, i.e. ChipSpec.fused_single_tile_n):
     jnp vs pallas at 4096x350 k=128 bfloat16 — the committed round-3
     results.json said jnp +43% while the rule says pallas +17%.
  2. tile-sparse bf16 k-crossover (ops/pallas/tile_sparse.preferred):
     currently `k >= 384`; decided from the k in {128, 256, 384} campaigns
     at tile=128 occ=0.125 (post-rename labels ONLY — pre-rename occ rows
     are mislabeled and must not pool, benchmarks/RESULTS.md).

Output: one JSON object per cell with per-backend pooled medians, IQRs,
session counts and per-session medians, a winner, and a verdict:
  'retune'        — >= MIN_SESSIONS per side and the loser's pooled median
                    sits outside the winner's pooled IQR (a real gap);
  'keep'          — >= MIN_SESSIONS per side, rule already picks the winner
                    (or the gap is inside the IQR noise band);
  'insufficient'  — fewer sessions than the policy requires: DO NOT retune.

    python benchmarks/retune.py [--device-kind "TPU v5 lite"] [--min 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (repo-root module)

MIN_SESSIONS = 3


def cell_stats(metric, backend, device_kind, path):
    """Pooled + per-session stats for one (metric, backend) cell."""
    sessions = []
    for rec in bench.archive_rows(
        path, metric=metric, backend=backend, device_kind=device_kind
    ):
        reps = rec.get("repeat_iters_per_sec") or rec.get(
            "repeat_cols_per_sec"
        )
        if reps:
            sessions.append([float(v) for v in reps])
    pool = [v for reps in sessions for v in reps]
    if not pool:
        return {"sessions": 0}
    q25, med, q75 = np.percentile(pool, [25, 50, 75])
    return {
        "sessions": len(sessions),
        "pooled_median": round(float(med), 3),
        "pooled_iqr": [round(float(q25), 3), round(float(q75), 3)],
        "session_medians": [
            round(float(np.median(r)), 3) for r in sessions
        ],
    }


def decide(metric, current_pick, contenders, device_kind, path,
           min_sessions=MIN_SESSIONS):
    """Compare contender backends on one cell and emit a verdict."""
    stats = {b: cell_stats(metric, b, device_kind, path) for b in contenders}
    out = {"metric": metric, "current_rule_pick": current_pick,
           "backends": stats}
    if any(s["sessions"] < min_sessions for s in stats.values()):
        out["verdict"] = "insufficient"
        out["why"] = (
            f"policy needs >= {min_sessions} archived sessions per backend; "
            f"have " + ", ".join(
                f"{b}={s['sessions']}" for b, s in stats.items()
            )
        )
        return out
    winner = max(stats, key=lambda b: stats[b]["pooled_median"])
    loser = next(b for b in contenders if b != winner)
    out["winner"] = winner
    out["margin"] = round(
        stats[winner]["pooled_median"] / stats[loser]["pooled_median"], 3
    )
    # a real gap = the loser's pooled median falls OUTSIDE the winner's
    # pooled IQR (coarse on purpose: shared-chip noise swings +-2x)
    lo, hi = stats[winner]["pooled_iqr"]
    clear = not (lo <= stats[loser]["pooled_median"] <= hi)
    if winner == current_pick:
        out["verdict"] = "keep"
        out["why"] = "the current rule already picks the pooled-median winner"
    elif clear:
        out["verdict"] = "retune"
        out["why"] = (
            f"{winner} beats the rule's pick {current_pick} by "
            f"{out['margin']}x with the loser outside the winner's IQR"
        )
    else:
        out["verdict"] = "keep"
        out["why"] = (
            f"{winner} leads but {loser}'s median sits inside {winner}'s "
            "IQR — inside the noise band, keep the stable rule"
        )
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--device-kind", default="TPU v5 lite")
    ap.add_argument("--archive", default=bench.ARCHIVE_PATH)
    ap.add_argument("--min", type=int, default=MIN_SESSIONS,
                    help="sessions per backend required before retuning")
    args = ap.parse_args(argv)

    report = {"artifact": "retune", "device_kind": args.device_kind,
              "min_sessions": args.min, "cells": []}

    # 1. regression-dims bf16 rule (ChipSpec.fused_single_tile_n)
    reg = decide(
        "mu_iters_per_sec[regression 4096x350 rank 128 bfloat16]",
        current_pick="pallas",  # rule_pick's single-lane-tile-N branch
        contenders=("jnp", "pallas"),
        device_kind=args.device_kind, path=args.archive,
        min_sessions=args.min,
    )
    reg["cell"] = "regression_bf16_single_tile_n"
    reg["rule_site"] = (
        "utils/device.py ChipSpec.fused_single_tile_n (v5e row) via "
        "utils/autotune.rule_pick"
    )
    if reg.get("verdict") == "retune":
        reg["action"] = (
            "set fused_single_tile_n=False on the v5e ChipSpec row and "
            "cite this report's session medians in its docstring"
        )
    report["cells"].append(reg)

    # 2. tile-sparse bf16 k-crossover (tile=128, occ=0.125 post-rename)
    crossover = None
    for k in (128, 256, 384):
        cell = decide(
            f"tile_sparse_iters_per_sec[8192x8192 k={k} tile=128 "
            f"occ=0.125 bfloat16]",
            current_pick=("pallas" if k >= 384 else "jnp-c64"),
            contenders=("jnp-c64", "pallas"),
            device_kind=args.device_kind, path=args.archive,
            min_sessions=args.min,
        )
        cell["cell"] = f"tile_sparse_bf16_k{k}"
        cell["rule_site"] = "ops/pallas/tile_sparse.preferred (bf16 k >= 384)"
        report["cells"].append(cell)
        if (crossover is None and cell.get("verdict") != "insufficient"
                and cell.get("winner") == "pallas"):
            crossover = k
    if crossover is not None:
        report["tile_sparse_bf16_crossover_k"] = crossover
        if crossover != 384:
            report["tile_sparse_action"] = (
                f"move the bf16 branch of tile_sparse.preferred to "
                f"k >= {crossover} (pooled-median winner flips there)"
            )

    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
