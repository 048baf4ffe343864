"""Pool benchmarks/archive.jsonl into per-(metric, backend) statistics.

The retune provenance tool: rule tables (utils/autotune.py,
ops/pallas/tile_sparse.preferred) may only be re-derived from >= 3 archived
sessions of medians (CLAUDE.md).  This prints, for every (metric, backend,
device_kind) in the archive: the pooled median, IQR, session count (one
archive append = one session), and the per-session medians so drift is
visible.

    python benchmarks/archive_report.py [--filter tile_sparse] [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict

import numpy as np

ARCHIVE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "archive.jsonl")


def load(path: str = ARCHIVE):
    rows = []
    try:
        f = open(path)
    except OSError:
        return rows  # no archive yet (fresh checkout): report empty, not die
    with f:
        for line in f:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            # serving rows archive columns/s repeats; normalize to one
            # field so the report covers them (units stay homogeneous
            # because grouping is per exact metric string)
            reps = rec.get("repeat_iters_per_sec") or rec.get(
                "repeat_cols_per_sec"
            )
            if reps:
                rows.append(dict(rec, repeat_iters_per_sec=reps))
    return rows


def report(rows, flt: str = ""):
    groups = defaultdict(list)
    for r in rows:
        key = (r.get("metric", "?"), r.get("backend", "?"), r.get("device_kind", "?"))
        if flt and flt not in key[0]:
            continue
        groups[key].append(r["repeat_iters_per_sec"])
    out = []
    for (metric, backend, kind), sessions in sorted(groups.items()):
        pool = [v for reps in sessions for v in reps]
        q25, med, q75 = np.percentile(pool, [25, 50, 75])
        out.append(
            {
                "metric": metric,
                "backend": backend,
                "device_kind": kind,
                "sessions": len(sessions),
                "repeats": len(pool),
                "median": round(float(med), 3),
                "iqr": round(float(q75 - q25), 3),
                "session_medians": [
                    round(float(np.median(reps)), 3) for reps in sessions
                ],
            }
        )
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--filter", default="", help="substring filter on the metric")
    ap.add_argument("--json", action="store_true", help="one JSON object per line")
    args = ap.parse_args(argv)
    rows = report(load(), args.filter)
    if args.json:
        for r in rows:
            print(json.dumps(r))
        return 0
    for r in rows:
        retunable = "retunable" if r["sessions"] >= 3 else f"{r['sessions']}/3 sessions"
        print(
            f"{r['metric']}\n    {r['backend']:12s} median {r['median']:10.1f} "
            f"iqr {r['iqr']:8.1f}  ({retunable}; per-session "
            f"{r['session_medians']})"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
