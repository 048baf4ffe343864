"""Structured metrics/observability for solver runs.

The reference's observability is two printf lines (nmf.cu:215, 258) and a
``verbose`` flag that no longer exists (README.md:54).  This restores the
README-era per-run reporting as structured records: per-check KL cost,
relative change, iterations/sec and achieved TFLOP/s, emitted as
human-readable lines and/or JSONL (SURVEY.md section 5, metrics row).
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from typing import IO, List, Optional

import numpy as np

__all__ = [
    "CheckRecord",
    "RunReport",
    "MetricsLogger",
    "summarize_result",
    "emit_live",
    "set_live_handler",
]


# ---------------------------------------------------------------------------
# Live per-check streaming (SolveConfig.live_metrics).
#
# The solver's while_loop emits (iteration, cost, rel_change) through a
# jax.debug.callback every check_every iterations — the restoration of the
# reference-era ITER_CHECK status reporting (README.md:51-54) — WITHOUT
# breaking the zero-host-sync default: the callback is asynchronous and the
# feature is opt-in.  The host-side sink is this module-level handler.
# ---------------------------------------------------------------------------


def _default_live_handler(iteration: int, cost: float, rel_change: float) -> None:
    sys.stderr.write(
        f"[nmf] iter {iteration:>6d}  cost {cost:.6e}  "
        f"rel_change {rel_change:.3e}  (live)\n"
    )
    sys.stderr.flush()


_live_handler = _default_live_handler


def set_live_handler(handler) -> None:
    """Replace the live-metrics sink (None restores the stderr default)."""
    global _live_handler
    _live_handler = handler if handler is not None else _default_live_handler


def emit_live(iteration, cost, rel_change) -> None:
    """Host-side entry invoked by the solver's debug callback."""
    _live_handler(int(iteration), float(cost), float(rel_change))


@dataclasses.dataclass
class CheckRecord:
    """One convergence-check point (every ``check_every`` iterations)."""

    iteration: int
    cost: float
    rel_change: float  # |prev - cost| / |cost| ; inf at the first check


@dataclasses.dataclass
class RunReport:
    """Whole-run summary."""

    m: int
    k: int
    n: int
    iterations: int
    converged: bool
    final_cost: float
    seconds: float
    iters_per_sec: float
    achieved_tflops: float
    checks: List[CheckRecord] = dataclasses.field(default_factory=list)

    def to_json(self) -> str:
        """RFC-8259-clean JSON: non-finite floats become null (inf rel_change
        at the first check, NaN timing when none was recorded)."""

        def clean(v):
            if isinstance(v, float) and not np.isfinite(v):
                return None
            if isinstance(v, dict):
                return {k: clean(x) for k, x in v.items()}
            if isinstance(v, list):
                return [clean(x) for x in v]
            return v

        return json.dumps(clean(dataclasses.asdict(self)))


def flops_per_iter(m: int, k: int, n: int) -> float:
    return 8.0 * m * n * k


def summarize_result(
    result,
    x_shape,
    seconds: Optional[float] = None,
    check_every: Optional[int] = None,
    check_iterations: Optional[List[int]] = None,
) -> RunReport:
    """Build a RunReport from a SolveResult (host-syncs the scalars).

    ``check_every`` is the solve's actual check interval (SolveConfig
    .check_every): check ``i`` happened at iteration
    ``min((i+1)*check_every, iterations)`` — the exact chunk boundaries of
    the solver loop.  Without it, labels fall back to an even split (which
    mislabels runs whose final chunk was partial).  ``check_iterations``
    overrides both with an explicit label list (checkpointed runs stitch
    segments whose check grid restarts per segment).
    """
    m, n = x_shape
    k = result.w.shape[1]
    iterations = int(result.iterations)
    hist = np.asarray(result.cost_history)[: int(result.num_checks)]
    checks = []
    prev = float("inf")
    n_checks = len(hist)
    if check_every is None and n_checks:
        check_every = max(1, iterations // n_checks)
    for i, c in enumerate(hist):
        if check_iterations is not None and i < len(check_iterations):
            it = int(check_iterations[i])
        else:
            it = min((i + 1) * check_every, iterations) if n_checks else 0
        if not np.isfinite(prev) or float(c) == 0.0:
            # a zero divergence is an exact fit: IEEE-safe 0/0-style cases
            # (Python float division would raise ZeroDivisionError)
            rel = 0.0 if prev == float(c) else float("inf")
        else:
            rel = abs(prev - float(c)) / abs(float(c))
        checks.append(CheckRecord(iteration=it, cost=float(c), rel_change=rel))
        prev = float(c)
    secs = float(seconds) if seconds is not None else float("nan")
    ips = iterations / secs if seconds is not None and secs > 0 else float("nan")
    return RunReport(
        m=m,
        k=k,
        n=n,
        iterations=iterations,
        converged=bool(result.converged),
        final_cost=float(result.cost),
        seconds=secs,
        iters_per_sec=ips,
        achieved_tflops=(flops_per_iter(m, k, n) * ips / 1e12) if seconds else float("nan"),
        checks=checks,
    )


class MetricsLogger:
    """Emits check records and run summaries, human and/or JSONL.

    Usage::

        logger = MetricsLogger(verbose=True, jsonl_path="run.jsonl")
        with logger.timed() as t:
            res = solve(...)
        report = logger.report(res, x.shape, t.seconds)
    """

    def __init__(
        self,
        verbose: bool = True,
        stream: IO = sys.stderr,
        jsonl_path: Optional[str] = None,
    ):
        self.verbose = verbose
        self.stream = stream
        self.jsonl_path = jsonl_path

    class _Timer:
        def __enter__(self):
            self._t0 = time.perf_counter()
            self.seconds = None
            return self

        def __exit__(self, *exc):
            self.seconds = time.perf_counter() - self._t0
            return False

    def timed(self) -> "_Timer":
        return self._Timer()

    def report(
        self,
        result,
        x_shape,
        seconds: Optional[float] = None,
        check_every: Optional[int] = None,
        check_iterations: Optional[List[int]] = None,
    ) -> RunReport:
        rep = summarize_result(
            result, x_shape, seconds, check_every, check_iterations
        )
        if self.verbose:
            for c in rep.checks:
                self.stream.write(
                    f"[nmf] iter {c.iteration:>6d}  cost {c.cost:.6e}  "
                    f"rel_change {c.rel_change:.3e}\n"
                )
            status = "converged" if rep.converged else "max_iter"
            self.stream.write(
                f"[nmf] done ({status}): {rep.iterations} iters"
                + (
                    f" in {rep.seconds:.3f} s "
                    f"({rep.iters_per_sec:.1f} it/s, "
                    f"{rep.achieved_tflops:.2f} TFLOP/s)"
                    if seconds
                    else ""
                )
                + f", final cost {rep.final_cost:.6e}\n"
            )
            self.stream.flush()
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(rep.to_json() + "\n")
        return rep

    def report_raw(self, record: dict) -> None:
        """Emit a free-form record (drivers whose run shape does not fit a
        single SolveResult — e.g. the online learner's pass structure)."""
        import json as _json

        if self.verbose:
            self.stream.write(f"[nmf] {_json.dumps(record)}\n")
            self.stream.flush()
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(_json.dumps(record) + "\n")
