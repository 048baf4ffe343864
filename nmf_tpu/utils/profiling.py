"""Profiling and per-stage timing utilities.

The reference was profiled with external NVIDIA tools (``*.nsys-rep`` /
``*.ncu-rep`` in its .gitignore) and its README-era API carried a
``double t[10]`` per-stage timing array (README.md:46,53) that the code
dropped.  This module restores both capabilities TPU-style:

  * :func:`trace` — context manager around ``jax.profiler`` producing
    Perfetto/XProf/TensorBoard traces (the nsys equivalent).
  * :func:`stage_timings` — the ``t[10]`` restoration: wall-clock per update
    stage (recon+divide, numerator GEMM, sums, epilogue, cost), measured by
    running each stage separately with forced completion.  Because XLA fuses
    stages inside the real solver, these are *standalone* stage costs — an
    upper bound that shows where the time would go unfused.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import numpy as np

__all__ = ["trace", "stage_timings", "force_completion"]


def force_completion(*arrays) -> None:
    """Block until results exist host-side.

    ``jax.block_until_ready`` is unreliable on tunneled device platforms
    (returns before execution completes), so fetch a scalar slice instead.
    """
    import jax

    for a in arrays:
        a = a if hasattr(a, "shape") else np.asarray(a)
        idx = tuple(slice(0, 1) for _ in range(getattr(a, "ndim", 0)))
        np.asarray(jax.device_get(a[idx] if a.ndim else a))


@contextlib.contextmanager
def trace(log_dir: str, with_perfetto: bool = False):
    """``with trace("/tmp/nmf-trace"): run(...)`` -> XProf/TensorBoard trace."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=with_perfetto)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _timeit(fn, args, repeats: int = 5) -> float:
    out = fn(*args)
    force_completion(*(out if isinstance(out, tuple) else (out,)))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        force_completion(*(out if isinstance(out, tuple) else (out,)))
        best = min(best, time.perf_counter() - t0)
    return best


def stage_timings(
    x, w, h, eps: Optional[float] = None, repeats: int = 5
) -> Dict[str, float]:
    """Per-stage standalone timings (seconds) for one MU iteration's pieces.

    Stages mirror the reference's kernel launches (nmf.cu:118-176):
    recon_divide (matrix_multiply + set_epsilon + vec_div), h_numerator
    (AtB GEMM), w_numerator (ABt GEMM), sums (sum_cols + sum_rows + clamps),
    epilogues (col/row divide + multiply), kl_cost (the per-check reduction),
    full_step — ALSO keyed as legacy ``fused_step`` — the per-iteration cost
    of the step implementation ``solve()`` would actually pick for this
    shape at f32 (the rule-table choice, not unconditionally the Pallas
    kernel), and null_dispatch — a trivial jitted op timed the same way.

    Every number includes one program dispatch + a scalar-fetch round trip
    (this platform's ``block_until_ready`` is unreliable, so completion is
    forced by a host fetch).  On the tunneled TPU that overhead is
    milliseconds and DOMINATES sub-ms stages — subtract ``null_dispatch``
    to estimate pure stage cost, and treat small-stage numbers as
    latency-bound upper bounds (bench.py's long/short differencing is the
    precise methodology; this is the quick diagnostic).
    """
    import jax
    import jax.numpy as jnp

    from ..models.solver import resolve_step_fn
    from ..ops.divergence import kl_divergence
    from ..ops.elementwise import EPS, eps_clamp
    from ..ops.mu import matmul
    from .config import Precision, SolveConfig

    eps = EPS if eps is None else eps
    prec = Precision()
    x = jnp.asarray(x, jnp.float32)
    w = jnp.asarray(w, jnp.float32)
    h = jnp.asarray(h, jnp.float32)

    recon = jax.jit(lambda w, h, x: x / eps_clamp(matmul(w, h, prec), eps))
    z = recon(w, h, x)
    force_completion(z)

    stages = {
        "recon_divide": (recon, (w, h, x)),
        "h_numerator": (
            jax.jit(lambda w, z: matmul(w, z, prec, transpose_a=True)),
            (w, z),
        ),
        "w_numerator": (
            jax.jit(lambda z, h: matmul(z, h, prec, transpose_b=True)),
            (z, h),
        ),
        "sums": (
            jax.jit(
                lambda w, h: (
                    eps_clamp(jnp.sum(w, axis=0), eps),
                    eps_clamp(jnp.sum(h, axis=1), eps),
                )
            ),
            (w, h),
        ),
        "epilogues": (
            jax.jit(
                lambda w, h: (
                    h * 2.0 / eps_clamp(jnp.sum(w, axis=0), eps)[:, None],
                    w * 2.0 / eps_clamp(jnp.sum(h, axis=1), eps)[None, :],
                )
            ),
            (w, h),
        ),
        "kl_cost": (jax.jit(lambda x, w, h: kl_divergence(x, w, h, eps)), (x, w, h)),
    }
    # the step solve() would actually run for this shape: resolve backend
    # the same way (rule table on TPU), and honor the caller's eps
    cfg = SolveConfig(eps=eps)
    if jax.default_backend() == "tpu":
        import dataclasses

        from .autotune import rule_pick

        cfg = dataclasses.replace(
            cfg, backend=rule_pick(w.shape[0], w.shape[1], h.shape[1],
                                   prec.matmul_dtype)
        )
    step = resolve_step_fn(cfg)
    stages["full_step"] = (jax.jit(lambda w, h, x: step(w, h, x)), (w, h, x))
    stages["null_dispatch"] = (jax.jit(lambda a: a + 1.0), (jnp.zeros(()),))
    out = {name: _timeit(fn, args, repeats) for name, (fn, args) in stages.items()}
    out["fused_step"] = out["full_step"]  # legacy key
    return out
