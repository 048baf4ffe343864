"""Per-shape backend selection: a measured rule table plus opt-in tuning.

Whether the fused Pallas step or the XLA-fused jnp step is faster depends on
the problem shape.  Measured on TPU v5e (bf16):

    512x3445  k=30   pallas +25-30%  (small-k, HBM-bound: fusion wins)
    1025x4000 k=32   tie within noise
    4096x350  k=128  pallas +17% after the deep-contraction-tile change
                     (single lane-tile N); jnp wins the f32 variant
    10240^2   k=256  no stable winner (both fluctuate +-20% across sessions)

``backend="auto"`` applies :func:`rule_pick`, derived from those numbers —
measurement-free, so no extra compiles.  The thresholds live in the
device-generation table (utils/device.py): they are v5e-measured and serve
as the architectural default elsewhere.

Rule-table provenance: the numbers above were measured across round-1/2
sessions (2 sessions; +-2x shared-chip noise documented in CLAUDE.md), and
the thresholds are intentionally COARSE for that reason.  Since round 3
every ``bench.py`` run appends its repeats to ``benchmarks/archive.jsonl``;
re-derive any threshold only from >= 3 archived sessions of medians
(``bench.archive_stats``), never from a single session.  ``backend="autotune"`` measures
both implementations once per (device kind, shape, dtype) via
:func:`pick_backend` and caches the winner BOTH in-process and on disk
(``~/.cache/nmf_tpu/autotune.json``, override with ``NMF_TPU_AUTOTUNE_CACHE``)
— on environments with slow remote compilation a measurement costs minutes,
so it must be paid at most once per machine, not once per process.

Timing uses the same long/short differencing as bench.py because this
platform's ``block_until_ready`` does not reliably block.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from typing import Dict, Tuple

import numpy as np

from .device import chip_spec

__all__ = ["rule_pick", "pick_backend", "clear_cache"]

_cache: Dict[Tuple, str] = {}

# Below this many X elements the run is dispatch-bound; don't spend compiles.
MIN_AUTOTUNE_ELEMENTS = 1 << 21  # ~2M (8 MB f32)
_SHORT, _LONG = 4, 20

_CACHE_ENV = "NMF_TPU_AUTOTUNE_CACHE"


def _disk_path() -> str:
    return os.environ.get(_CACHE_ENV) or os.path.join(
        os.path.expanduser("~"), ".cache", "nmf_tpu", "autotune.json"
    )


def _disk_load() -> dict:
    try:
        with open(_disk_path()) as f:
            data = json.load(f)
        return data if isinstance(data, dict) else {}
    except (OSError, ValueError):
        return {}


def _disk_store(key: str, choice: str) -> None:
    """Best-effort persistent record (atomic replace; concurrent writers may
    drop each other's newest entry, never corrupt the file)."""
    path = _disk_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        data = _disk_load()
        data[key] = choice
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), prefix=".tmp_at_")
        with os.fdopen(fd, "w") as f:
            json.dump(data, f, indent=0, sort_keys=True)
        os.replace(tmp, path)
    except OSError:
        pass  # cache is an optimisation; never fail the solve over it


def _disk_key(kind: str, dtype: str, m: int, k: int, n: int) -> str:
    return f"{kind}|{dtype}|{m}x{k}x{n}"


def clear_cache(disk: bool = False) -> None:
    _cache.clear()
    if disk:
        try:
            os.unlink(_disk_path())
        except OSError:
            pass


def _measure(step_fn, w, h, x) -> float:
    import jax

    @jax.jit
    def run(w, h, x, n):
        return jax.lax.fori_loop(0, n, lambda _, wh: step_fn(wh[0], wh[1], x), (w, h))

    def sync(out):
        for a in out:
            np.asarray(jax.device_get(a[:1, :1]))

    sync(run(w, h, x, 2))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        sync(run(w, h, x, _SHORT))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(run(w, h, x, _LONG))
        tl = time.perf_counter() - t0
        best = min(best, (tl - ts) / (_LONG - _SHORT))
    return best


def rule_pick(m: int, k: int, n: int, matmul_dtype: str = "bfloat16") -> str:
    """Measurement-free backend rule for TPU (see module docstring).

    fp32 note: XLA's HIGHEST-precision f32 dot uses a cheaper multi-pass
    structure than Mosaic's in-kernel f32 matmul, so BOTH f32 policies
    always take the jnp path here (a round-1 small-rank f32 pallas
    exception was removed after measurement); only bfloat16 has fusion-win
    regimes.  Thresholds come from the device table (utils/device.py).

    SETTLED (RETUNE_r05, 2026-08-19 — was CONTESTED through rounds 3-4):
    the single-lane-tile-N bf16 branch used to pick pallas from a round-2
    single-session +17% reading at 4096x350 k=128.  With the >=3-session
    policy finally satisfiable (3 interleaved same-window sessions per
    backend, benchmarks/retune.py), jnp won 1.31x (pooled medians 74,755
    vs 57,110 it/s, loser outside the winner's IQR), so the v5e ChipSpec
    row now sets ``fused_single_tile_n=False`` (utils/device.py) and
    ``backend='auto'`` takes the jnp path on that cell.  The small-rank
    branch (``k <= fused_small_k``) remains measured-pallas.
    """
    from ..ops.pallas import fused_mu

    if not fused_mu.supported(k):
        return "jnp"
    spec = chip_spec()
    single_n_tile = -(-n // 128) * 128 <= spec.block_n
    if matmul_dtype == "bfloat16" and (
        k <= spec.fused_small_k or (single_n_tile and spec.fused_single_tile_n)
    ):
        # fusion's decisive regime: small rank (paper dims +25-30%).  The
        # single-lane-tile-N branch is OFF for v5e since RETUNE_r05 (jnp
        # 1.31x) but kept as a ChipSpec knob for generations where the
        # deepened contraction tile may still win.
        return "pallas"
    # everywhere else XLA wins or ties within measurement noise (flagship
    # bf16 fluctuates +-20% between sessions with no stable winner); prefer
    # the jnp path for stability and use backend='pallas'/'autotune' to
    # override per deployment
    return "jnp"


def pick_backend(config, m: int, k: int, n: int) -> str:
    """Measured pick: 'pallas' or 'jnp' for this shape (TPU callers only).

    The winner is cached per (device kind, dtype, shape) in-process AND on
    disk, so the measurement's compile cost is paid once per machine.
    """
    import jax

    from ..ops.pallas import fused_mu

    if not fused_mu.supported(k) or m * n < MIN_AUTOTUNE_ELEMENTS:
        return rule_pick(m, k, n, config.precision.matmul_dtype)
    devices = jax.devices()
    kind = (getattr(devices[0], "device_kind", "") or "unknown") if devices else "unknown"
    # the winner depends on the HBM traffic too, so the key carries the X
    # storage and state dtypes, not just the matmul policy (bf16 X halves
    # the dominant stream — a winner measured at f32 X does not transfer).
    # int8 configs never reach here: solve() excludes quant from the
    # autotune gate (the jnp dequant path is the measured default).
    dtypes = (
        config.precision.matmul_dtype,
        config.precision.x_dtype,
        config.precision.state_dtype,
    )
    key = (kind, *dtypes, m, k, n)
    if key in _cache:
        return _cache[key]
    dkey = _disk_key(kind, "/".join(dtypes), m, k, n)
    disk = _disk_load()
    if disk.get(dkey) in ("pallas", "jnp"):
        _cache[key] = disk[dkey]
        return disk[dkey]

    import functools

    import jax.numpy as jnp

    from ..ops.mu import mu_step

    rng = np.random.RandomState(0)
    xd = jnp.dtype(config.precision.x_dtype)
    sd = jnp.dtype(config.precision.state_dtype)
    x = jnp.asarray(
        np.maximum(rng.rand(m, n).astype(np.float32), config.eps)
    ).astype(xd)
    w = jnp.asarray(rng.rand(m, k).astype(np.float32)).astype(sd)
    h = jnp.asarray(rng.rand(k, n).astype(np.float32)).astype(sd)
    eps, prec = config.eps, config.precision
    t_pallas = _measure(
        functools.partial(fused_mu.mu_step_fused, eps=eps, precision=prec), w, h, x
    )
    t_jnp = _measure(functools.partial(mu_step, eps=eps, precision=prec), w, h, x)
    choice = "pallas" if t_pallas <= t_jnp else "jnp"
    _cache[key] = choice
    _disk_store(dkey, choice)
    return choice


