"""Pallas TPU kernels for the tile-sparse (block-sparse) MU numerators.

The XLA path (models/sparse_tiled.py) runs the occupied-tile sweep as a
``lax.scan`` of batched GEMMs with scatter-adds into per-block accumulators.
That is MXU-driven but pays: (a) the gathered factor-block batches and the
per-chunk contributions round-trip HBM, (b) the scatter-add is a separate
fusion, (c) scan serializes at chunk granularity.  These kernels instead use
the canonical TPU block-sparse pattern — **scalar-prefetched block ids drive
the BlockSpec index maps** — so Mosaic's automatic pipeline DMAs exactly the
three (x-tile, W row-block, H col-block) operands each grid step while the
previous step computes, and the quotient Z and both contractions stay in
VMEM/registers.

Output accumulation uses grid-order revisiting: the sweep list is SORTED by
the output block id (col block for the H numerator, row block for the W
numerator), so every output block is visited in one contiguous run of grid
steps; the kernel initialises on the run's first step and accumulates on the
rest, and Mosaic writes the block back once when the run ends.  Output
blocks with no occupied tiles get one sentinel entry (``perm = -1``): its
index map clamps to tile 0, and the kernel writes zeros instead of the
contribution — initialising the block without a physical zero tile (see
``sweep_plan``).

Numerics are identical to the XLA path (same clamp site, f32 accumulation);
``float32_fast`` reuses the manual 3-pass bf16 split from fused_mu (Mosaic
cannot lower lax.Precision.HIGH).  Alignment: requires bm % 8 == 0 and
bn % 128 == 0 (f32 sublane/lane quanta) and K <= the device's fused-rank
ceiling — callers fall back to the XLA path otherwise (every Pallas kernel
keeps a jnp fallback by design).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.config import Precision
from ...utils.device import chip_spec
from .fused_mu import _kdot, _prep_operand

__all__ = ["supported", "preferred", "sweep_plan", "h_numerator", "w_numerator"]

_F32 = jnp.float32


def supported(k: int, bm: int, bn: int, precision: Precision) -> bool:
    """Whether the Pallas tile-sparse sweep applies to this problem.

    ``bm`` slices the W/state blocks too, so a bfloat16 state dtype raises
    the sublane quantum from 8 (f32) to 16 — an 8-row bf16 block would hand
    Mosaic a sub-tile row boundary.
    """
    bm_quantum = 16 if jnp.dtype(precision.state_dtype) == jnp.bfloat16 else 8
    return (
        jax.default_backend() == "tpu"
        and k <= chip_spec().max_fused_k
        and bm % bm_quantum == 0
        and bn % 128 == 0
        and precision.x_dtype != "int8"
    )


def preferred(k: int, bm: int, bn: int, precision: Precision) -> bool:
    """Coarse auto-backend rule (v5e-measured, intentionally conservative —
    shared-chip noise is +-2x, so no fine thresholds): the kernel beats the
    XLA scan on every f32 tier (~1.15-1.35x at 128x128 tiles), while at bf16
    the per-step MXU work only dominates the grid overhead once the rank is
    large (measured: 0.82x at K=128, ~1.0x at 256, 1.23x at 512).

    SETTLED (RETUNE_r05, 2026-08-19 — was contested rounds 3-4): three
    fresh k-interleaved sessions per cell under the current occ=0.125
    labeling confirm every branch of this rule — pooled medians have the
    scan (jnp-c64) ahead 1.13x at k=128 and 1.02x at k=256, and the kernel
    ahead 1.17x at k=384 — so the bf16 ``k >= 384`` crossover stands ON
    MEASUREMENT now, not on the old single-session readings.  Evidence:
    RETUNE_r05.json + benchmarks/archive.jsonl."""
    if not supported(k, bm, bn, precision):
        return False
    if precision.matmul_dtype == "bfloat16":
        return k >= 384
    return True


def sweep_plan(
    rows: np.ndarray, cols: np.ndarray, n_out_blocks: int, by: str
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build one sweep's (perm, row_id, col_id) arrays, host-side.

    Sorts the occupied tiles by the OUTPUT block id (``by`` = 'col' for the
    H sweep, 'row' for the W sweep) so output blocks are revisited in
    contiguous grid runs, and appends one ``perm = -1`` sentinel entry per
    output block with no tiles — the kernel writes zeros there, initialising
    the block without any tile payload.
    """
    rows = np.asarray(rows, np.int32)
    cols = np.asarray(cols, np.int32)
    key = cols if by == "col" else rows
    missing = np.setdiff1d(
        np.arange(n_out_blocks, dtype=np.int32), key, assume_unique=False
    )
    perm = np.concatenate(
        [np.arange(len(key), dtype=np.int32),
         np.full(len(missing), -1, np.int32)]
    )
    rr = np.concatenate([rows, missing if by == "row" else np.zeros_like(missing)])
    cc = np.concatenate([cols, missing if by == "col" else np.zeros_like(missing)])
    order = np.argsort(cc if by == "col" else rr, kind="stable")
    return (
        perm[order],
        rr[order].astype(np.int32),
        cc[order].astype(np.int32),
    )


def _sweep_kernel(
    perm_ref, rb_ref, cb_ref, x_ref, w_ref, h_ref, out_ref,
    *, eps, mm_dtype, lax_prec, split3, target,
):
    t = pl.program_id(0)
    key_ref = cb_ref if target == "h" else rb_ref
    prev = key_ref[jnp.maximum(t - 1, 0)]
    first = jnp.logical_or(t == 0, key_ref[t] != prev)
    # sentinel entries (perm < 0) exist only to zero-initialise output
    # blocks with no tiles; they are always the single entry of their run
    pad = perm_ref[t] < 0

    w_blk = _prep_operand(w_ref[:], mm_dtype, split3)          # (bm, K)
    h_blk = _prep_operand(h_ref[:], mm_dtype, split3)          # (K, bn)
    y = _kdot(w_blk, h_blk, (((1,), (0,)), ((), ())), lax_prec, split3)
    z = x_ref[0].astype(_F32) / jnp.maximum(y, eps)            # (bm, bn)
    zp = _prep_operand(z, mm_dtype, split3)
    if target == "h":
        # W_i^T @ Z_t -> (K, bn), this tile's col-block contribution
        contrib = _kdot(w_blk, zp, (((0,), (0,)), ((), ())), lax_prec, split3)
    else:
        # Z_t @ H_j^T -> (bm, K)
        contrib = _kdot(zp, h_blk, (((1,), (1,)), ((), ())), lax_prec, split3)
    contrib = jnp.where(pad, jnp.zeros_like(contrib), contrib)

    @pl.when(first)
    def _():
        out_ref[:] = contrib

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] += contrib


def _sweep_call(w, h, tiles, perm, rb, cb, eps, precision, target, interpret):
    if tiles.shape[0] == 0:
        # an all-sentinel plan would index block 0 of a zero-length tiles
        # array (the sentinel index map clamps to 0) — an out-of-bounds DMA.
        # tiles_from_coo keeps at least one (zero) tile; direct callers must
        # do the same.
        raise ValueError(
            "tiles array is empty: the sweep needs at least one tile "
            "(an all-zero X should keep one zero tile — see tiles_from_coo)"
        )
    k = w.shape[1]
    bm, bn = tiles.shape[1:]
    mb, nb = w.shape[0] // bm, h.shape[1] // bn
    mm_dtype = jnp.dtype(precision.mm_input_dtype)
    split3 = precision.matmul_dtype == "float32_fast"
    lax_prec = (
        jax.lax.Precision.DEFAULT if split3 else precision.lax_matmul_precision()
    )
    steps = perm.shape[0]
    kernel = functools.partial(
        _sweep_kernel,
        eps=float(eps), mm_dtype=mm_dtype, lax_prec=lax_prec,
        split3=split3, target=target,
    )
    if target == "h":
        out_shape = jax.ShapeDtypeStruct((k, nb * bn), _F32)
        out_spec = pl.BlockSpec(
            (k, bn), lambda t, p, r, c: (0, c[t]), memory_space=pltpu.VMEM
        )
    else:
        out_shape = jax.ShapeDtypeStruct((mb * bm, k), _F32)
        out_spec = pl.BlockSpec(
            (bm, k), lambda t, p, r, c: (r[t], 0), memory_space=pltpu.VMEM
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(
                # sentinel (-1) entries clamp to tile 0; the kernel zeroes
                # their contribution
                (1, bm, bn), lambda t, p, r, c: (jnp.maximum(p[t], 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bm, k), lambda t, p, r, c: (r[t], 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k, bn), lambda t, p, r, c: (0, c[t]), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=out_spec,
    )
    tile_flops = 2 * bm * bn * k * (2 if not split3 else 6)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=steps * tile_flops,
            bytes_accessed=steps
            * (bm * bn * tiles.dtype.itemsize + (bm * k + k * bn + k * bn) * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(perm, rb, cb, tiles, w, h)


def h_numerator(
    w, h, tiles, perm, rb, cb, eps: float,
    precision: Precision = Precision(), interpret: bool = False,
):
    """W^T @ (X / clamp(W@H)) over occupied tiles -> (K, Np) f32.

    ``(perm, rb, cb)`` must come from ``sweep_plan(..., by='col')``; W/H are
    the block-grid-padded factors (models/sparse_tiled.py pads them).
    """
    return _sweep_call(w, h, tiles, perm, rb, cb, eps, precision, "h", interpret)


def w_numerator(
    w, h, tiles, perm, rb, cb, eps: float,
    precision: Precision = Precision(), interpret: bool = False,
):
    """(X / clamp(W@H)) @ H^T over occupied tiles -> (Mp, K) f32.

    ``(perm, rb, cb)`` must come from ``sweep_plan(..., by='row')``.
    """
    return _sweep_call(w, h, tiles, perm, rb, cb, eps, precision, "w", interpret)
