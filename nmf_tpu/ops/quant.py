"""Quantized X storage: uint8 codes + per-column f32 scales.

For HBM-bandwidth-bound shapes (small rank — the reference's own regime) the
MU iteration time is dominated by reading X twice per iteration; storing X
as uint8 cuts that stream 4x vs f32 (2x vs bf16).  The layout is
column-scaled:

    q[i, j] = round(x[i, j] / s[j] * 255),   s[j] = max_i x[i, j]

so each column's full dynamic range maps onto 0..255 (NMF data is
nonnegative; columns are time frames in the spectrogram workloads, whose
per-frame energy varies by orders of magnitude — a global scale would crush
quiet frames).  Dequantization is one multiply, fused in-register inside the
Pallas kernels (the "dequant-in-register" pattern) and into the XLA fusion
on the jnp path; the dequantized M x N matrix never exists in HBM.

Accuracy: absolute error <= s[j]/510 per entry — relative error ~0.2% at a
column's peak but unbounded for entries far below it, so this is an OPT-IN
storage policy (``Precision(x_dtype="int8")``) for bandwidth-extreme cases,
not a default.  The KL cost/convergence then measures the quantized data —
exactly the objective the updates are descending on.

Cross-platform bitwise parity (the serving contract): the host (NumPy)
twins and the in-program (jnp) quantizers must emit IDENTICAL codes, on
every backend, because the serving formats compare host-quantized streams
against in-program quantization md5-for-md5 (benchmarks/e2e_cli.py 7b-7d).
``floor(x * (1/s) + 0.5)`` alone does NOT deliver that on TPU — measured
2026-08-19 on TPU v5 lite (E2E session 20260819_042017): XLA:TPU's f32
divide is not guaranteed correctly rounded and the multiply-add may
contract to an FMA, so a handful of codes near rounding boundaries came
out one off vs the NumPy twin (same final cost to 6 digits, different
md5).  The canonical definition is therefore comparison-based: q is the
integer satisfying ``f32(s*(q-0.5)) <= x < f32(s*(q+0.5))`` — only
IEEE-correctly-rounded ops (mul, add, compare), which CPU and TPU VPU
agree on bit-for-bit.  ``_canonical_fixup`` nudges the fast approximate
``q0`` (always within +-1 of canonical, since 1/s is off by at most a few
ulps and q <= 255 << 2^24) onto that definition in one step, identically
in both twins.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

__all__ = [
    "quantize_columns",
    "quantize_rowblocks",
    "quantize_policy",
    "dequantize",
    "dequantize_rows",
    "quantize_columns_np",
    "quantize_rowblocks_np",
    "quantize_policy_np",
]

_F32 = jnp.float32


def _canonical_fixup(xf, q0, s_b, np_mod):
    """Move the approximate code ``q0`` (f32 integers, within +-1 of
    canonical) onto the canonical comparison-based definition

        q = the integer with  f32(s*(q-0.5)) <= x < f32(s*(q+0.5))

    using only IEEE-correctly-rounded f32 ops (mul/add/compare), so the
    result is bit-identical across NumPy, XLA:CPU, and XLA:TPU regardless
    of how accurately ``1/s`` was computed or whether the caller's
    multiply-add contracted to an FMA (module docstring; measured TPU
    divergence 2026-08-19).  One step suffices: |q0 - q| <= 1 because the
    reciprocal is off by at most a few ulps and q <= 255 << 2^24.  The
    thresholds are strictly increasing in q (correctly-rounded positive
    mul is monotone; adjacent half-steps can't collapse at q <= 255.5
    given f32's 2^-24 relative spacing), so exactly one of the two
    adjustments can fire.  ``np_mod`` is jnp or numpy — the SAME op
    sequence runs in both twins."""
    one = np_mod.float32(1.0)
    half = np_mod.float32(0.5)
    hi = s_b * (q0 + half)   # threshold into q0+1 territory
    lo = s_b * (q0 - half)   # threshold below which q0-1 owns x
    up = np_mod.where(xf >= hi, one, np_mod.float32(0.0))
    dn = np_mod.where(xf < lo, one, np_mod.float32(0.0))
    return q0 + up - dn


def quantize_columns(x: jnp.ndarray, eps: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize a nonnegative (already eps-clamped) matrix to uint8 codes and
    per-column f32 scales such that ``x ~= q * scales[None, :]``.

    Rounding is half-UP (floor(v + 0.5)) — marginally cheaper than
    round-half-even on both NumPy and XLA, with the boundary canonicalized
    by :func:`_canonical_fixup` so codes are bit-identical between the
    NumPy twin and every XLA backend (the .5 tie direction is irrelevant
    to the 1/510-step error bound)."""
    xf = x.astype(_F32)
    colmax = jnp.max(xf, axis=0)
    # explicit reciprocal-MULTIPLY, not /255: XLA rewrites constant division
    # to reciprocal multiplication anyway (measured: `c / 255.0` lowers to
    # `c * f32(1/255)`), so spelling the multiply keeps host (NumPy twin)
    # and device scales bit-identical without leaning on that rewrite
    scales = jnp.maximum(colmax, eps) * jnp.float32(1.0 / 255.0)
    # fast approximate pass (reciprocal-multiply), then the canonical
    # comparison fixup — the divide's rounding no longer matters
    inv = (jnp.float32(1.0) / scales)[None, :]
    q0 = jnp.floor(xf * inv + jnp.float32(0.5))
    q1 = _canonical_fixup(xf, q0, scales[None, :], jnp)
    q = jnp.clip(q1, 0, 255).astype(jnp.uint8)
    return q, scales


def quantize_rowblocks(
    x: jnp.ndarray, eps: float, rows_per_block: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(row-block, column) quantization: uint8 codes + (R, N) f32 scales
    where R = ceil(M / rows_per_block) and ``x[i, j] ~= q[i, j] *
    scales[i // rows_per_block, j]``.

    The finer granularity bounds each entry's error by ITS BLOCK's column
    peak / 510 instead of the whole column's — for spectrogram-like data
    whose magnitude varies along the frequency (row) axis this keeps quiet
    rows accurate where per-column scales crush them (the per-tile analog
    lives in models/sparse_tiled for tile-sparse X).  Opt-in via
    ``Precision(x_dtype='int8', x_quant_rows=...)``; jnp path (single
    device, batched, and the mesh solvers — parallel.sharded._quant_specs
    replicates the (R, N) table's block rows over 'mr').

    ``rows_per_block`` is normalized to ``ceil(M / ceil(M / rows_per_block))``
    (same block count, blocks as even as possible) so :func:`dequantize` can
    re-derive the block size from shapes alone — without this, M=10 with
    rows_per_block=8 would quantize as blocks (8, 2) but dequantize as
    (5, 5), scaling rows 5-7 by the wrong block's peak.
    """
    xf = x.astype(_F32)
    m, n = xf.shape
    r = -(-m // int(rows_per_block))
    rb = -(-m // r)  # normalized: dequantize recomputes exactly this
    pad = r * rb - m
    xp = jnp.pad(xf, ((0, pad), (0, 0))) if pad else xf
    blocks = xp.reshape(r, rb, n)
    # reciprocal-multiply, not /255 — see quantize_columns
    scales = jnp.maximum(blocks.max(axis=1), eps) * jnp.float32(1.0 / 255.0)  # (R, N)
    inv = (jnp.float32(1.0) / scales)[:, None, :]
    q0 = jnp.floor(blocks * inv + jnp.float32(0.5))
    q1 = _canonical_fixup(blocks, q0, scales[:, None, :], jnp)
    q = jnp.clip(q1, 0, 255).astype(jnp.uint8).reshape(r * rb, n)[:m]
    return q, scales


def quantize_policy(x: jnp.ndarray, eps: float, x_quant_rows: int):
    """Dispatch on the Precision knob: per-column (x_quant_rows == 0) or
    per-row-block scales.  One call site per solver entry."""
    if x_quant_rows:
        return quantize_rowblocks(x, eps, x_quant_rows)
    return quantize_columns(x, eps)


def dequantize(q: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """Reconstruct f32 values (clamped below by scales/255-grade floor is NOT
    reapplied here; callers clamp where the reference clamps).

    ``scales`` dispatches the layout: 1-D (N,) = per-column; 2-D (R, N) =
    per-row-block (each code row i scales by ``scales[i // ceil(M/R)]``) —
    every consumer that funnels through this one function supports both.

    With 2-D scales ``q`` must span the FULL quantized row extent: the block
    size is derived from ``q``'s own row count, which a row subset cannot
    recover (rows would silently pick up the wrong block's scale).  For a
    row slice use :func:`dequantize_rows` with the slice offset and the full
    extent — the sharded mesh path does exactly that.
    """
    return dequantize_rows(q, scales, 0, q.shape[0])


def dequantize_rows(q, scales, row_offset, m_total: int) -> jnp.ndarray:
    """Dequantize codes that are the row slice ``[row_offset, row_offset+m)``
    of a full quantized matrix with ``m_total`` rows.

    The per-row-block size is ``ceil(m_total / R)`` — it must come from the
    FULL extent the matrix was quantized at, never from the slice's own row
    count (deriving it locally mis-scales every row past the first block,
    silently).  ``row_offset`` may be traced (the mesh path passes
    ``axis_index * m_loc``); ``m_total`` must be static.  1-D per-column
    scales are row-invariant, so the offset is irrelevant there.
    """
    if scales.ndim == 1:
        return q.astype(_F32) * scales[None, :]
    m = q.shape[0]
    rb = -(-int(m_total) // scales.shape[0])
    idx = (row_offset + jnp.arange(m)) // rb
    return q.astype(_F32) * scales[idx, :]


def quantize_columns_np(x, eps: float):
    """NumPy twin of :func:`quantize_columns` (host-side block quantization
    for the out-of-core streaming loader; columns never span blocks, so
    per-block column scales ARE the global per-column scales).  Written as
    few full-matrix passes as possible — this runs on the streaming hot
    path's host side."""
    import numpy as np

    xf = np.asarray(x, np.float32)
    # reciprocal-multiply, not /255 — see quantize_columns
    scales = np.maximum(xf.max(axis=0), np.float32(eps)) * np.float32(1.0 / 255.0)
    v = xf * (np.float32(1.0) / scales)[None, :]
    v += np.float32(0.5)
    np.floor(v, out=v)
    q1 = _canonical_fixup(xf, v, scales[None, :], np)
    np.clip(q1, 0, 255, out=q1)
    return q1.astype(np.uint8), scales


def quantize_rowblocks_np(x, eps: float, rows_per_block: int):
    """NumPy twin of :func:`quantize_rowblocks` (host-side block quantization
    for the streaming loaders: a streamed column chunk spans ALL M rows, so
    its per-(row-block, column) scales are exactly the in-memory layout's
    scales for those columns).  Same op sequence as the jnp version, so
    codes/scales are bit-identical between the two implementations."""
    import numpy as np

    xf = np.asarray(x, np.float32)
    m, n = xf.shape
    r = -(-m // int(rows_per_block))
    rb = -(-m // r)  # normalized: dequantize recomputes exactly this
    pad = r * rb - m
    xp = np.pad(xf, ((0, pad), (0, 0))) if pad else xf
    blocks = xp.reshape(r, rb, n)
    # reciprocal-multiply, not /255 — see quantize_columns
    scales = np.maximum(blocks.max(axis=1), np.float32(eps)) * np.float32(1.0 / 255.0)
    v = blocks * (np.float32(1.0) / scales)[:, None, :]
    v += np.float32(0.5)
    np.floor(v, out=v)
    q1 = _canonical_fixup(blocks, v, scales[:, None, :], np)
    np.clip(q1, 0, 255, out=q1)
    return q1.astype(np.uint8).reshape(r * rb, n)[:m], scales


def quantize_policy_np(x, eps: float, x_quant_rows: int):
    """NumPy twin of :func:`quantize_policy` (the streaming loaders' host
    side): per-column when ``x_quant_rows == 0``, else per-row-block."""
    if x_quant_rows:
        return quantize_rowblocks_np(x, eps, x_quant_rows)
    return quantize_columns_np(x, eps)
