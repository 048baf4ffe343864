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
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

__all__ = ["quantize_columns", "dequantize", "quantize_columns_np"]

_F32 = jnp.float32


def quantize_columns(x: jnp.ndarray, eps: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize a nonnegative (already eps-clamped) matrix to uint8 codes and
    per-column f32 scales such that ``x ~= q * scales[None, :]``.

    Rounding is half-UP (floor(v + 0.5)) — marginally cheaper than
    round-half-even on both NumPy and XLA and bit-identical between the two
    implementations (the .5 tie direction is irrelevant to the 1/510-step
    error bound)."""
    xf = x.astype(_F32)
    colmax = jnp.max(xf, axis=0)
    scales = jnp.maximum(colmax, eps) / 255.0
    # reciprocal-multiply (not divide): the exact op sequence of the NumPy
    # twin, so codes are bit-identical between the two implementations
    inv = (jnp.float32(1.0) / scales)[None, :]
    q = jnp.clip(jnp.floor(xf * inv + 0.5), 0, 255).astype(jnp.uint8)
    return q, scales


def dequantize(q: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """Reconstruct f32 values (clamped below by scales/255-grade floor is NOT
    reapplied here; callers clamp where the reference clamps)."""
    return q.astype(_F32) * scales[None, :]


def quantize_columns_np(x, eps: float):
    """NumPy twin of :func:`quantize_columns` (host-side block quantization
    for the out-of-core streaming loader; columns never span blocks, so
    per-block column scales ARE the global per-column scales).  Written as
    few full-matrix passes as possible — this runs on the streaming hot
    path's host side."""
    import numpy as np

    xf = np.asarray(x, np.float32)
    scales = np.maximum(xf.max(axis=0), np.float32(eps)) / np.float32(255.0)
    v = xf * (np.float32(1.0) / scales)[None, :]
    v += np.float32(0.5)
    np.clip(v, 0, 255, out=v)
    return v.astype(np.uint8), scales
