"""HALS (Hierarchical Alternating Least Squares) for Frobenius NMF.

A second solver family beyond the reference's multiplicative updates:
coordinate descent over rank-1 factors (Cichocki & Phan 2009), the same
algorithm class as scikit-learn's default ``solver='cd'``.  Per outer
iteration it costs the same 4-GEMM order as MU (the K x K Gram matrices plus
K sequential row/column refinements) but typically needs several times fewer
iterations to reach a given Frobenius cost, and unlike MU it can introduce
exact zeros (and escape them).

TPU mapping: the Gram/cross products W^T W, W^T X, H H^T, X H^T hit the MXU;
the K sequential rank-1 refinements are a ``lax.fori_loop`` of VPU
row/column updates (K is small, so this tail is cheap).  Only beta=2
(Frobenius) — for KL, MU is the standard and remains the default.

Distributed note: HALS's sequential sweep runs over the RANK axis, which is
replicated in the canonical mesh layout (parallel/mesh.py) — so the sweeps
themselves are embarrassingly parallel over the sharded M/N axes.  The only
cross-device data are the Gram/cross products, which psum exactly like the
MU numerators; :func:`cd_sweep_h` / :func:`cd_sweep_w` take those products
as inputs so the single-device, sharded, and streaming solvers share one
sweep definition.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.config import Precision
from .elementwise import eps_clamp
from .mu import matmul

__all__ = ["hals_step", "cd_sweep_h", "cd_sweep_w"]

_F32 = jnp.float32

# The sweep-interior dots run on f32 inputs and must stay true f32: JAX's
# DEFAULT lowers f32 dots to fast low-precision passes on TPU, which would
# silently degrade every coordinate-descent gradient row (the Gram products
# feeding the sweep already went through ops.mu.matmul's policy; the sweep
# is O(K) of the work, so exactness here is free).  CPU CI can't catch a
# regression of this — DEFAULT f32 dots are exact there.
_HIGHEST = jax.lax.Precision.HIGHEST


def cd_sweep_h(h, wtx, wtw, eps: float) -> jnp.ndarray:
    """Sweep H's rows once by coordinate descent.

    ``wtx`` = W^T X (K x N) and ``wtw`` = W^T W (K x K) must be GLOBAL
    products; ``h`` may be the full matrix or any column shard — each row
    update is elementwise over columns, so the sweep needs no communication.
    """
    k_rank = h.shape[0]

    def body(k, hh):
        # residual gradient row against the CURRENT h (already-updated rows
        # of this sweep included — that's what makes it coordinate descent)
        grad = wtx[k] - jnp.matmul(wtw[k], hh, precision=_HIGHEST)   # (N,)
        denom = eps_clamp(wtw[k, k], eps)
        row = jnp.maximum(hh[k] + grad / denom, 0.0)
        return hh.at[k].set(row)

    return jax.lax.fori_loop(0, k_rank, body, h.astype(_F32)).astype(h.dtype)


def cd_sweep_w(w, xht, hht, eps: float) -> jnp.ndarray:
    """Sweep W's columns once by coordinate descent.

    ``xht`` = X H^T (M x K) and ``hht`` = H H^T (K x K) must be GLOBAL
    products; ``w`` may be the full matrix or any row shard.
    """
    k_rank = w.shape[1]

    def body(k, ww):
        grad = xht[:, k] - jnp.matmul(ww, hht[:, k], precision=_HIGHEST)  # (M,)
        denom = eps_clamp(hht[k, k], eps)
        col = jnp.maximum(ww[:, k] + grad / denom, 0.0)
        return ww.at[:, k].set(col)

    return jax.lax.fori_loop(0, k_rank, body, w.astype(_F32)).astype(w.dtype)


def _update_h_hals(w, h, x, eps: float, precision: Precision) -> jnp.ndarray:
    # matmul always returns f32 (preferred_element_type) — no casts needed
    wtx = matmul(w, x, precision, transpose_a=True)     # (K, N)
    wtw = matmul(w, w, precision, transpose_a=True)     # (K, K)
    return cd_sweep_h(h, wtx, wtw, eps)


def _update_w_hals(w, h, x, eps: float, precision: Precision) -> jnp.ndarray:
    xht = matmul(x, h, precision, transpose_b=True)     # (M, K)
    hht = matmul(h, h, precision, transpose_b=True)     # (K, K)
    return cd_sweep_w(w, xht, hht, eps)


def hals_step(
    w: jnp.ndarray,
    h: jnp.ndarray,
    x: jnp.ndarray,
    eps: float,
    precision: Precision = Precision(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One HALS outer iteration: sweep H's rows, then W's columns."""
    h = _update_h_hals(w, h, x, eps, precision)
    w = _update_w_hals(w, h, x, eps, precision)
    return w, h
