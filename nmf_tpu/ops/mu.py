"""Lee-Seung multiplicative updates (KL divergence) — reference semantics.

Mirrors the reference's per-iteration structure exactly (nmf.cu:118-176),
including the re-computation of W@H after H's half-update:

  update_h (nmf.cu:118-146):
      Z    = X / clamp(W @ H)          # matrix_multiply + set_epsilon + vec_div
      sumW = clamp(sum_cols(W))        # (K,) ; W->sum_cols + set_epsilon
      H    = H * (W^T @ Z) / sumW[:,None]   # AtB gemm + col_divide + vec_mul

  update_w (nmf.cu:148-176):
      Z    = X / clamp(W @ H)          # recomputed with the NEW H
      sumH = clamp(sum_rows(H))        # (K,) ; H->sum_rows + set_epsilon
      W    = W * (Z @ H^T) / sumH[None,:]   # ABt gemm + row_divide + vec_mul

Broadcast orientation verified against the kernels: ``col_divide`` divides
element (k, n) of WtZ by sumW[k] (matrix.cu:244-250); ``row_divide`` divides
element (m, k) of ZHt by sumH[k] (matrix.cu:220-224).

TPU-first design notes:
  * GEMMs go to the MXU via ``lax.dot_general`` with float32 accumulation
    (``preferred_element_type``); a :class:`~nmf_tpu.utils.config.Precision`
    policy optionally feeds the MXU bf16 inputs.
  * The elementwise clamp/divide/multiply stages are written as plain jnp so
    XLA fuses them into the surrounding GEMMs; the fully fused Pallas path
    (which never materialises Z = X/(WH) in HBM) is in
    :mod:`nmf_tpu.ops.pallas.fused_mu`.
  * Zero padding + unpadded-extent reductions replace the reference's
    EPS-contaminated padding (SURVEY.md section 2.4): shapes here are logical;
    any MXU-tile padding happens inside XLA/Pallas with exact zeros.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.config import Precision
from .elementwise import EPS, eps_clamp

__all__ = ["matmul", "update_h", "update_w", "mu_step", "mu_step_beta", "mu_step_kl_reg"]

_F32 = jnp.float32


def matmul(
    a: jnp.ndarray,
    b: jnp.ndarray,
    precision: Precision,
    transpose_a: bool = False,
    transpose_b: bool = False,
) -> jnp.ndarray:
    """MXU matmul with optional bf16 inputs and always-f32 accumulation.

    Replaces the reference's three cuBLAS wrappers (matrix.cu:97-125): the
    transpose flags select N/N, T/N, N/T — on TPU these are free layout
    choices inside ``dot_general`` rather than separate kernels.
    """
    mm = jnp.dtype(precision.mm_input_dtype)
    a = a.astype(mm) if a.dtype != mm else a
    b = b.astype(mm) if b.dtype != mm else b
    ca = 0 if transpose_a else a.ndim - 1
    cb = 1 if transpose_b else b.ndim - 2
    # fp32 policy => true fp32 GEMM via HIGHEST (reference-parity: cuBLAS
    # SGEMM; JAX's DEFAULT lowers f32 matmuls to faster low-precision passes,
    # which breaks the 1e-4 parity bar).  float32_fast => HIGH (3-pass bf16
    # split-float); bf16 policy uses the full-rate path deliberately.
    lax_prec = precision.lax_matmul_precision()
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((ca,), (cb,)), ((), ())),
        preferred_element_type=_F32,
        precision=lax_prec,
    )


def _recon_ratio(
    w: jnp.ndarray, h: jnp.ndarray, x: jnp.ndarray, eps: float, precision: Precision
) -> jnp.ndarray:
    """Z = X / clamp(W@H, eps) — nmf.cu:125-131 / 155-161."""
    wh = matmul(w, h, precision)
    return x / eps_clamp(wh, eps)


def update_h(
    w: jnp.ndarray,
    h: jnp.ndarray,
    x: jnp.ndarray,
    eps: float = EPS,
    precision: Precision = Precision(),
) -> jnp.ndarray:
    """H half-update (nmf.cu:118-146). Returns the new H."""
    z = _recon_ratio(w, h, x, eps, precision)
    sum_w = eps_clamp(jnp.sum(w, axis=0, dtype=_F32), eps)        # (K,)
    wtz = matmul(w, z, precision, transpose_a=True)               # (K, N)
    h_new = h * (wtz / sum_w[:, None])
    return h_new.astype(h.dtype)


def update_w(
    w: jnp.ndarray,
    h: jnp.ndarray,
    x: jnp.ndarray,
    eps: float = EPS,
    precision: Precision = Precision(),
) -> jnp.ndarray:
    """W half-update (nmf.cu:148-176). Returns the new W."""
    z = _recon_ratio(w, h, x, eps, precision)
    sum_h = eps_clamp(jnp.sum(h, axis=1, dtype=_F32), eps)        # (K,)
    zht = matmul(z, h, precision, transpose_b=True)               # (M, K)
    w_new = w * (zht / sum_h[None, :])
    return w_new.astype(w.dtype)


def mu_step(
    w: jnp.ndarray,
    h: jnp.ndarray,
    x: jnp.ndarray,
    eps: float = EPS,
    precision: Precision = Precision(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One full MU iteration: H half-update, then W half-update with new H.

    Exactly one reference graph replay (nmf.cu:108-109).
    """
    h = update_h(w, h, x, eps, precision)
    w = update_w(w, h, x, eps, precision)
    return w, h


# ---------------------------------------------------------------------------
# Beta-divergence generalisation (model-zoo extension; beta=1 is NOT routed
# here — the KL path above stays the reference-exact implementation).
# ---------------------------------------------------------------------------


def _beta_ratios(
    w: jnp.ndarray, h: jnp.ndarray, x: jnp.ndarray, beta: float, eps: float,
    precision: Precision,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Numerator/denominator factors for beta-MU: (X*Y^(b-2), Y^(b-1))."""
    y = eps_clamp(matmul(w, h, precision), eps)
    b = float(beta)
    if b == 2.0:
        return x, y
    if b == 1.0:
        return x / y, jnp.ones_like(y)
    if b == 0.0:
        inv = 1.0 / y
        return x * inv * inv, inv
    return x * y ** (b - 2.0), y ** (b - 1.0)


def mu_step_beta(
    w: jnp.ndarray,
    h: jnp.ndarray,
    x: jnp.ndarray,
    beta: float,
    eps: float = EPS,
    precision: Precision = Precision(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One beta-divergence MU iteration (Fevotte & Idier 2011 heuristic MU).

    H <- H * (W^T (X.Y^(b-2))) / (W^T Y^(b-1)),  Y = clamp(W@H)
    W <- W * ((X.Y^(b-2)) H^T) / (Y^(b-1) H^T)   (Y recomputed with new H)

    For beta=1 the denominator W^T 1 equals colsum(W) broadcast — identical
    math to :func:`mu_step` but computed via an extra GEMM; callers should use
    :func:`mu_step` for beta=1 (the solver does).
    """
    num, den = _beta_ratios(w, h, x, beta, eps, precision)
    h_num = matmul(w, num, precision, transpose_a=True)
    if beta == 1.0:
        h_den = eps_clamp(jnp.sum(w, axis=0, dtype=_F32), eps)[:, None]
    else:
        h_den = eps_clamp(matmul(w, den, precision, transpose_a=True), eps)
    h = (h * (h_num / h_den)).astype(h.dtype)

    num, den = _beta_ratios(w, h, x, beta, eps, precision)
    w_num = matmul(num, h, precision, transpose_b=True)
    if beta == 1.0:
        w_den = eps_clamp(jnp.sum(h, axis=1, dtype=_F32), eps)[None, :]
    else:
        w_den = eps_clamp(matmul(den, h, precision, transpose_b=True), eps)
    w = (w * (w_num / w_den)).astype(w.dtype)
    return w, h


def mu_step_kl_reg(
    w: jnp.ndarray,
    h: jnp.ndarray,
    x: jnp.ndarray,
    eps: float = EPS,
    precision: Precision = Precision(),
    l1_w: float = 0.0,
    l1_h: float = 0.0,
    l2_w: float = 0.0,
    l2_h: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """KL MU iteration with L1/L2 factor penalties.

    Standard penalized MU: the penalty gradients join the denominators,

        H <- H * (W^T Z) / (colsum(W)[:,None] + l1_h + l2_h * H)
        W <- W * (Z H^T) / (rowsum(H)[None,:] + l1_w + l2_w * W)

    which keeps nonnegativity and monotone descent of
    KL + l1*||.||_1 + (l2/2)*||.||_F^2.  Zero penalties reduce exactly to
    :func:`mu_step`.
    """
    z = _recon_ratio(w, h, x, eps, precision)
    sum_w = eps_clamp(jnp.sum(w, axis=0, dtype=_F32), eps)
    numer = matmul(w, z, precision, transpose_a=True)
    denom = sum_w[:, None] + l1_h + l2_h * h.astype(_F32)
    h = (h * (numer / denom)).astype(h.dtype)

    z = _recon_ratio(w, h, x, eps, precision)
    sum_h = eps_clamp(jnp.sum(h, axis=1, dtype=_F32), eps)
    numer = matmul(z, h, precision, transpose_b=True)
    denom = sum_h[None, :] + l1_w + l2_w * w.astype(_F32)
    w = (w * (numer / denom)).astype(w.dtype)
    return w, h
