"""Elementwise primitives with the reference's exact epsilon semantics.

The reference defines ``EPS = 2.2204E-16f`` (cuda/matrix.cu:10) and applies it
as a **clamp** — ``if (a[i] < EPS) a[i] = EPS`` (cuda/matrix.cu:182-188) — not
an add (the bundled paper says "added"; the code clamps; we replicate the
code, per SURVEY.md section 2.4).

Clamp sites in the reference iteration (replicated by :mod:`nmf_tpu.ops.mu`):
  * input matrices at load                      (nmf.cu:211)
  * the reconstruction W@H before dividing      (nmf.cu:128, 158)
  * the column-sums of W / row-sums of H        (nmf.cu:135, 165)

XLA fuses these jnp ops into neighbouring matmuls/divides on TPU; the fully
fused HBM-avoiding path is in :mod:`nmf_tpu.ops.pallas`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["EPS", "eps_clamp", "element_divide", "element_multiply"]

# float32(2.2204e-16) — bit-identical to the reference constant
# (cuda/matrix.cu:10).  This is DBL_EPSILON rounded to f32, i.e. ~2**-52,
# far below f32's own epsilon; it exists to keep logs/divides finite.
EPS = np.float32(2.2204e-16)


def eps_clamp(x: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """``max(x, eps)`` elementwise — the reference's ``set_epsilon``.

    NaN handling: ``jnp.maximum`` propagates NaN, while the reference's
    ``a[i] < EPS`` comparison is false for NaN (leaves NaN in place) — both
    keep NaN, so behaviour agrees.
    """
    return jnp.maximum(x, jnp.asarray(eps, dtype=x.dtype))


def element_divide(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """c = a / b elementwise (reference ``vec_div``, cuda/matrix.cu:146-152)."""
    return a / b


def element_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """c = a * b elementwise (reference ``vec_mul``, cuda/matrix.cu:174-180)."""
    return a * b
