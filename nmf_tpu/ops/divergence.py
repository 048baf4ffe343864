"""Divergence (cost) functions for NMF.

The reference's KL divergence is specified by its (dead, but authoritative —
see SURVEY.md section 2.1/C11) ``reduce1d_div`` kernel at cuda/matrix.cu:592:

    D(X || Y) = sum( x * (log(x) - log(y)) - x + y )

with ``y = W@H`` clamped to EPS.  The README-era API (README.md:51) stopped
when the *relative change* of this cost fell below ``CONVERGE_THRESH``.

We also provide the Euclidean (Frobenius) and Itakura-Saito costs and the
general beta-divergence family (beta = 2 -> Euclidean, 1 -> KL, 0 -> IS) used
by the extended model zoo in :mod:`nmf_tpu.models.beta`.

All reductions accumulate in float32 at minimum (the KL sum over ~1.8e6 log
terms at paper dims does not survive bf16; see SURVEY.md section 7 step 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .elementwise import EPS, eps_clamp

__all__ = [
    "kl_divergence",
    "kl_divergence_from_recon",
    "euclidean_cost",
    "itakura_saito",
    "beta_divergence",
]


def _f32(x: jnp.ndarray) -> jnp.ndarray:
    return x.astype(jnp.float32) if x.dtype != jnp.float32 else x


def _recon(w: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """W@H in true fp32 (HIGHEST: cost evaluation must not be low-precision)."""
    return jnp.dot(
        _f32(w), _f32(h),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def kl_divergence_from_recon(x: jnp.ndarray, y: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """Generalized KL divergence given a precomputed reconstruction ``y``.

    Formula per cuda/matrix.cu:592: sum(x*(log x - log y) - x + y), with y
    clamped to eps (x is assumed already clamped at load, nmf.cu:211).  For
    callers that skip the load-time clamp, genuine x == 0 entries use the
    x->0 limit of x*log(x/y) (zero, not NaN) and still contribute their +y
    mass — matching the fused Pallas cost kernel.
    """
    x = _f32(x)
    y = eps_clamp(_f32(y), eps)
    xlog = jnp.where(x > 0, x * (jnp.log(x) - jnp.log(y)), 0.0)
    return jnp.sum(xlog - x + y)


def kl_divergence(x: jnp.ndarray, w: jnp.ndarray, h: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """Generalized KL divergence D(X || W@H)."""
    y = _recon(w, h)
    return kl_divergence_from_recon(x, y, eps)


def euclidean_cost(x: jnp.ndarray, w: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """0.5 * ||X - W@H||_F^2 (beta = 2 member of the family)."""
    y = _recon(w, h)
    d = _f32(x) - y
    return 0.5 * jnp.sum(d * d)


def itakura_saito(x: jnp.ndarray, w: jnp.ndarray, h: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """Itakura-Saito divergence sum(x/y - log(x/y) - 1) (beta = 0)."""
    y = eps_clamp(_recon(w, h), eps)
    r = eps_clamp(_f32(x), eps) / y
    return jnp.sum(r - jnp.log(r) - 1.0)


def beta_divergence(
    x: jnp.ndarray, w: jnp.ndarray, h: jnp.ndarray, beta: float, eps: float = EPS
) -> jnp.ndarray:
    """General beta-divergence D_beta(X || W@H).

    beta=2 -> Euclidean, beta=1 -> generalized KL, beta=0 -> Itakura-Saito.
    ``beta`` must be a static Python float (it selects the formula at trace
    time; a traced beta would force the expensive general branch everywhere).
    """
    if beta == 2.0:
        return euclidean_cost(x, w, h)
    if beta == 1.0:
        return kl_divergence(x, w, h, eps)
    if beta == 0.0:
        return itakura_saito(x, w, h, eps)
    xf = eps_clamp(_f32(x), eps)
    y = eps_clamp(_recon(w, h), eps)
    b = float(beta)
    term = (
        xf ** b + (b - 1.0) * y ** b - b * xf * y ** (b - 1.0)
    ) / (b * (b - 1.0))
    return jnp.sum(term)
