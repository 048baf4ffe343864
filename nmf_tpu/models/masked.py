"""Masked (missing-data) NMF: factorize only the observed entries of X.

Extension beyond the reference (which has no masking): the standard weighted
KL multiplicative updates (Zhang et al. 2006 / Ho 2008) where a binary or
real-valued weight matrix ``M`` selects/weights observations:

    H <- H * (W^T (M .* X ./ clamp(W@H))) / (W^T M)
    W <- W * ((M .* X ./ clamp(W@H)) H^T) / (M H^T)

With ``M = 1`` everywhere this reduces exactly to the reference updates
(W^T 1 = colsum(W), 1 H^T = rowsum(H)).  Monotone non-increase of the masked
KL divergence sum(M .* (x log(x/y) - x + y)) holds by the usual MM argument.

Uses the jnp/XLA path (the extra GEMMs make per-shape fusion less clear-cut;
XLA fuses the mask multiplies into the dots).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.elementwise import EPS, eps_clamp
from ..ops.mu import matmul
from ..utils.config import Precision, SolveConfig
from .solver import SolveResult, run_checked_loop

__all__ = ["mu_step_masked", "masked_kl", "solve_masked", "solve_masked_h_only"]

_F32 = jnp.float32


def mu_step_masked(
    w, h, x, mask, eps: float = EPS, precision: Precision = Precision(),
    l1_w: float = 0.0, l1_h: float = 0.0, l2_w: float = 0.0, l2_h: float = 0.0,
):
    """One masked MU iteration (H half then W half, reference ordering).

    Optional L1/L2 penalties join the denominators exactly as in
    :func:`nmf_tpu.ops.mu.mu_step_kl_reg` (the mask-GEMM denominator is
    clamped first, then the penalty gradients are added); zero penalties
    reduce to the plain masked step.
    """
    z = mask * (x / eps_clamp(matmul(w, h, precision), eps))
    numer = matmul(w, z, precision, transpose_a=True)
    denom = (
        eps_clamp(matmul(w, mask, precision, transpose_a=True), eps)
        + l1_h + l2_h * h.astype(_F32)
    )
    h = (h * (numer / denom)).astype(h.dtype)

    z = mask * (x / eps_clamp(matmul(w, h, precision), eps))
    numer = matmul(z, h, precision, transpose_b=True)
    denom = (
        eps_clamp(matmul(mask, h, precision, transpose_b=True), eps)
        + l1_w + l2_w * w.astype(_F32)
    )
    w = (w * (numer / denom)).astype(w.dtype)
    return w, h


def masked_kl(
    x, w, h, mask, eps: float = EPS,
    l1_w: float = 0.0, l1_h: float = 0.0, l2_w: float = 0.0, l2_h: float = 0.0,
) -> jnp.ndarray:
    """Masked KL divergence (observed entries only) + optional penalties."""
    y = eps_clamp(matmul(w, h, Precision()), eps)
    xf = x.astype(_F32)
    # x -> 0 limit of x*log(x/y) is 0 (keeps the '+y' mass finite for exact
    # zeros, e.g. dequantized int8 data) — same convention as kl_divergence
    xlog = jnp.where(xf > 0, xf * (jnp.log(xf) - jnp.log(y)), 0.0)
    total = jnp.sum(mask * (xlog - xf + y))
    if l1_w or l1_h or l2_w or l2_h:
        wf, hf = w.astype(_F32), h.astype(_F32)
        total = total + (
            l1_w * jnp.sum(jnp.abs(wf)) + l1_h * jnp.sum(jnp.abs(hf))
            + 0.5 * l2_w * jnp.sum(wf * wf) + 0.5 * l2_h * jnp.sum(hf * hf)
        )
    return total


def _put_x(x, mesh, xs):
    """Place X on the mesh: dense arrays shard (mr, mc); a quantized
    (codes, scales) pair shards codes like X and scales per the policy —
    1-D per-column scales along 'mc' with their columns, a 2-D per-
    (row-block, column) table with its row axis replicated over 'mr'
    (same layout as parallel.sharded._quant_specs)."""
    if not isinstance(x, tuple):
        return jax.device_put(x, xs)
    from jax.sharding import NamedSharding

    from ..parallel.mesh import quant_scale_spec

    return (
        jax.device_put(x[0], xs),
        jax.device_put(
            x[1], NamedSharding(mesh, quant_scale_spec(x[1].ndim))
        ),
    )


def _dq_or_id(precision):
    """Identity for dense X; in-register dequant for (codes, scales) X —
    XLA fuses the uint8 multiply into the consuming elementwise ops, so
    int8-stored X never re-materializes at f32 in HBM."""
    if precision.x_dtype != "int8":
        return lambda xx: xx
    from ..ops.quant import dequantize

    return lambda xx: dequantize(xx[0], xx[1])


@functools.lru_cache(maxsize=8)
def _masked_jit(config: SolveConfig):
    eps, prec = config.eps, config.precision
    pens = dict(
        l1_w=config.l1_w, l1_h=config.l1_h, l2_w=config.l2_w, l2_h=config.l2_h
    )
    dq = _dq_or_id(prec)

    @jax.jit
    def _solve(x, w, h, mask, initial_cost=None, initial_momentum=None,
               initial_extrap=None):
        step = lambda w, h, xx: mu_step_masked(w, h, dq(xx), mask, eps, prec, **pens)
        cost = lambda xx, w, h: masked_kl(dq(xx), w, h, mask, eps, **pens)
        return run_checked_loop(
            x, w, h, config, step, cost, initial_cost=initial_cost,
            initial_momentum=initial_momentum, initial_extrap=initial_extrap,
        )

    return _solve


@functools.lru_cache(maxsize=8)
def _masked_prep_jit_cached(precision, eps: float):
    """One-launch masked input prep (the masked twin of solver._prep_jit:
    eager per-op dispatches are tunnel RPCs on this platform)."""
    sd = jnp.dtype(precision.state_dtype)
    quant = precision.x_dtype == "int8"

    @jax.jit
    def prep(x, w, h, mask):
        w = jnp.maximum(w.astype(sd), jnp.asarray(eps, sd))
        h = jnp.maximum(h.astype(sd), jnp.asarray(eps, sd))
        # honor the X storage dtype like every other solver (bf16 halves
        # the dominant HBM stream; the masked quotient promotes to f32)
        x = jnp.maximum(x.astype(_F32), jnp.asarray(eps, _F32))
        mask = mask.astype(_F32)
        # zero the unobserved entries for EVERY storage dtype: masked values
        # may be garbage INCLUDING NaN/Inf (the standard missing-data
        # encoding), and 0 * NaN = NaN would poison the solve despite
        # mask == 0.  Bit-neutral for finite inputs (the updates multiply
        # those entries by 0 anyway); for int8 it additionally keeps
        # garbage out of the quantization scales.
        x = jnp.where(mask > 0, x, 0.0)
        if quant:
            from ..ops.quant import quantize_policy

            x = quantize_policy(x, eps, precision.x_quant_rows)
        else:
            x = x.astype(jnp.dtype(precision.x_dtype))
        return x, w, h, mask

    return prep


def _masked_validate_and_prep(x, w0, h0, mask, config: SolveConfig):
    """Shared by solve_masked and solve_masked_h_only: family/shape checks
    plus the one-launch clamp/cast prep."""
    config.validate()
    if config.beta != 1.0 or config.algorithm != "mu":
        raise NotImplementedError(
            "masked solve implements the KL (beta=1) MU family"
        )
    sx, sw, sh = jnp.shape(x), jnp.shape(w0), jnp.shape(h0)
    if jnp.shape(mask) != sx:
        raise ValueError(f"mask shape {jnp.shape(mask)} != X shape {sx}")
    if sx != (sw[0], sh[1]) or sw[1] != sh[0]:
        raise ValueError(f"shape mismatch: X{sx} vs W{sw} @ H{sh}")
    return _masked_prep_jit_cached(config.precision, config.eps)(
        x, w0, h0, mask
    )


@functools.lru_cache(maxsize=8)
def _masked_h_step_cost_pair(config: SolveConfig):
    """(step, cost) for the masked H-only loop over a PACKED ``(x, mask)``
    data operand — run_checked_loop passes one opaque data arg, so callers
    that take the mask as an ARGUMENT (the serving export) and callers that
    close over it (:func:`_masked_h_only_jit`) share one step body."""
    eps, prec = config.eps, config.precision
    pens = dict(l1_h=config.l1_h, l2_h=config.l2_h)
    dq = _dq_or_id(prec)

    def step(w_, h_, xm):
        x_raw, mask = xm
        x_ = dq(x_raw)
        # the H half of mu_step_masked (same clamp sites)
        z = mask * (x_ / eps_clamp(matmul(w_, h_, prec), eps))
        numer = matmul(w_, z, prec, transpose_a=True)
        denom = (
            eps_clamp(matmul(w_, mask, prec, transpose_a=True), eps)
            + pens["l1_h"] + pens["l2_h"] * h_.astype(_F32)
        )
        return w_, (h_ * (numer / denom)).astype(h_.dtype)

    def cost(xm, w_, h_):
        x_, mask = xm
        # H-side penalties only (the W penalties are not part of an
        # H-only objective — mirrors models.nmf._h_only_jit)
        return masked_kl(dq(x_), w_, h_, mask, eps, **pens)

    return step, cost


@functools.lru_cache(maxsize=8)
def _masked_h_only_jit(config: SolveConfig):
    """Jitted masked H-only solve: W fixed, H iterates on the observed
    entries only (missing-data inference, e.g. scoring a partially-observed
    new column against a learned dictionary).  Cached: the streamed masked
    transform requests this once per column block, and a retrace is a
    10-60 s remote compile on this platform."""
    step, cost = _masked_h_step_cost_pair(config)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def _solve(x, w, h, mask, initial_cost=None, initial_momentum=None,
               initial_extrap=None):
        return run_checked_loop(
            (x, mask), w, h, config, step, cost, initial_cost=initial_cost,
            initial_momentum=initial_momentum, initial_extrap=initial_extrap,
        )

    return _solve


@functools.lru_cache(maxsize=8)
def _masked_h_only_sharded_jit(config: SolveConfig, mesh):
    from ..parallel.sharded import build_sharded_masked_h_solver

    return build_sharded_masked_h_solver(config, mesh)


def solve_masked_h_only(
    x, w, h0, mask, config: SolveConfig = SolveConfig(), mesh=None
) -> SolveResult:
    """Iterate only the H half of the masked update with W fixed.

    The missing-data inference path: score partially-observed NEW columns
    against a learned dictionary (``mask`` 0 = missing, or real-valued
    confidence weights), e.g. cold-start scoring in a recommender.  Same
    loop/convergence machinery as :func:`nmf_tpu.solve_h_only`; composes
    with L1/L2 H-penalties and meshes (mask shards like X).
    """
    x, w, h0, mask = _masked_validate_and_prep(x, w, h0, mask, config)
    from .solver import maybe_live_chunked

    if mesh is not None:
        from ..parallel.mesh import nmf_shardings

        xs, ws, hs, _ = nmf_shardings(mesh)
        x = _put_x(x, mesh, xs)
        mask = jax.device_put(mask, xs)
        w = jax.device_put(w, ws)
        h0 = jax.device_put(h0, hs)

        def make_fn(c):
            fn = _masked_h_only_sharded_jit(c, mesh)
            return lambda x_, w_, h_, c0, m0, **kw: fn((x_, mask), w_, h_, c0, m0, **kw)

        fallback = maybe_live_chunked(make_fn, x, w, h0, config, mesh)
        if fallback is not None:
            return fallback
        return _masked_h_only_sharded_jit(config, mesh)(
            (x, mask), w, h0, jnp.asarray(jnp.nan, _F32),
            jnp.asarray(jnp.nan, _F32),
        )

    def make_fn(c):
        fn = _masked_h_only_jit(c)
        return lambda x_, w_, h_, c0, m0, **kw: fn(x_, w_, h_, mask, c0, m0, **kw)

    fallback = maybe_live_chunked(make_fn, x, w, h0, config)
    if fallback is not None:
        return fallback
    return _masked_h_only_jit(config)(x, w, h0, mask)


def solve_masked(
    x,
    w0,
    h0,
    mask,
    config: SolveConfig = SolveConfig(),
    mesh=None,
) -> SolveResult:
    """Factorize the observed entries of ``x`` (mask 1 = observed, 0 = missing).

    ``mask`` may also carry real-valued confidence weights in [0, inf).
    Masked entries of X are ignored entirely — their values may be garbage,
    INCLUDING NaN/Inf (the standard missing-data encoding): prep zeroes
    unobserved entries before anything else reads them.

    With ``mesh`` the solve runs distributed: the mask shards exactly like X
    over the ('mr', 'mc') mesh and the denominator mask-GEMMs psum with the
    numerators (parallel.sharded.build_sharded_masked_solver).
    """
    x, w0, h0, mask = _masked_validate_and_prep(x, w0, h0, mask, config)
    if mesh is not None:
        from ..parallel.mesh import nmf_shardings

        xs, ws, hs, rep = nmf_shardings(mesh)
        x = _put_x(x, mesh, xs)
        w0 = jax.device_put(w0, ws)
        h0 = jax.device_put(h0, hs)
        mask = jax.device_put(mask, xs)
        from .solver import maybe_live_chunked

        def make_fn(c):
            fn = _sharded_masked_jit(c, mesh)
            return lambda x_, w_, h_, c0, m0, **kw: fn(x_, w_, h_, mask, c0, m0, **kw)

        fallback = maybe_live_chunked(make_fn, x, w0, h0, config, mesh)
        if fallback is not None:
            return fallback
        fn = _sharded_masked_jit(config, mesh)
        return fn(
            x, w0, h0, mask,
            jnp.asarray(jnp.nan, _F32), jnp.asarray(jnp.nan, _F32),
        )
    from .solver import maybe_live_chunked

    def make_fn(c):
        fn = _masked_jit(c)
        return lambda x_, w_, h_, c0, m0, **kw: fn(x_, w_, h_, mask, c0, m0, **kw)

    fallback = maybe_live_chunked(make_fn, x, w0, h0, config)
    if fallback is not None:
        return fallback
    return _masked_jit(config)(x, w0, h0, mask)


@functools.lru_cache(maxsize=8)
def _sharded_masked_jit(config: SolveConfig, mesh):
    from ..parallel.sharded import build_sharded_masked_solver

    return build_sharded_masked_solver(config, mesh)
