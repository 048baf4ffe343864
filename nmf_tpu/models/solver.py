"""The NMF solve loop: jit-compiled, convergence-checked, host-sync-free.

Reference mapping:
  * The reference captures one full iteration into a CUDA graph and replays it
    ``max_iter`` times (nmf.cu:100-115).  Here the whole run — including the
    convergence predicate — is ONE ``jax.jit`` program built from
    ``lax.while_loop`` over check-blocks with an inner ``lax.fori_loop`` of
    ``check_every`` MU steps: XLA gives whole-iteration fusion and zero
    relaunch overhead by construction, and the device never syncs with the
    host until results are fetched.
  * The reference's documented-but-lost convergence behaviour (README.md:51:
    stop when |cost_prev - cost| / cost < thresh, checked every ITER_CHECK
    iterations) is restored here as a first-class feature.  ``thresh == 0``
    reproduces the reference binary exactly: precisely ``max_iter`` iterations
    (nmf.cu:11 "set to zero to guarantee MAX_ITER iterations").
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.divergence import beta_divergence, kl_divergence
from ..ops.mu import mu_step, mu_step_beta, mu_step_kl_reg
from ..utils.config import SolveConfig

__all__ = ["SolveResult", "solve", "solve_jit", "resolve_step_fn", "run_checked_loop"]

_F32 = jnp.float32


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SolveResult:
    """Factorization result.

    ``cost_history`` has one float32 slot per potential check point
    (``ceil(max_iter / check_every)``); entries past ``num_checks`` are NaN.
    ``cost`` is the last computed divergence (NaN when cost tracking is
    disabled and thresh == 0).  ``momentum`` is the accelerated loop's final
    momentum coefficient — NaN for non-accelerated solves; segment drivers
    (chunked live metrics, checkpoint resume) feed it back as
    ``initial_momentum`` so the accelerator's adaptive state survives
    segment boundaries.  All in-repo constructors pass it explicitly; the
    ``None`` default only eases external/test construction.
    """

    w: jnp.ndarray
    h: jnp.ndarray
    iterations: jnp.ndarray     # i32 scalar: MU iterations actually run
    cost: jnp.ndarray           # f32 scalar: final divergence
    cost_history: jnp.ndarray   # f32 [num_check_slots]
    num_checks: jnp.ndarray     # i32 scalar: populated history entries
    converged: jnp.ndarray      # bool scalar: stopped via threshold
    momentum: jnp.ndarray = None  # f32 scalar: final accel momentum (NaN if n/a)
    # accelerated loop's extrapolation carry (the OTHER half of its resume
    # state, factor-shaped).  Populated only when a segment driver asked for
    # it via ``initial_extrap`` — plain results and whole-run accel results
    # keep these None so no extra factor-sized output buffers materialize.
    w_ex: jnp.ndarray = None
    h_ex: jnp.ndarray = None


StepFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]
CostFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _default_platform(x) -> str:
    if isinstance(x, tuple):  # quantized X: (codes, scales)
        x = x[0]
    try:
        return list(x.devices())[0].platform  # jax.Array
    except AttributeError:
        return jax.default_backend()


def _dequant_wrap_step(step_fn):
    """Adapt an array-X step fn to quantized X (jnp path: the dequantized
    values fuse into the consuming elementwise ops; X never re-materializes
    at f32 in HBM)."""
    from ..ops.quant import dequantize

    def wrapped(w, h, x):
        return step_fn(w, h, dequantize(x[0], x[1]))

    return wrapped


def _dequant_wrap_cost(cost_fn):
    from ..ops.quant import dequantize

    def wrapped(x, w, h):
        return cost_fn(dequantize(x[0], x[1]), w, h)

    return wrapped


def resolve_step_fn(config: SolveConfig, platform: Optional[str] = None) -> StepFn:
    """Pick the per-iteration kernel implementation for this config/platform.

    ``auto`` uses the fused Pallas path on TPU for the KL (beta=1) family and
    the jnp/XLA path elsewhere (CPU tests, GPU, odd shapes).  Every Pallas
    kernel has this jnp fallback by design (SURVEY.md section 7 step 5).
    """
    config.validate()
    eps, prec = config.eps, config.precision
    quant = prec.x_dtype == "int8"

    if config.algorithm == "hals":
        from ..ops.hals import hals_step

        fn = functools.partial(hals_step, eps=eps, precision=prec)
        return _dequant_wrap_step(fn) if quant else fn
    if config.beta != 1.0:
        fn = functools.partial(mu_step_beta, beta=config.beta, eps=eps, precision=prec)
        return _dequant_wrap_step(fn) if quant else fn
    if config.regularized:
        fn = functools.partial(
            mu_step_kl_reg, eps=eps, precision=prec,
            l1_w=config.l1_w, l1_h=config.l1_h,
            l2_w=config.l2_w, l2_h=config.l2_h,
        )
        return _dequant_wrap_step(fn) if quant else fn

    backend = config.backend
    if backend in ("auto", "autotune"):
        plat = platform if platform is not None else jax.default_backend()
        # quantized X: XLA fuses the uint8 dequant at full speed while
        # Mosaic's uint8 conversion path is currently ~1000x slower than the
        # math it feeds (measured), so int8-X defaults to the jnp path;
        # backend='pallas' still forces the in-register kernels explicitly.
        backend = "pallas" if (plat == "tpu" and not quant) else "jnp"
    if backend == "pallas":
        if quant and prec.x_quant_rows:
            raise NotImplementedError(
                "per-row-block int8 scales take the jnp path (the fused "
                "kernels' scales operand is per-column); drop "
                "backend='pallas' or x_quant_rows"
            )
        from ..ops.pallas import fused_mu  # deferred: keeps CPU import light

        if fused_mu.supported():
            # fused kernels dequantize uint8 X in-register (no wrapper)
            return functools.partial(fused_mu.mu_step_fused, eps=eps, precision=prec)
        backend = "jnp"
    fn = functools.partial(mu_step, eps=eps, precision=prec)
    return _dequant_wrap_step(fn) if quant else fn


def _cost_fn(config: SolveConfig, platform: Optional[str] = None) -> CostFn:
    quant = config.precision.x_dtype == "int8"
    if config.beta != 1.0:
        fn = functools.partial(beta_divergence, beta=config.beta, eps=config.eps)
        return _dequant_wrap_cost(fn) if quant else fn
    if config.regularized:
        def penalized(x, w, h):
            wf, hf = w.astype(_F32), h.astype(_F32)
            pen = (
                config.l1_w * jnp.sum(jnp.abs(wf))
                + config.l1_h * jnp.sum(jnp.abs(hf))
                + 0.5 * config.l2_w * jnp.sum(wf * wf)
                + 0.5 * config.l2_h * jnp.sum(hf * hf)
            )
            return kl_divergence(x, w, h, config.eps) + pen

        return _dequant_wrap_cost(penalized) if quant else penalized
    backend = config.backend
    if backend in ("auto", "autotune"):
        plat = platform if platform is not None else jax.default_backend()
        backend = "pallas" if (plat == "tpu" and not quant) else "jnp"
    if backend == "pallas":
        from ..ops.pallas import fused_mu

        # the fused cost kernel dequantizes in-register itself
        return functools.partial(
            fused_mu.kl_cost_fused, eps=config.eps, precision=config.precision
        )
    fn = functools.partial(kl_divergence, eps=config.eps)
    return _dequant_wrap_cost(fn) if quant else fn


def _emit_live_single(it, cost, rel):
    """Default live emitter: async host callback to utils.metrics.emit_live."""
    from ..utils.metrics import emit_live

    jax.debug.callback(emit_live, it, cost, rel)


@functools.lru_cache(maxsize=4)
def host_callbacks_supported(platform: Optional[str] = None) -> bool:
    """Whether ``platform`` can run jax.debug.callback inside jit.

    Some PJRT plugins (e.g. tunneled devices) reject host send/recv
    callbacks at execute time; live metrics then fall back to the chunked
    host-driven loop (:func:`run_live_chunked`).  The probe compiles one
    trivial program ON A DEVICE OF THE REQUESTED PLATFORM (jit follows the
    committed input) — mixed-backend sessions, e.g. a CPU mesh next to a
    callback-less TPU default backend, get per-platform answers.  Cached
    per process per platform.
    """
    import numpy as _np

    try:
        devices = jax.devices(platform) if platform else jax.devices()
    except RuntimeError:
        return False
    if not devices:
        return False
    try:
        @jax.jit
        def _probe(v):
            jax.debug.callback(lambda _: None, v)
            return v + 1

        out = _probe(jax.device_put(jnp.zeros((), jnp.int32), devices[0]))
        _np.asarray(jax.device_get(out))  # force execution (block may no-op)
        jax.effects_barrier()
        return True
    except Exception:
        return False


def callbacks_ok(mesh=None) -> bool:
    """host_callbacks_supported for a mesh's platform (default backend if
    None) — the shared probe behind every live-metrics fallback decision."""
    if mesh is not None:
        platform = list(mesh.devices.flat)[0].platform
    else:
        platform = jax.default_backend()
    return host_callbacks_supported(platform)


def maybe_live_chunked(
    make_segment_fn, x, w, h, config: SolveConfig, mesh=None,
    initial_cost: float = float("nan"),
    initial_momentum: float = float("nan"),
    initial_extrap=None,
):
    """Run the chunked host-driven live loop when callbacks are unsupported.

    Returns the SolveResult, or None when the caller should proceed with its
    normal (callback-emitting) path.  Centralizes the fallback decision the
    masked / h-only / dense / sharded solvers all share.  ``initial_cost``
    seeds the convergence baseline exactly like the solvers' own parameter;
    ``initial_momentum``/``initial_extrap`` carry the accelerator's state the
    same way (resumed segments pass the previous segment's final values, so
    a checkpoint-resumed accelerated run on this callback-rejecting platform
    reproduces the uninterrupted run exactly).
    """
    if not config.live_metrics or callbacks_ok(mesh):
        return None
    return run_live_chunked(
        make_segment_fn, x, w, h, config, jnp.asarray(initial_cost, _F32),
        initial_momentum=initial_momentum,
        initial_extrap=initial_extrap,
    )


def run_live_chunked(
    make_segment_fn, x, w, h, config: SolveConfig, initial_cost,
    initial_momentum: float = float("nan"),
    initial_extrap=None,
):
    """Live metrics WITHOUT host callbacks: drive the solve in
    ``check_every``-sized device segments and emit each check from the host.

    Used when the platform rejects jax.debug.callback (see
    :func:`host_callbacks_supported`).  Unlike the callback path this one
    synchronizes with the host once per check — exactly the per-check fetch
    the reference-era API performed (README.md:51-54) — so the zero-sync
    contract is traded for liveness only when live metrics were requested on
    such a platform.

    Each segment receives the previous check's cost as its ``initial_cost``
    and the previous segment's final momentum as its ``initial_momentum``
    (traced scalar operands — same compiled program), so an accelerated
    segment's acceptance baseline AND its adapted momentum coefficient carry
    across chunks: the host-driven path runs the exact sequence the in-jit
    accelerator runs (verified by tests/test_accel.py's chunk-equivalence
    test).

    ``make_segment_fn(seg_config)`` returns the jitted segment solver
    ``fn(x, w, h, initial_cost, initial_momentum) -> SolveResult`` (the
    single-device and sharded solvers both qualify); W/H buffers chain
    through donation.
    """
    import numpy as np

    from ..utils.metrics import emit_live

    max_iter = int(config.max_iter)
    check_every = int(config.check_every)
    thresh = float(config.thresh)
    n_slots = max(config.num_checks, 1)
    hist = np.full((n_slots,), np.nan, np.float32)
    it, chk = 0, 0
    prev = float(jnp.asarray(initial_cost)) if initial_cost is not None else float("nan")
    converged = False
    base = dataclasses.replace(config, live_metrics=False)
    tail = max_iter % check_every
    tail_compiled = None
    if 0 < tail < max_iter and thresh == 0.0:
        # The per-chunk programs are jit-keyed on max_iter, so a short tail
        # chunk is a SECOND compiled program — on this platform a 10-60 s
        # (sometimes minutes) remote compile that would otherwise stall the
        # solve right before its final check.  Compile it NOW, next to the
        # main segment's compile, where the user expects compile latency.
        # Preferred path: AOT lower+compile (no execution, no discarded
        # compute) and run the compiled program directly at the tail.  A
        # segment fn wrapped in a closure (masked solvers bind the mask)
        # exposes no .lower — those execute a warm segment on fresh copies
        # ("+ 0", so donation cannot consume the live state) as before.
        # With thresh > 0 the run usually stops on a check boundary and
        # never reaches the tail, so no speculative compile is paid there.
        tail_fn = make_segment_fn(dataclasses.replace(base, max_iter=tail))
        lower = getattr(tail_fn, "lower", None)
        if lower is not None and not base.accelerate:
            # (accel segments carry an extra extrapolation-pair kwarg whose
            # placement the AOT lowering can't anticipate — they take the
            # warm-execute fallback below)
            try:
                tail_compiled = lower(
                    x, w, h, jnp.asarray(jnp.nan, _F32), jnp.asarray(jnp.nan, _F32)
                ).compile()
            except Exception:
                tail_compiled = None
        if tail_compiled is None:
            warm = (
                x,
                jnp.asarray(w) + 0,
                jnp.asarray(h) + 0,
                jnp.asarray(jnp.nan, _F32),
                jnp.asarray(jnp.nan, _F32),
            )
            if base.accelerate:
                # warm the SAME trace the real tail call uses (the extrap
                # kwarg changes the program signature); fresh copies again
                # so donation can't touch the live state
                tail_fn(
                    *warm,
                    initial_extrap=(jnp.asarray(w) + 0, jnp.asarray(h) + 0),
                )
            else:
                tail_fn(*warm)
    mom = float(initial_momentum)  # accel momentum threaded segment-to-segment
    # accel extrapolation carry: a resumed segment supplies the previous
    # segment's carry; a fresh run seeds AT the iterate (fresh copies — the
    # segment donates w/h, so the seed must not alias them), exactly the
    # one-jit accel loop's init; thereafter the previous segment's carry
    ex = None
    if config.accelerate:
        ex = (
            initial_extrap
            if initial_extrap is not None
            else (jnp.asarray(w) + 0, jnp.asarray(h) + 0)
        )
    while it < max_iter and not converged:
        chunk = min(check_every, max_iter - it)
        args = (x, w, h, jnp.asarray(prev, _F32), jnp.asarray(mom, _F32))
        if chunk != check_every and tail_compiled is not None:
            res = tail_compiled(*args)
        elif ex is not None:
            seg_fn = make_segment_fn(dataclasses.replace(base, max_iter=chunk))
            res = seg_fn(*args, initial_extrap=ex)
        else:
            seg_fn = make_segment_fn(dataclasses.replace(base, max_iter=chunk))
            res = seg_fn(*args)
        w, h = res.w, res.h
        if res.momentum is not None:
            mom = float(res.momentum)
        if res.w_ex is not None:
            ex = (res.w_ex, res.h_ex)
        it += int(res.iterations)
        cost = float(res.cost)
        rel = abs(prev - cost) / abs(cost) if cost else float("nan")
        hist[chk] = cost
        chk += 1
        emit_live(it, cost, rel)
        if thresh > 0.0 and rel < thresh:
            converged = True
        prev = cost
    return SolveResult(
        w=w,
        h=h,
        iterations=jnp.asarray(it, jnp.int32),
        cost=jnp.asarray(prev, _F32),
        cost_history=jnp.asarray(hist),
        num_checks=jnp.asarray(chk, jnp.int32),
        converged=jnp.asarray(converged, jnp.bool_),
        momentum=jnp.asarray(mom, _F32),
        # final extrapolation carry, so a segment driver wrapping THIS loop
        # (checkpointed live runs) can resume it exactly
        w_ex=ex[0] if ex is not None else None,
        h_ex=ex[1] if ex is not None else None,
    )


def run_checked_loop(
    x: jnp.ndarray,
    w: jnp.ndarray,
    h: jnp.ndarray,
    config: SolveConfig,
    step_fn: StepFn,
    cost_fn: CostFn,
    all_reduce: Callable[[jnp.ndarray], jnp.ndarray] = lambda c: c,
    initial_cost: Optional[jnp.ndarray] = None,
    live_emit: Optional[Callable] = None,
    initial_momentum: Optional[jnp.ndarray] = None,
    initial_extrap: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> SolveResult:
    """Trace the check-blocked while_loop.  Shared by the single-device and
    shard_map solvers; ``all_reduce`` sums partial costs across the mesh in
    the sharded case (a ``psum``), keeping the convergence predicate
    replicated so the loop stays uniform across devices.

    ``initial_cost`` seeds the convergence baseline: the first check compares
    against it (NaN/None = no baseline, first check never converges).  The
    checkpointed solver passes the previous segment's final cost here so
    thresholded convergence works identically across segment boundaries.

    With ``config.live_metrics`` each check also streams (iter, cost,
    rel_change) to the host through an async debug callback; ``live_emit``
    overrides the emitter (the sharded solver gates it to mesh coordinate
    (0,0) so a pod prints once per check, not once per device).
    """
    if config.accelerate:
        return _run_accel_loop(
            x, w, h, config, step_fn, cost_fn, all_reduce, initial_cost,
            live_emit if live_emit is not None else _emit_live_single,
            initial_momentum,
            initial_extrap,
        )
    max_iter = int(config.max_iter)
    check_every = int(config.check_every)
    thresh = float(config.thresh)
    # Static decision: when thresh==0 and cost isn't tracked, skip the cost
    # GEMM entirely (the reference computes no cost at all, nmf.cu:113-115).
    need_cost = config.track_cost or thresh > 0.0
    n_slots = max(config.num_checks, 1)
    if config.live_metrics and not need_cost:
        raise ValueError(
            "live_metrics streams the per-check cost; enable track_cost "
            "(or a nonzero thresh)"
        )
    emit = live_emit if live_emit is not None else _emit_live_single

    def one_step(_, wh):
        return step_fn(wh[0], wh[1], x)

    def body(carry):
        w, h, it, prev_cost, cost, chk, hist, done = carry
        chunk = jnp.minimum(check_every, max_iter - it)
        w, h = jax.lax.fori_loop(0, chunk, one_step, (w, h))
        it = it + chunk
        if need_cost:
            prev_cost = cost
            cost = all_reduce(cost_fn(x, w, h)).astype(_F32)
            hist = hist.at[chk].set(cost)
            rel = jnp.abs(prev_cost - cost) / jnp.abs(cost)
            if thresh > 0.0:
                done = rel < thresh
            if config.live_metrics:
                emit(it, cost, rel)
            # chk counts POPULATED history entries (the num_checks contract):
            # an untracked run records nothing, so it must report 0 — guards
            # and metrics consumers gate their cost checks on num_checks > 0.
            chk = chk + 1
        return (w, h, it, prev_cost, cost, chk, hist, done)

    def cond(carry):
        _, _, it, _, _, _, _, done = carry
        return jnp.logical_and(it < max_iter, jnp.logical_not(done))

    c0 = (
        jnp.asarray(jnp.nan, _F32)
        if initial_cost is None
        else jnp.asarray(initial_cost, _F32)
    )
    init = (
        w,
        h,
        jnp.zeros((), jnp.int32),
        jnp.asarray(jnp.inf, _F32),
        c0,
        jnp.zeros((), jnp.int32),
        jnp.full((n_slots,), jnp.nan, _F32),
        jnp.zeros((), jnp.bool_),
    )
    w, h, it, _, cost, chk, hist, done = jax.lax.while_loop(cond, body, init)
    return SolveResult(
        w=w, h=h, iterations=it, cost=cost, cost_history=hist,
        num_checks=chk, converged=done,
        momentum=jnp.asarray(jnp.nan, _F32),
    )


def _run_accel_loop(
    x: jnp.ndarray,
    w: jnp.ndarray,
    h: jnp.ndarray,
    config: SolveConfig,
    step_fn: StepFn,
    cost_fn: CostFn,
    all_reduce: Callable[[jnp.ndarray], jnp.ndarray],
    initial_cost: Optional[jnp.ndarray],
    emit: Callable,
    initial_momentum: Optional[jnp.ndarray] = None,
    initial_extrap: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> SolveResult:
    """Safeguarded Nesterov-extrapolated solve loop (``config.accelerate``).

    Each base step runs from an extrapolated point
    ``Y_k = X_k + m * (X_k - X_{k-1})`` (clamped to eps — a negative or zero
    entry would be absorbing under multiplicative updates); the recorded
    iterate stays the un-extrapolated step output.  Every ``check_every``
    block the cost — the SAME per-check divergence the plain loop computes —
    gates acceptance: a block whose cost increased is thrown away and redone
    with plain steps from the block-start state, which restores MU's
    monotone-descent guarantee by construction, so the recorded cost history
    is non-increasing for the monotone families (KL/beta>=1 MU, HALS).  The
    momentum coefficient adapts: ``accel_grow``x on accept (capped at
    ``accel_momentum_max``), ``accel_shrink``x on reject.  Measured 4-6x
    fewer iterations than plain MU to the same converged cost at config-2
    dims (benchmarks/RESULTS.md), with zero rejections in practice.

    Works for every family that flows through :func:`run_checked_loop`:
    ``all_reduce`` keeps the acceptance predicate replicated on a mesh
    exactly like the convergence predicate, and the extrapolation is
    factor-shaped elementwise work (no extra communication).  Under ``vmap``
    (batched/restart solvers) the reject branch lowers to a ``select`` so
    each block pays accel + plain work; with rejections rare the accepted
    path alone already nets ~2x there.

    A NaN/Inf escape inside an extrapolated block (possible at extreme
    momentum) fails the ``cost <= prev`` acceptance and lands in the plain
    redo, so divergence cannot propagate.
    """
    max_iter = int(config.max_iter)
    check_every = int(config.check_every)
    thresh = float(config.thresh)
    n_slots = max(config.num_checks, 1)
    eps = config.eps
    m0 = jnp.asarray(config.accel_momentum, _F32)
    if initial_momentum is not None:
        # resumed segment (chunked live loop / checkpoint): continue from the
        # previous segment's adapted coefficient; NaN = no previous segment
        im = jnp.asarray(initial_momentum, _F32)
        m0 = jnp.where(jnp.isnan(im), m0, im)
    m_max = jnp.asarray(config.accel_momentum_max, _F32)
    grow = jnp.asarray(config.accel_grow, _F32)
    shrink = jnp.asarray(config.accel_shrink, _F32)

    def _extrap(new, old, m):
        e = new.astype(_F32) + m * (new.astype(_F32) - old.astype(_F32))
        return jnp.maximum(e, jnp.asarray(eps, _F32)).astype(new.dtype)

    def accel_one(_, carry):
        wp, hp, we, he, m = carry
        wn, hn = step_fn(we, he, x)
        return (wn, hn, _extrap(wn, wp, m), _extrap(hn, hp, m), m)

    def plain_one(_, wh):
        return step_fn(wh[0], wh[1], x)

    def body(carry):
        wn, hn, we, he, m, it, prev_cost, cost, chk, hist, done = carry
        chunk = jnp.minimum(check_every, max_iter - it)
        wn0, hn0 = wn, hn
        wn1, hn1, we1, he1, _ = jax.lax.fori_loop(
            0, chunk, accel_one, (wn, hn, we, he, m)
        )
        c1 = all_reduce(cost_fn(x, wn1, hn1)).astype(_F32)

        def _accept(_):
            return wn1, hn1, we1, he1, jnp.minimum(m * grow, m_max), c1

        def _reject(_):
            w2, h2 = jax.lax.fori_loop(0, chunk, plain_one, (wn0, hn0))
            c2 = all_reduce(cost_fn(x, w2, h2)).astype(_F32)
            return w2, h2, w2, h2, m * shrink, c2

        wn, hn, we, he, m, c = jax.lax.cond(c1 <= cost, _accept, _reject, None)
        it = it + chunk
        prev_cost = cost
        cost = c
        hist = hist.at[chk].set(cost)
        rel = jnp.abs(prev_cost - cost) / jnp.abs(cost)
        if thresh > 0.0:
            done = rel < thresh
        if config.live_metrics:
            emit(it, cost, rel)
        chk = chk + 1
        return (wn, hn, we, he, m, it, prev_cost, cost, chk, hist, done)

    def cond(carry):
        it, done = carry[5], carry[10]
        return jnp.logical_and(it < max_iter, jnp.logical_not(done))

    # The acceptance test needs a real baseline: seed it with the supplied
    # initial cost (resumed segments) or one up-front cost evaluation.  The
    # branch must be lazy (lax.cond, not jnp.where) — where would evaluate
    # the seed reconstruction GEMM on every resumed segment just to discard
    # it.  The predicate is a replicated scalar, so the cond (and the psum
    # inside its taken branch) stays uniform across a mesh, exactly like
    # the reject branch.
    def _seed_cost():
        return all_reduce(cost_fn(x, w, h)).astype(_F32)

    if initial_cost is None:
        c0 = _seed_cost()
    else:
        c_given = jnp.asarray(initial_cost, _F32)
        c0 = jax.lax.cond(
            jnp.isnan(c_given), _seed_cost, lambda: c_given
        )
    # resumed segments (chunked live loop) supply the extrapolation carry
    # from the previous segment; a fresh run starts it AT the iterate —
    # the same init either way, so segmenting reproduces the one-jit loop
    # exactly (tests/test_accel.py chunk-equivalence)
    we0, he0 = initial_extrap if initial_extrap is not None else (w, h)
    init = (
        w,
        h,
        we0.astype(w.dtype),
        he0.astype(h.dtype),
        m0,
        jnp.zeros((), jnp.int32),
        jnp.asarray(jnp.inf, _F32),
        c0,
        jnp.zeros((), jnp.int32),
        jnp.full((n_slots,), jnp.nan, _F32),
        jnp.zeros((), jnp.bool_),
    )
    wn, hn, we_f, he_f, m_fin, it, _, cost, chk, hist, done = jax.lax.while_loop(
        cond, body, init
    )
    return SolveResult(
        w=wn, h=hn, iterations=it, cost=cost, cost_history=hist,
        num_checks=chk, converged=done, momentum=m_fin,
        # extrapolation carry exposed only to segment drivers (the caller
        # drops these from the returned pytree on non-segment calls, so the
        # extra factor-sized outputs are DCE'd there)
        w_ex=we_f if initial_extrap is not None else None,
        h_ex=he_f if initial_extrap is not None else None,
    )


@functools.lru_cache(maxsize=32)
def solve_jit(config: SolveConfig, platform: Optional[str] = None):
    """Build (and cache) the jitted solver for a config.

    ``w``/``h`` are donated: XLA aliases them to the result factors, so the
    solver never holds two copies of the state across the call boundary
    (matters at pod scale, and lets the checkpointed driver chain segments
    with zero buffer growth).  ``solve`` always passes internally-created
    clamped copies unless the caller opted out of clamping — see its
    docstring.
    """
    step_fn = resolve_step_fn(config, platform)
    cost_fn = _cost_fn(config, platform)

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def _solve(x, w, h, initial_cost, initial_momentum=None, initial_extrap=None):
        return run_checked_loop(
            x, w, h, config, step_fn, cost_fn, initial_cost=initial_cost,
            initial_momentum=initial_momentum, initial_extrap=initial_extrap,
        )

    return _solve


def _prep_jit(config: SolveConfig, x_is_quant_pair: bool = False):
    """Jitted input prep: clamp (nmf.cu:211) + state/X dtype casts (+ int8
    column quantization) in one program launch.  Keyed by (precision, eps)
    only — loop parameters (max_iter/thresh/...) don't change the prep
    program, and each extra compiled program pays this platform's one-off
    first-dispatch stall.  With ``x_is_quant_pair`` the (codes, scales)
    tuple passes through untouched (quantize_policy already clamped at
    quantize time); only W/H are prepped."""
    return _prep_jit_cached(config.precision, config.eps, x_is_quant_pair)


@functools.lru_cache(maxsize=16)
def _prep_jit_cached(precision, eps: float, x_is_quant_pair: bool = False):
    sd = jnp.dtype(precision.state_dtype)
    quant = precision.x_dtype == "int8"

    @jax.jit
    def prep(x, w, h):
        w = jnp.maximum(w.astype(sd), jnp.asarray(eps, sd))
        h = jnp.maximum(h.astype(sd), jnp.asarray(eps, sd))
        if x_is_quant_pair:
            return x, w, h
        x = jnp.maximum(x.astype(_F32), jnp.asarray(eps, _F32))
        if quant:
            # uint8 codes + per-column (or per-row-block) scales: quarters
            # the dominant HBM stream; dequantized in-register by consumers
            from ..ops.quant import quantize_policy

            x = quantize_policy(x, eps, precision.x_quant_rows)
        else:
            x = x.astype(jnp.dtype(precision.x_dtype))
        return x, w, h

    return prep


def solve(
    x,
    w0,
    h0,
    config: SolveConfig = SolveConfig(),
    clamp_inputs: bool = True,
    initial_cost: float = float("nan"),
    initial_momentum: float = float("nan"),
    initial_extrap=None,
) -> SolveResult:
    """Factorize ``x ~= w @ h``: the ``run_async`` equivalent (nmf.cu:76-116).

    ``clamp_inputs`` replicates the reference's load-time ``set_epsilon``
    (nmf.cu:211) — pass already-clamped arrays and ``False`` to skip.
    ``initial_cost`` seeds the convergence baseline for resumed runs;
    ``initial_momentum`` seeds the accelerated loop's momentum the same way
    (NaN = start fresh at ``config.accel_momentum``).  ``initial_extrap``
    (a ``(w_ex, h_ex)`` pair) seeds its extrapolation carry — when passed,
    the result's ``w_ex``/``h_ex`` hold the carry for the next segment
    (checkpointed accel runs resume exactly; see utils/checkpoint.py).

    Buffer ownership: the W/H state buffers are DONATED to the solve program
    (aliased to the result factors).  With ``clamp_inputs=True`` (default)
    the donated buffers are internal clamped copies, so caller arrays stay
    valid; with ``clamp_inputs=False`` and already-placed jax arrays of the
    target dtype, the caller's ``w0``/``h0`` buffers are consumed — which is
    exactly what the checkpointed segment driver wants (zero copy growth
    across segments).
    """
    config.validate()
    sd = jnp.dtype(config.precision.state_dtype)
    quant = config.precision.x_dtype == "int8"
    if isinstance(x, tuple) and not quant:
        raise ValueError(
            "X is a pre-quantized (codes, scales) pair but "
            f"Precision(x_dtype={config.precision.x_dtype!r}) — pre-quantized "
            "input requires x_dtype='int8' (quantize with "
            "ops.quant.quantize_policy on the same Precision)"
        )
    if isinstance(x, tuple):
        # the step program's dequant path is keyed on the config, so the
        # supplied scales must match the x_quant_rows knob (same contract
        # as solve_sharded's boundary check)
        want = 2 if config.precision.x_quant_rows else 1
        if x[1].ndim != want:
            raise ValueError(
                f"pre-quantized scales are {x[1].ndim}-D but "
                f"Precision(x_quant_rows={config.precision.x_quant_rows}) "
                f"expects {want}-D — quantize with ops.quant.quantize_policy "
                f"on the same Precision"
            )
    shape_x = jnp.shape(x[0]) if isinstance(x, tuple) else jnp.shape(x)
    shape_w, shape_h = jnp.shape(w0), jnp.shape(h0)
    if shape_x != (shape_w[0], shape_h[1]) or shape_w[1] != shape_h[0]:
        raise ValueError(
            f"shape mismatch: X{shape_x} vs W{shape_w} @ H{shape_h}"
        )
    if clamp_inputs:
        # ONE jitted prep program for the load-time clamp + dtype casts
        # (+ int8 quantization): on this platform every program launch is a
        # tunnel RPC costing ~5-10 ms, so the eager per-op version of this
        # block dominated small-problem call latency (measured ~12 ms of a
        # 46 ms solve() call at 512x1024).  Outputs are fresh buffers, so
        # the solve program's donation still never consumes caller arrays.
        # A pre-quantized (codes, scales) pair passes through: the values
        # were clamped at quantize time, only W/H need prep.
        x, w0, h0 = _prep_jit(config, isinstance(x, tuple))(x, w0, h0)
    else:
        # pre-clamped inputs: direct to target dtypes, no intermediate f32
        # copy of X (segment drivers pass device-resident arrays here)
        w0 = jnp.asarray(w0, sd)
        h0 = jnp.asarray(h0, sd)
        if quant:
            if not isinstance(x, tuple):
                from ..ops.quant import quantize_policy

                x = quantize_policy(
                    jnp.asarray(x, _F32), config.eps,
                    config.precision.x_quant_rows,
                )
        else:
            x = jnp.asarray(x, jnp.dtype(config.precision.x_dtype))
    platform = _default_platform(x)
    if (
        platform == "tpu"
        and config.beta == 1.0
        and not config.regularized
        and config.backend in ("auto", "autotune")
        and not quant  # int8-X resolves to the jnp path (see resolve_step_fn)
    ):
        from ..utils import autotune

        m, k = w0.shape
        if config.backend == "autotune":
            # measure fused-Pallas vs XLA once per shape and pin the winner
            choice = autotune.pick_backend(config, m, k, h0.shape[1])
        else:
            choice = autotune.rule_pick(
                m, k, h0.shape[1], config.precision.matmul_dtype
            )
        config = dataclasses.replace(config, backend=choice)
    if config.live_metrics and not host_callbacks_supported(platform):
        # platform rejects in-jit host callbacks: chunked host-driven live
        # loop — the resume state (cost baseline, accel momentum, accel
        # extrapolation carry) threads through so a checkpoint-resumed run
        # on this path still equals the uninterrupted run exactly
        return run_live_chunked(
            lambda c: solve_jit(c, platform), x, w0, h0, config,
            jnp.asarray(initial_cost, _F32),
            initial_momentum=float(initial_momentum),
            initial_extrap=initial_extrap,
        )
    kw = {} if initial_extrap is None else {"initial_extrap": initial_extrap}
    return solve_jit(config, platform)(
        x, w0, h0, jnp.asarray(initial_cost, _F32),
        jnp.asarray(initial_momentum, _F32), **kw,
    )
