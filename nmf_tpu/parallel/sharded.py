"""Mesh-sharded NMF solve: shard_map + explicit XLA collectives over ICI.

The whole solve loop — MU steps, cost evaluation, convergence predicate —
runs *inside* one ``shard_map`` under ``jit``: per-device local GEMMs hit the
MXU, the K-sized numerators/sums are combined with ``psum`` over the mesh
axes, and the convergence scalar is psum-replicated so the ``while_loop``
predicate stays uniform across all devices with zero host synchronisation
(SURVEY.md section 7 step 7; the hard part (c) of section 7).

Communication cost per iteration (see parallel/mesh.py for the layout):
only K x (N/c) + K x (M/r) + O(K) floats — the M x N data matrix never moves.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh;
everything here is host-count agnostic (meshes over all global devices).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.solver import SolveResult, run_checked_loop
from ..ops.divergence import kl_divergence_from_recon
from ..ops.elementwise import eps_clamp
from ..ops.mu import matmul
from ..utils.config import Precision, SolveConfig
from .mesh import COL_AXIS, ROW_AXIS, make_mesh, shard_problem

__all__ = [
    "update_h_sharded",
    "update_h_sharded_beta",
    "update_h_sharded_reg",
    "update_h_sharded_masked",
    "hals_update_h_sharded",
    "update_w_sharded",
    "mu_step_sharded",
    "mu_step_sharded_reg",
    "mu_step_sharded_masked",
    "kl_partial",
    "solve_sharded",
    "build_sharded_solver",
    "build_sharded_masked_solver",
    "build_sharded_h_solver",
    "build_sharded_semi_solver",
    "build_sharded_masked_h_solver",
]

_F32 = jnp.float32


def _use_fused(
    config: SolveConfig,
    local_m: int,
    k: int,
    local_n: int,
    platform: str,
    quant: bool = False,
) -> bool:
    """Same per-shape policy as solve(), applied to the per-device shapes.

    ``platform`` is the MESH devices' platform (not jax.default_backend():
    a CPU mesh in a TPU-default session must not be handed Mosaic kernels —
    see host_callbacks_supported's mixed-backend note).  With ``quant`` the
    mesh path always dequantizes shard-locally and runs the XLA step, so an
    explicit backend='pallas' request is an error rather than a silent
    downgrade (the single-device rule: resolve_step_fn honors pallas+int8
    in-register per-column kernels, but on the mesh the dequant-wrapped step
    would materialize f32 X per iteration, defeating the quantization)."""
    if quant:
        if config.backend == "pallas":
            raise NotImplementedError(
                "backend='pallas' with int8 X is not supported on a mesh: "
                "the mesh int8 path dequantizes shard-locally into the XLA "
                "step (Mosaic's uint8 load path is ~1000x slower than the "
                "math it feeds, measured) — use backend='auto'"
            )
        return False
    if config.backend == "pallas":
        return True
    if config.backend == "jnp" or platform != "tpu":
        return False
    from ..utils.autotune import rule_pick

    return (
        rule_pick(local_m, k, local_n, config.precision.matmul_dtype)
        == "pallas"
    )


def _mesh_platform(mesh: Mesh) -> str:
    return list(mesh.devices.flat)[0].platform


def _emit_live_origin(it, cost, rel):
    """Live-metrics emitter gated to mesh coordinate (0, 0): a pod prints
    one line per check, not one per device (callbacks in the untaken
    lax.cond branch do not fire).  Shared by every sharded builder."""
    from ..utils.metrics import emit_live

    is_origin = jnp.logical_and(
        jax.lax.axis_index(ROW_AXIS) == 0, jax.lax.axis_index(COL_AXIS) == 0
    )
    jax.lax.cond(
        is_origin,
        lambda: jax.debug.callback(emit_live, it, cost, rel),
        lambda: None,
    )


def _quant_specs(precision):
    """shard_map PartitionSpec for a quantized (codes, scales) X pair.

    Codes shard like X.  1-D per-column scales shard over 'mc' with their
    columns.  2-D per-(row-block, column) scales (``Precision.x_quant_rows``)
    keep their full R block rows on every 'mr' shard (R x N/c f32 is tiny)
    and shard columns over 'mc' — each shard gathers the block rows its
    local X rows fall in (see :func:`_dequant_local`), so row-block
    boundaries need not align with shard boundaries.

    Keyed on the CONFIG (the compiled in_specs must exist before any data
    does); mesh.quant_scale_spec is the data-keyed twin used by the
    device_put placement sites — the two must agree, which solve_sharded's
    pre-quantized-pair ndim check enforces at the boundary.
    """
    from .mesh import quant_scale_spec_for

    return (
        P(ROW_AXIS, COL_AXIS),
        quant_scale_spec_for(precision),
    )


def _dequant_local(xx, n_row_shards: int):
    """Dequantize a LOCAL (codes, scales) shard inside shard_map.

    1-D scales: plain per-column dequant (the scale vector is sharded with
    the columns, so the local slice lines up).  2-D (R, N/c) scales: the
    block table is replicated over 'mr'; this shard is the row slice starting
    at global row ``axis_index('mr') * m_loc`` of an ``m_loc * n_row_shards``
    matrix — ops.quant.dequantize_rows owns the block-index math.
    """
    from ..ops.quant import dequantize_rows

    q, s = xx
    m_loc = q.shape[0]
    off = jax.lax.axis_index(ROW_AXIS) * m_loc if s.ndim == 2 else 0
    return dequantize_rows(q, s, off, m_loc * n_row_shards)


def _dq_local_or_id(quant: bool, n_row_shards: int):
    """Identity for dense X; shard-local dequant for (codes, scales) X.
    The one place the masked mesh builders get their dq closure from."""
    if quant:
        return lambda xx: _dequant_local(xx, n_row_shards)
    return lambda xx: xx


def _wrap_dequant_local(step_fn, cost_fn, n_row_shards: int):
    """Wrap a local (step, cost) pair so each use of X dequantizes the
    shard-local (codes, scales) pair in-register — XLA fuses the uint8
    cast + scale multiply into the consuming ops, so int8-stored X never
    re-materializes at f32 in HBM.  The one place the dense/h-only/semi
    mesh builders get their int8 wiring from."""
    return (
        lambda w, h, x: step_fn(w, h, _dequant_local(x, n_row_shards)),
        lambda x, w, h: cost_fn(_dequant_local(x, n_row_shards), w, h),
    )


def update_h_sharded(
    w, h, x, eps: float, precision: Precision, fused: bool = False
):
    """H half-update on local shards (w: M/r x K, h: K x N/c, x: M/r x N/c).

    Exact distributed restatement of nmf.cu:118-146: psum over 'mr' makes the
    numerator and colsum(W) global; clamps happen AFTER the psum to match the
    single-device semantics.
    """
    if fused:
        from ..ops.pallas import fused_mu

        numer_loc = fused_mu.update_h_fused(
            w, h, x, eps, precision, numerator_only=True
        )
    else:
        z = x / eps_clamp(matmul(w, h, precision), eps)
        numer_loc = matmul(w, z, precision, transpose_a=True)      # (K, N/c)
    numer = jax.lax.psum(numer_loc, ROW_AXIS)
    sum_w = eps_clamp(
        jax.lax.psum(jnp.sum(w, axis=0, dtype=_F32), ROW_AXIS), eps
    )
    return (h * (numer / sum_w[:, None])).astype(h.dtype)


def update_w_sharded(
    w, h, x, eps: float, precision: Precision, fused: bool = False
):
    """W half-update on local shards; psums ride the 'mc' axis."""
    if fused:
        from ..ops.pallas import fused_mu

        numer_loc = fused_mu.update_w_fused(
            w, h, x, eps, precision, numerator_only=True
        )
    else:
        z = x / eps_clamp(matmul(w, h, precision), eps)
        numer_loc = matmul(z, h, precision, transpose_b=True)      # (M/r, K)
    numer = jax.lax.psum(numer_loc, COL_AXIS)
    sum_h = eps_clamp(
        jax.lax.psum(jnp.sum(h, axis=1, dtype=_F32), COL_AXIS), eps
    )
    return (w * (numer / sum_h[None, :])).astype(w.dtype)


def mu_step_sharded(w, h, x, eps, precision, fused=False):
    h = update_h_sharded(w, h, x, eps, precision, fused)
    w = update_w_sharded(w, h, x, eps, precision, fused)
    return w, h


def update_h_sharded_beta(w, h, x, beta, eps, precision):
    """H half of the sharded beta-MU step: numerator AND denominator are
    K-sized psums over 'mr' (the beta != 1 denominators are data-dependent
    GEMMs, unlike KL's factor sums).  The single source for the full step
    and the h-only mesh builder — the two must stay bit-identical."""
    from ..ops.mu import _beta_ratios

    num, den = _beta_ratios(w, h, x, beta, eps, precision)
    h_num = jax.lax.psum(matmul(w, num, precision, transpose_a=True), ROW_AXIS)
    h_den = eps_clamp(
        jax.lax.psum(matmul(w, den, precision, transpose_a=True), ROW_AXIS), eps
    )
    return (h * (h_num / h_den)).astype(h.dtype)


def update_h_sharded_reg(w, h, x, eps, precision, l1_h=0.0, l2_h=0.0):
    """H half of the sharded penalized KL step (shared by the full step and
    the h-only builder).  The penalty gradient reads only the local H shard;
    communication is the plain KL pattern."""
    z = x / eps_clamp(matmul(w, h, precision), eps)
    numer = jax.lax.psum(matmul(w, z, precision, transpose_a=True), ROW_AXIS)
    sum_w = eps_clamp(
        jax.lax.psum(jnp.sum(w, axis=0, dtype=_F32), ROW_AXIS), eps
    )
    denom = sum_w[:, None] + l1_h + l2_h * h.astype(_F32)
    return (h * (numer / denom)).astype(h.dtype)


def update_h_sharded_masked(w, h, x, mask, eps, precision, l1_h=0.0, l2_h=0.0):
    """H half of the sharded masked/weighted KL step: both numerator and
    mask-GEMM denominator psum over 'mr', clamp AFTER the psum (single-device
    order); penalties join after the clamp.  Shared by the full masked step
    and the masked h-only builder."""
    z = mask * (x / eps_clamp(matmul(w, h, precision), eps))
    numer = jax.lax.psum(matmul(w, z, precision, transpose_a=True), ROW_AXIS)
    denom = eps_clamp(
        jax.lax.psum(matmul(w, mask, precision, transpose_a=True), ROW_AXIS),
        eps,
    ) + l1_h + l2_h * h.astype(_F32)
    return (h * (numer / denom)).astype(h.dtype)


def hals_update_h_sharded(w, h, x, eps, precision):
    """H half of the sharded HALS iteration: K-sized Gram/cross psums over
    'mr', then the zero-communication local column sweep.  Shared by the
    full HALS step and the h-only builder."""
    from ..ops.hals import cd_sweep_h

    wtx = jax.lax.psum(matmul(w, x, precision, transpose_a=True), ROW_AXIS)
    wtw = jax.lax.psum(matmul(w, w, precision, transpose_a=True), ROW_AXIS)
    return cd_sweep_h(h, wtx, wtw, eps)


def mu_step_sharded_beta(w, h, x, beta, eps, precision):
    """Sharded beta-divergence MU step (beta=1 should use mu_step_sharded)."""
    from ..ops.mu import _beta_ratios

    h = update_h_sharded_beta(w, h, x, beta, eps, precision)

    num, den = _beta_ratios(w, h, x, beta, eps, precision)
    w_num = jax.lax.psum(matmul(num, h, precision, transpose_b=True), COL_AXIS)
    w_den = eps_clamp(
        jax.lax.psum(matmul(den, h, precision, transpose_b=True), COL_AXIS), eps
    )
    w = (w * (w_num / w_den)).astype(w.dtype)
    return w, h


def hals_step_sharded(w, h, x, eps, precision):
    """Sharded HALS outer iteration (distributed ops.hals.hals_step).

    HALS's sequential coordinate sweep runs over the RANK axis, which the
    canonical layout replicates — so only the Gram/cross products cross
    devices, and they psum exactly like the MU numerators:

        W^T X -> psum over 'mr' (K x N/c)    W^T W -> psum 'mr' (K x K)
        X H^T -> psum over 'mc' (M/r x K)    H H^T -> psum 'mc' (K x K)

    The coordinate sweeps (ops.hals.cd_sweep_{h,w}) then refine the local
    H column / W row shards with zero further communication; the W sweep
    uses the post-sweep H, matching the single-device ordering.
    """
    from ..ops.hals import cd_sweep_w

    h = hals_update_h_sharded(w, h, x, eps, precision)

    xht = jax.lax.psum(matmul(x, h, precision, transpose_b=True), COL_AXIS)
    hht = jax.lax.psum(matmul(h, h, precision, transpose_b=True), COL_AXIS)
    w = cd_sweep_w(w, xht, hht, eps)
    return w, h


def mu_step_sharded_reg(
    w, h, x, eps, precision, l1_w=0.0, l1_h=0.0, l2_w=0.0, l2_h=0.0
):
    """Sharded L1/L2-penalized KL MU step (distributed ops.mu.mu_step_kl_reg).

    The penalty gradients are purely local (they read only the factor shard
    being updated), so the communication pattern is identical to the plain
    KL step: K-sized psums of the numerator and factor sums.
    """
    h = update_h_sharded_reg(w, h, x, eps, precision, l1_h, l2_h)

    z = x / eps_clamp(matmul(w, h, precision), eps)
    numer = jax.lax.psum(matmul(z, h, precision, transpose_b=True), COL_AXIS)
    sum_h = eps_clamp(
        jax.lax.psum(jnp.sum(h, axis=1, dtype=_F32), COL_AXIS), eps
    )
    denom = sum_h[None, :] + l1_w + l2_w * w.astype(_F32)
    w = (w * (numer / denom)).astype(w.dtype)
    return w, h


def reg_cost_partial(x, w, h, eps, l1_w, l1_h, l2_w, l2_h, n_row, n_col):
    """Local partial of the penalized KL objective.

    W is replicated over the 'mc' axis (n_col copies) and H over 'mr'
    (n_row copies), so each local penalty term is divided by its replication
    count — the psum over both axes then reproduces the global penalty
    exactly once.
    """
    wf, hf = w.astype(_F32), h.astype(_F32)
    pen_w = (l1_w * jnp.sum(jnp.abs(wf)) + 0.5 * l2_w * jnp.sum(wf * wf)) / n_col
    pen_h = (l1_h * jnp.sum(jnp.abs(hf)) + 0.5 * l2_h * jnp.sum(hf * hf)) / n_row
    return kl_partial(x, w, h, eps) + pen_w + pen_h


def mu_step_sharded_masked(
    w, h, x, mask, eps, precision,
    l1_w=0.0, l1_h=0.0, l2_w=0.0, l2_h=0.0,
):
    """Sharded masked/weighted KL MU step (distributed models.masked).

    The mask shards exactly like X — P('mr', 'mc') — and both denominators
    are mask GEMMs, so they psum over the same axes as the numerators
    (the clamp happens AFTER the psum, matching the single-device order;
    the optional penalty gradients are local and join after the clamp,
    matching models.masked.mu_step_masked).
    """
    h = update_h_sharded_masked(w, h, x, mask, eps, precision, l1_h, l2_h)

    z = mask * (x / eps_clamp(matmul(w, h, precision), eps))
    numer = jax.lax.psum(matmul(z, h, precision, transpose_b=True), COL_AXIS)
    denom = eps_clamp(
        jax.lax.psum(matmul(mask, h, precision, transpose_b=True), COL_AXIS),
        eps,
    ) + l1_w + l2_w * w.astype(_F32)
    w = (w * (numer / denom)).astype(w.dtype)
    return w, h


def masked_kl_partial(
    x, w, h, mask, eps: float,
    l1_w=0.0, l1_h=0.0, l2_w=0.0, l2_h=0.0, n_row=1, n_col=1,
):
    """Local-block masked KL partial (X/mask blocks are disjoint: psum both).

    Penalty partials are normalized by the factor replication counts (W is
    replicated n_col times, H n_row times) so the global psum counts each
    penalty exactly once."""
    y = eps_clamp(matmul(w, h, Precision("float32", "float32")), eps)
    xf = x.astype(_F32)
    # x -> 0 limit of x*log(x/y) (see models.masked.masked_kl)
    xlog = jnp.where(xf > 0, xf * (jnp.log(xf) - jnp.log(y)), 0.0)
    total = jnp.sum(mask * (xlog - xf + y))
    if l1_w or l1_h or l2_w or l2_h:
        wf, hf = w.astype(_F32), h.astype(_F32)
        total = total + (
            l1_w * jnp.sum(jnp.abs(wf)) + 0.5 * l2_w * jnp.sum(wf * wf)
        ) / n_col + (
            l1_h * jnp.sum(jnp.abs(hf)) + 0.5 * l2_h * jnp.sum(hf * hf)
        ) / n_row
    return total


def kl_partial(x, w, h, eps: float):
    """Local-block KL partial sum; callers psum it over both mesh axes.

    X blocks are disjoint across the mesh, so the psum of local partials is
    the exact global divergence (matrix.cu:592 formula).
    """
    y = matmul(w, h, Precision("float32", "float32"))
    return kl_divergence_from_recon(x, y, eps)


def beta_partial(x, w, h, beta: float, eps: float):
    """Local-block beta-divergence partial sum (elementwise in (x, y))."""
    b = float(beta)
    if b == 1.0:
        return kl_partial(x, w, h, eps)
    y = eps_clamp(matmul(w, h, Precision("float32", "float32")), eps)
    xf = x.astype(jnp.float32)
    if b == 2.0:
        d = xf - y
        return 0.5 * jnp.sum(d * d)
    if b == 0.0:
        r = eps_clamp(xf, eps) / y
        return jnp.sum(r - jnp.log(r) - 1.0)
    xc = eps_clamp(xf, eps)
    return jnp.sum(
        (xc ** b + (b - 1.0) * y ** b - b * xc * y ** (b - 1.0)) / (b * (b - 1.0))
    )


def solve_sharded(
    x,
    w0,
    h0,
    config: SolveConfig = SolveConfig(),
    mesh: Optional[Mesh] = None,
    clamp_inputs: bool = True,
    initial_cost: float = float("nan"),
    initial_momentum: float = float("nan"),
    initial_extrap=None,
) -> SolveResult:
    """Distributed ``solve``: same semantics, sharded over the mesh.

    Inputs may be host arrays (they are placed with the canonical shardings)
    or already-sharded jax.Arrays.  Result W/H come back sharded; scalars and
    cost history are fully replicated.  ``initial_momentum`` resumes the
    accelerated loop's adapted coefficient across segments (NaN = fresh).
    """
    config.validate()
    mesh = mesh if mesh is not None else make_mesh()
    eps, precision = config.eps, config.precision
    quant = precision.x_dtype == "int8"
    if isinstance(x, tuple) and not quant:
        raise ValueError(
            "X is a pre-quantized (codes, scales) pair but "
            f"Precision(x_dtype={precision.x_dtype!r}) — pre-quantized input "
            "requires x_dtype='int8' (quantize with ops.quant.quantize_policy "
            "on the same Precision)"
        )
    if quant and isinstance(x, tuple):
        # the compiled program's scale PartitionSpec is keyed on the config
        # (_quant_specs), so a pre-quantized pair must match the knob
        want = 2 if precision.x_quant_rows else 1
        if x[1].ndim != want:
            raise ValueError(
                f"pre-quantized scales are {x[1].ndim}-D but "
                f"Precision(x_quant_rows={precision.x_quant_rows}) expects "
                f"{want}-D — quantize with ops.quant.quantize_policy on the "
                f"same Precision"
            )

    sd = jnp.dtype(config.precision.state_dtype)
    xd = jnp.dtype(config.precision.x_dtype)
    shape_x = jnp.shape(x[0]) if isinstance(x, tuple) else jnp.shape(x)
    shape_w, shape_h = jnp.shape(w0), jnp.shape(h0)
    if shape_x != (shape_w[0], shape_h[1]) or shape_w[1] != shape_h[0]:
        raise ValueError(
            f"shape mismatch: X{shape_x} vs W{shape_w} @ H{shape_h}"
        )
    if clamp_inputs:
        w0 = jnp.maximum(jnp.asarray(w0, sd), jnp.asarray(eps, sd))
        h0 = jnp.maximum(jnp.asarray(h0, sd), jnp.asarray(eps, sd))
        if isinstance(x, tuple):
            pass  # pre-quantized pair: clamped at quantize time
        elif quant:
            from ..ops.quant import quantize_policy

            x = quantize_policy(
                jnp.maximum(jnp.asarray(x, _F32), jnp.asarray(eps, _F32)),
                eps,
                precision.x_quant_rows,
            )
        else:
            x = jnp.maximum(jnp.asarray(x, _F32), jnp.asarray(eps, _F32))
            x = x.astype(xd)
    else:
        # pre-clamped device-resident inputs (checkpoint segments): no extra
        # passes over X, and already-sharded buffers flow through untouched
        w0 = jnp.asarray(w0, sd)
        h0 = jnp.asarray(h0, sd)
        if quant:
            if not isinstance(x, tuple):
                from ..ops.quant import quantize_policy

                x = quantize_policy(
                    jnp.maximum(jnp.asarray(x, _F32), jnp.asarray(eps, _F32)),
                    eps,
                    precision.x_quant_rows,
                )
        else:
            x = jnp.asarray(x, xd)
    fused = config.algorithm == "mu" and _use_fused(
        config,
        shape_x[0] // mesh.shape[ROW_AXIS],
        w0.shape[1],
        shape_x[1] // mesh.shape[COL_AXIS],
        _mesh_platform(mesh),
        quant=quant,
    )
    if quant:
        from jax.sharding import NamedSharding

        from .mesh import nmf_shardings

        xs_, ws_, hs_, _ = nmf_shardings(mesh)
        _, s_spec = _quant_specs(precision)
        x = (
            jax.device_put(x[0], xs_),
            jax.device_put(x[1], NamedSharding(mesh, s_spec)),
        )
        w0 = jax.device_put(w0, ws_)
        h0 = jax.device_put(h0, hs_)
    else:
        x, w0, h0 = shard_problem(x, w0, h0, mesh)

    from ..models.solver import maybe_live_chunked

    fallback = maybe_live_chunked(
        lambda c: build_sharded_solver(c, mesh, fused=fused),
        x, w0, h0, config, mesh, initial_cost=initial_cost,
        initial_momentum=float(initial_momentum),
        initial_extrap=initial_extrap,
    )
    if fallback is not None:
        return fallback
    fn = build_sharded_solver(config, mesh, fused=fused)
    kw = {} if initial_extrap is None else {"initial_extrap": initial_extrap}
    return fn(
        x, w0, h0,
        jnp.asarray(initial_cost, _F32),
        jnp.asarray(initial_momentum, _F32),
        **kw,
    )


def build_sharded_solver(config: SolveConfig, mesh: Mesh, fused: bool = False):
    """The jitted shard_map solve program for a config + mesh (cached: the
    chunked live-metrics fallback and the checkpointed driver re-request the
    same program per segment, and a retrace costs a 10-60 s remote compile
    round trip on this platform).  This thin wrapper normalizes the call
    form so positional and keyword invocations share one cache entry."""
    return _build_sharded_solver_cached(config, mesh, bool(fused))


def _finish_sharded_builder(local_solve, in_specs, out_specs, mesh, config, donate):
    """shard_map + jit a sharded segment solver.

    For accelerated configs this appends the extrapolation-pair operands
    (sharded like W/H) behind the segment contract's optional
    ``initial_extrap`` kwarg: a chunked segment driver passes the previous
    segment's carry and gets the new carry back in ``res.w_ex``/``res.h_ex``;
    a direct call defaults the carry to the iterate — the one-jit accel
    loop's own init — and the carry outputs are dropped from the returned
    pytree (so XLA never materializes the extra factor-sized buffers there).
    ``local_solve`` must accept ``initial_extrap=(w_ex, h_ex)`` as a kwarg.
    """
    if not config.accelerate:
        return jax.jit(
            jax.shard_map(
                local_solve, mesh=mesh, in_specs=tuple(in_specs),
                out_specs=out_specs, check_vma=False,
            ),
            donate_argnums=donate,
        )

    def local_accel(*args):
        *base, wex, hex_ = args
        return local_solve(*base, initial_extrap=(wex, hex_))

    out_specs = dataclasses.replace(
        out_specs, w_ex=P(ROW_AXIS, None), h_ex=P(None, COL_AXIS)
    )
    smapped = jax.shard_map(
        local_accel, mesh=mesh,
        in_specs=tuple(in_specs) + (P(ROW_AXIS, None), P(None, COL_AXIS)),
        out_specs=out_specs, check_vma=False,
    )

    def fn(*args, initial_extrap=None):
        # args[1]/args[2] are W/H in every sharded builder
        wex, hex_ = (
            initial_extrap if initial_extrap is not None else (args[1], args[2])
        )
        res = smapped(*args, wex, hex_)
        if initial_extrap is None:
            res = dataclasses.replace(res, w_ex=None, h_ex=None)
        return res

    return jax.jit(fn, donate_argnums=donate)


def _sharded_family_fns(config: SolveConfig, mesh: Mesh, fused: bool):
    """Per-family (step_fn, cost_fn) for the canonical mesh layout (shared
    by the full solver and the semi-adaptive wrapper)."""
    eps, precision = config.eps, config.precision
    if config.algorithm == "hals":
        step_fn = functools.partial(
            hals_step_sharded, eps=eps, precision=precision
        )
        cost_fn = functools.partial(beta_partial, beta=2.0, eps=eps)
    elif config.beta == 1.0 and config.regularized:
        step_fn = functools.partial(
            mu_step_sharded_reg, eps=eps, precision=precision,
            l1_w=config.l1_w, l1_h=config.l1_h,
            l2_w=config.l2_w, l2_h=config.l2_h,
        )
        cost_fn = functools.partial(
            reg_cost_partial, eps=eps,
            l1_w=config.l1_w, l1_h=config.l1_h,
            l2_w=config.l2_w, l2_h=config.l2_h,
            n_row=mesh.shape[ROW_AXIS], n_col=mesh.shape[COL_AXIS],
        )
    elif config.beta == 1.0:
        step_fn = functools.partial(
            mu_step_sharded, eps=eps, precision=precision, fused=fused
        )
        cost_fn = functools.partial(kl_partial, eps=eps)
    else:
        step_fn = functools.partial(
            mu_step_sharded_beta, beta=config.beta, eps=eps, precision=precision
        )
        cost_fn = functools.partial(beta_partial, beta=config.beta, eps=eps)

    if precision.x_dtype == "int8":
        step_fn, cost_fn = _wrap_dequant_local(
            step_fn, cost_fn, mesh.shape[ROW_AXIS]
        )
    return step_fn, cost_fn


@functools.lru_cache(maxsize=32)
def _build_sharded_solver_cached(config: SolveConfig, mesh: Mesh, fused: bool):
    """(implementation behind build_sharded_solver — see its docstring)

    Exposed separately so callers can AOT-lower/compile it (e.g. validating
    the SPMD partitioning of pod-scale shapes with abstract inputs before any
    memory is allocated — see tests/test_podscale.py).
    """
    quant = config.precision.x_dtype == "int8"
    step_fn, cost_fn = _sharded_family_fns(config, mesh, fused)

    def local_solve(x_loc, w_loc, h_loc, initial_cost, initial_momentum,
                    initial_extrap=None):
        return run_checked_loop(
            x_loc,
            w_loc,
            h_loc,
            config,
            step_fn,
            cost_fn,
            all_reduce=lambda c: jax.lax.psum(c, (ROW_AXIS, COL_AXIS)),
            initial_cost=initial_cost,
            live_emit=_emit_live_origin,
            initial_momentum=initial_momentum,
            initial_extrap=initial_extrap,
        )

    out_specs = SolveResult(
        w=P(ROW_AXIS, None),
        h=P(None, COL_AXIS),
        iterations=P(),
        cost=P(),
        cost_history=P(),
        num_checks=P(),
        converged=P(),
        momentum=P(),
    )
    # w/h donated: the result factors alias the input state buffers, so a
    # chained (segmented) solve never holds two copies of W/H per device.
    x_spec = (
        _quant_specs(config.precision) if quant else P(ROW_AXIS, COL_AXIS)
    )
    return _finish_sharded_builder(
        local_solve,
        (x_spec, P(ROW_AXIS, None), P(None, COL_AXIS), P(), P()),
        out_specs, mesh, config, donate=(1, 2),
    )


# ---------------------------------------------------------------------------
# Masked NMF on a mesh (the distributed models.masked solver): the mask
# shards exactly like X, everything else follows the canonical layout.
# ---------------------------------------------------------------------------


def build_sharded_masked_solver(config: SolveConfig, mesh: Mesh):
    """Jitted shard_map solver for masked KL-MU (see models.masked)."""
    eps, precision = config.eps, config.precision
    quant = precision.x_dtype == "int8"
    pens = dict(
        l1_w=config.l1_w, l1_h=config.l1_h, l2_w=config.l2_w, l2_h=config.l2_h
    )
    repl = dict(n_row=mesh.shape[ROW_AXIS], n_col=mesh.shape[COL_AXIS])
    dq = _dq_local_or_id(quant, repl["n_row"])

    def local_solve(x_loc, w_loc, h_loc, mask_loc, initial_cost,
                    initial_momentum, initial_extrap=None):
        step = lambda w, h, xx: mu_step_sharded_masked(
            w, h, dq(xx), mask_loc, eps, precision, **pens
        )
        cost = lambda xx, w, h: masked_kl_partial(
            dq(xx), w, h, mask_loc, eps, **pens, **repl
        )
        return run_checked_loop(
            x_loc, w_loc, h_loc, config, step, cost,
            all_reduce=lambda c: jax.lax.psum(c, (ROW_AXIS, COL_AXIS)),
            initial_cost=initial_cost,
            live_emit=_emit_live_origin,
            initial_momentum=initial_momentum,
            initial_extrap=initial_extrap,
        )

    out_specs = SolveResult(
        w=P(ROW_AXIS, None),
        h=P(None, COL_AXIS),
        iterations=P(),
        cost=P(),
        cost_history=P(),
        num_checks=P(),
        converged=P(),
        momentum=P(),
    )
    x_spec = (
        _quant_specs(config.precision) if quant else P(ROW_AXIS, COL_AXIS)
    )
    return _finish_sharded_builder(
        local_solve,
        (
            x_spec,
            P(ROW_AXIS, None),
            P(None, COL_AXIS),
            P(ROW_AXIS, COL_AXIS),
            P(),
            P(),
        ),
        out_specs, mesh, config, donate=(1, 2),
    )


# ---------------------------------------------------------------------------
# H-only solve on a mesh (the inference/transform path at pod scale): W is
# fixed and replicated over 'mc'; only H's K-sized numerator psums per step.
# ---------------------------------------------------------------------------


def build_sharded_h_solver(config: SolveConfig, mesh: Mesh):
    """Jitted shard_map H-only solver (distributed models.nmf.solve_h_only).

    Supports the MU families (any beta, the KL+penalty variant) and HALS:
    the HALS row sweep is elementwise over H's sharded column axis, so only
    the K-sized W^T X / W^T W products psum (over 'mr').
    """
    eps, precision = config.eps, config.precision
    r = mesh.shape[ROW_AXIS]

    if config.algorithm == "hals":

        def step(w, h, x):
            return w, hals_update_h_sharded(w, h, x, eps, precision)

        cost = functools.partial(beta_partial, beta=2.0, eps=eps)
    elif config.beta == 1.0 and config.regularized:

        def step(w, h, x):
            return w, update_h_sharded_reg(
                w, h, x, eps, precision, config.l1_h, config.l2_h
            )

        def cost(x, w, h):
            # matches models.nmf._h_only_jit: H-penalty terms only; H is
            # replicated over 'mr' so divide by r before the global psum
            hf = h.astype(_F32)
            pen = (
                config.l1_h * jnp.sum(jnp.abs(hf))
                + 0.5 * config.l2_h * jnp.sum(hf * hf)
            ) / r
            return kl_partial(x, w, h, eps) + pen

    elif config.beta == 1.0:

        def step(w, h, x):
            return w, update_h_sharded(w, h, x, eps, precision)

        cost = functools.partial(kl_partial, eps=eps)
    else:

        def step(w, h, x):
            return w, update_h_sharded_beta(
                w, h, x, config.beta, eps, precision
            )

        cost = functools.partial(beta_partial, beta=config.beta, eps=eps)

    def local_solve(x_loc, w_loc, h_loc, initial_cost, initial_momentum,
                    initial_extrap=None):
        return run_checked_loop(
            x_loc, w_loc, h_loc, config, step, cost,
            all_reduce=lambda c: jax.lax.psum(c, (ROW_AXIS, COL_AXIS)),
            initial_cost=initial_cost,
            live_emit=_emit_live_origin,
            initial_momentum=initial_momentum,
            initial_extrap=initial_extrap,
        )

    if config.precision.x_dtype == "int8":
        # codes shard like X; scales per _quant_specs; dequant is
        # shard-local and in-register (X stays 1/4-size in HBM)
        step, cost = _wrap_dequant_local(step, cost, mesh.shape[ROW_AXIS])
        x_spec = _quant_specs(config.precision)
    else:
        x_spec = P(ROW_AXIS, COL_AXIS)

    out_specs = SolveResult(
        w=P(ROW_AXIS, None),
        h=P(None, COL_AXIS),
        iterations=P(),
        cost=P(),
        cost_history=P(),
        num_checks=P(),
        converged=P(),
        momentum=P(),
    )
    # only H is donated: W is fixed and callers commonly reuse it across
    # transform() calls
    return _finish_sharded_builder(
        local_solve,
        (x_spec, P(ROW_AXIS, None), P(None, COL_AXIS), P(), P()),
        out_specs, mesh, config, donate=(2,),
    )


@functools.lru_cache(maxsize=8)
def build_sharded_semi_solver(config: SolveConfig, mesh: Mesh, fused: bool = False):
    """Semi-adaptive solve on the mesh: dictionary columns under the frozen
    mask keep their initial values while the rest train (models.semi).  The
    frozen source is the initial local W shard; the (K,) column mask is
    replicated.  ``fused`` picks the fused Pallas KL step exactly as the
    full sharded solver does (the freeze applies after the step)."""
    if config.algorithm == "hals":
        raise NotImplementedError(
            "HALS's in-place W sweep reads columns mid-update; frozen "
            "columns need the MU families"
        )
    quant = config.precision.x_dtype == "int8"
    step_fn, cost_fn = _sharded_family_fns(config, mesh, fused=fused)

    def local_solve(x_loc, w_loc, h_loc, mk, initial_cost, initial_momentum,
                    initial_extrap=None):
        # frozen source = the initial local dictionary shard (W therefore
        # not donated: its pre-loop value stays live for the whole run)
        w_frz_loc = w_loc

        def step(w, h, x):
            w2, h2 = step_fn(w, h, x)
            w2 = jnp.where(mk[None, :], w_frz_loc, w2).astype(w2.dtype)
            return w2, h2

        return run_checked_loop(
            x_loc, w_loc, h_loc, config, step, cost_fn,
            all_reduce=lambda c: jax.lax.psum(c, (ROW_AXIS, COL_AXIS)),
            initial_cost=initial_cost,
            live_emit=_emit_live_origin,
            initial_momentum=initial_momentum,
            initial_extrap=initial_extrap,
        )

    out_specs = SolveResult(
        w=P(ROW_AXIS, None),
        h=P(None, COL_AXIS),
        iterations=P(),
        cost=P(),
        cost_history=P(),
        num_checks=P(),
        converged=P(),
        momentum=P(),
    )
    x_spec = (
        _quant_specs(config.precision) if quant else P(ROW_AXIS, COL_AXIS)
    )
    return _finish_sharded_builder(
        local_solve,
        (x_spec, P(ROW_AXIS, None), P(None, COL_AXIS), P(), P(), P()),
        out_specs, mesh, config, donate=(2,),
    )


@functools.lru_cache(maxsize=8)
def build_sharded_masked_h_solver(config: SolveConfig, mesh: Mesh):
    """Mesh masked H-only (models.masked.solve_masked_h_only): the mask
    shards like X; both K-sized mask-GEMMs psum over 'mr' (W fixed,
    replicated over 'mc')."""
    eps, prec = config.eps, config.precision
    quant = prec.x_dtype == "int8"
    l1_h, l2_h = config.l1_h, config.l2_h
    r = mesh.shape[ROW_AXIS]
    dq = _dq_local_or_id(quant, r)

    def step(w, h, xm):
        return w, update_h_sharded_masked(
            w, h, dq(xm[0]), xm[1], eps, prec, l1_h, l2_h
        )

    def cost(xm, w, h):
        x, m_loc = dq(xm[0]), xm[1]
        part = masked_kl_partial(x, w, h, m_loc, eps)
        hf = h.astype(_F32)
        # H-side penalties only, replication-normalized over 'mr'
        part = part + (
            l1_h * jnp.sum(jnp.abs(hf)) + 0.5 * l2_h * jnp.sum(hf * hf)
        ) / r
        return part

    def local_solve(xm_loc, w_loc, h_loc, initial_cost, initial_momentum,
                    initial_extrap=None):
        return run_checked_loop(
            xm_loc, w_loc, h_loc, config, step, cost,
            all_reduce=lambda c: jax.lax.psum(c, (ROW_AXIS, COL_AXIS)),
            initial_cost=initial_cost,
            live_emit=_emit_live_origin,
            initial_momentum=initial_momentum,
            initial_extrap=initial_extrap,
        )

    out_specs = SolveResult(
        w=P(ROW_AXIS, None), h=P(None, COL_AXIS), iterations=P(), cost=P(),
        cost_history=P(), num_checks=P(), converged=P(), momentum=P(),
    )
    x_spec = (
        _quant_specs(config.precision) if quant else P(ROW_AXIS, COL_AXIS)
    )
    return _finish_sharded_builder(
        local_solve,
        (
            (x_spec, P(ROW_AXIS, COL_AXIS)),
            P(ROW_AXIS, None), P(None, COL_AXIS), P(), P(),
        ),
        out_specs, mesh, config, donate=(2,),
    )
