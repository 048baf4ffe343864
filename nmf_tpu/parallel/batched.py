"""Batched NMF: factorize many independent matrices at once.

The reference has no batching; BASELINE.json config 4 (128 independent
513x2000 spectrograms on one chip) is the target workload.  ``vmap`` gives
this "free by construction" (SURVEY.md section 7 step 6): the batched solver
is literally ``vmap`` of the single-problem while_loop — XLA batches every
GEMM into one larger MXU contraction.

Semantics note: a vmapped ``while_loop`` keeps iterating until EVERY batch
member's predicate is false, masking updates for finished members — so with
``thresh > 0`` each problem stops changing at ITS OWN convergence point, and
``iterations``/``cost`` come back per-problem.  With ``thresh == 0`` all
members run exactly ``max_iter`` iterations (the determinism contract).

For multi-chip batched execution pass a mesh: the batch axis is sharded
across all devices (pure data parallelism — zero per-iteration collectives).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.solver import SolveResult, resolve_step_fn, run_checked_loop, _cost_fn
from ..utils.config import SolveConfig

__all__ = ["solve_batched"]

_F32 = jnp.float32


def _batched_prep_jit(config: SolveConfig, masked: bool = False):
    """Batched counterpart of models.solver._prep_jit: clamp + dtype casts
    (+ mask cast and unobserved-entry zeroing + per-member column
    quantization — codes [B,M,N], scales [B,N]) in ONE program launch.
    Keyed by (precision, eps, masked) only — loop parameters do not change
    the prep program."""
    return _batched_prep_jit_cached(config.precision, config.eps, masked)


@functools.lru_cache(maxsize=8)
def _batched_prep_jit_cached(precision, eps: float, masked: bool = False):
    sd = jnp.dtype(precision.state_dtype)
    quant = precision.x_dtype == "int8"

    @jax.jit
    def prep(x, w, h, mask=None):
        w = jnp.maximum(w.astype(sd), jnp.asarray(eps, sd))
        h = jnp.maximum(h.astype(sd), jnp.asarray(eps, sd))
        x = jnp.maximum(x.astype(_F32), jnp.asarray(eps, _F32))
        if masked:
            # zero the unobserved entries for EVERY storage dtype: masked
            # values may be garbage (NaN/Inf holes are the standard
            # missing-data encoding), and 0 * NaN = NaN would poison the
            # member despite mask == 0.  For finite inputs this is
            # bit-neutral (the updates multiply those entries by 0 anyway);
            # for int8 it additionally keeps garbage out of the scales.
            mask = mask.astype(_F32)
            x = jnp.where(mask > 0, x, 0.0)
        if quant:
            from ..ops.quant import quantize_policy

            x = jax.vmap(
                lambda xi: quantize_policy(xi, eps, precision.x_quant_rows)
            )(x)
        else:
            x = x.astype(jnp.dtype(precision.x_dtype))
        return (x, w, h, mask) if masked else (x, w, h)

    return prep


@functools.lru_cache(maxsize=16)
def _batched_jit(config: SolveConfig, platform: Optional[str]):
    if config.live_metrics:
        # a vmapped debug callback would fire once per batch member per
        # check; per-member live streaming is not meaningful here
        import dataclasses

        config = dataclasses.replace(config, live_metrics=False)
    step_fn = resolve_step_fn(config, platform)
    cost_fn = _cost_fn(config, platform)

    def one(x, w, h):
        return run_checked_loop(x, w, h, config, step_fn, cost_fn)

    # donated state: result factors alias the input W/H buffers per batch
    return jax.jit(jax.vmap(one), donate_argnums=(1, 2))


@functools.lru_cache(maxsize=8)
def _batched_masked_jit(config: SolveConfig):
    """vmapped masked KL solve: per-member (x, w, h, mask)."""
    if config.live_metrics:
        import dataclasses

        config = dataclasses.replace(config, live_metrics=False)
    from ..models.masked import _dq_or_id, masked_kl, mu_step_masked

    eps, prec = config.eps, config.precision
    pens = dict(
        l1_w=config.l1_w, l1_h=config.l1_h, l2_w=config.l2_w, l2_h=config.l2_h
    )
    dq = _dq_or_id(prec)  # per-member (codes, scales) dequant for int8 X

    def one(x, w, h, mask):
        step = lambda w_, h_, x_: mu_step_masked(
            w_, h_, dq(x_), mask, eps, prec, **pens
        )
        cost = lambda x_, w_, h_: masked_kl(dq(x_), w_, h_, mask, eps, **pens)
        return run_checked_loop(x, w, h, config, step, cost)

    return jax.jit(jax.vmap(one), donate_argnums=(1, 2))


def solve_batched(
    x,
    w0,
    h0,
    config: SolveConfig = SolveConfig(),
    mesh: Optional[Mesh] = None,
    clamp_inputs: bool = True,
    mask=None,
) -> SolveResult:
    """Solve a batch: x [B,M,N], w0 [B,M,K], h0 [B,K,N] -> batched SolveResult.

    With ``mesh`` the batch dimension is sharded over ALL the mesh's devices
    (pure data parallelism — a 2-D mesh is flattened, not half-replicated);
    B must divide the mesh's total device count evenly.

    ``mask`` ([B,M,N], optional) runs the masked/weighted KL solve per
    member — each problem sees only its own ``mask != 0`` entries (the
    batched counterpart of :func:`nmf_tpu.solve_masked`); unobserved X
    entries may be garbage, including NaN/Inf.

    Buffer ownership follows :func:`nmf_tpu.solve`: the member state stacks
    are DONATED to the compiled program, so with ``clamp_inputs=False`` and
    device-resident arrays the caller's ``w0``/``h0`` are consumed.
    ``live_metrics`` is normalized off (a per-member-per-check callback
    storm is noise, not observability) — read ``cost_history`` per member.
    """
    config.validate()
    quant = config.precision.x_dtype == "int8"
    if isinstance(x, tuple):
        raise ValueError(
            "solve_batched takes the dense [B, M, N] stack and quantizes "
            "each member internally (codes [B,M,N] + per-member scales); "
            "pre-quantized (codes, scales) pairs are accepted by "
            "solve/solve_sharded/solve_h_only"
        )
    if mask is not None:
        if config.beta != 1.0 or config.algorithm != "mu":
            raise NotImplementedError(
                "masked solve implements the KL (beta=1) MU family"
            )
    sd = jnp.dtype(config.precision.state_dtype)
    sx, sw, sh = jnp.shape(x), jnp.shape(w0), jnp.shape(h0)
    if len(sx) != 3 or len(sw) != 3 or len(sh) != 3:
        raise ValueError("solve_batched expects 3-D [batch, rows, cols] arrays")
    if not (sx[0] == sw[0] == sh[0]):
        raise ValueError(
            f"batch sizes disagree: X{sx[0]} W{sw[0]} H{sh[0]}"
        )
    if sx[1:] != (sw[1], sh[2]) or sw[2] != sh[1]:
        raise ValueError(f"shape mismatch: X{sx} vs W{sw} @ H{sh}")
    if mask is not None and jnp.shape(mask) != sx:
        raise ValueError(f"mask shape {jnp.shape(mask)} != X shape {sx}")
    if clamp_inputs:
        # one program launch for clamp + casts (+ mask zeroing + per-member
        # int8 quantization) — eager per-op dispatches are tunnel RPCs here
        if mask is not None:
            x, w0, h0, mask = _batched_prep_jit(config, masked=True)(
                x, w0, h0, mask
            )
        else:
            x, w0, h0 = _batched_prep_jit(config)(x, w0, h0)
    else:
        x = jnp.asarray(x, _F32)
        w0 = jnp.asarray(w0, sd)
        h0 = jnp.asarray(h0, sd)
        if mask is not None:
            mask = jnp.asarray(mask, _F32)
            # unobserved entries may be garbage for every storage dtype
            x = jnp.where(mask > 0, x, 0.0)
        if quant:
            from ..ops.quant import quantize_policy

            x = jax.vmap(
                lambda xi: quantize_policy(
                    xi, config.eps, config.precision.x_quant_rows
                )
            )(x)
        else:
            x = x.astype(jnp.dtype(config.precision.x_dtype))

    platform = None
    if config.backend in ("auto", "autotune") and config.beta == 1.0:
        # Batched solves default to the jnp/XLA path: vmapping the fused
        # Pallas kernel serializes the batch as an outer grid dimension,
        # while XLA lowers the vmapped update to batched MXU GEMMs.
        # Measured (v5e, bf16, 513x2000 k=32): jnp 86-145k problem-iters/s
        # vs vmapped-pallas 37-72k across B=16..128; same direction at
        # 2048x2048 k=64.  backend='pallas' still forces the kernels.
        import dataclasses

        config = dataclasses.replace(config, backend="jnp")
    if mesh is not None:
        n_dev = int(np.prod(list(mesh.shape.values())))
        b = (x[0] if quant else x).shape[0]
        if b % n_dev:
            raise ValueError(
                f"batch {b} must divide the mesh's {n_dev} devices "
                f"(the batch axis shards over ALL mesh axes)"
            )
        # shard dim 0 over every axis: a 2-D mesh must not silently
        # replicate the members over its second axis
        batch_sharding = NamedSharding(mesh, P(tuple(mesh.axis_names)))
        x, w0, h0 = (jax.device_put(a, batch_sharding) for a in (x, w0, h0))
        if mask is not None:
            mask = jax.device_put(mask, batch_sharding)
        platform = list(mesh.devices.flat)[0].platform

    if mask is not None:
        return _batched_masked_jit(config)(x, w0, h0, mask)
    return _batched_jit(config, platform)(x, w0, h0)
