"""Online (one-pass, streaming) NMF: learn W from an unbounded column stream.

:func:`nmf_tpu.solve_out_of_core` revisits every column block once per
iteration — right when X is finite and fits host storage.  For *unbounded*
streams (a growing catalog, a live audio feed) or when even one pass per
iteration is too expensive, the online algorithm visits each block ONCE per
pass and still learns a full-quality dictionary:

  per incoming block X_b:
    1. fit the block's activations: ``inner_iters`` H-only MU iterations
       against the current W (the reference's update_h, nmf.cu:118-146);
    2. fold the block's W-update sufficient statistics into decayed
       accumulators —
           A <- rho * A + (X_b / clamp(W @ H_b)) @ H_b^T      (M, K)
           c <- rho * c + rowsum(H_b)                         (K,)
    3. apply one multiplicative W step from the aggregate ratio:
           W <- W * A / clamp(c, eps)

This is the KL instance of the sufficient-statistics online-MU family
(Lefevre, Bertin & Badeau 2011, online IS-NMF): each W step is a full MU
step of the exponentially-weighted aggregate objective, so on stationary
data W converges to a batch-quality dictionary while the device holds only
W, the (M, K) + (K,) accumulators, and one block — memory independent of
the stream length, and every block is read exactly once per pass.

``rho`` is the forgetting factor: 1.0 weighs all history equally
(stationary data); < 1 tracks drift.  Each block costs ONE program launch
(the inner H loop, the stats, and the W step are one jitted body).

Activations are not retained (online = dictionary learning); run
:func:`nmf_tpu.transform_out_of_core` afterwards for an H over any corpus.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import numpy as np

from ..utils.config import SolveConfig

__all__ = ["OnlineResult", "solve_online"]


@dataclasses.dataclass
class OnlineResult:
    """Streaming dictionary-learning outcome.  ``block_costs[p][j]`` is the
    KL divergence of pass p's block j measured AFTER its H fit but BEFORE
    the W step (the standard online learning curve — it decreases across
    blocks/passes as W improves)."""

    w: np.ndarray                    # (M, K) float32
    block_costs: List[List[float]]   # per pass, per block
    blocks: List[Tuple[int, int]]
    passes: int

    @property
    def learning_curve(self) -> np.ndarray:
        return np.asarray([c for p in self.block_costs for c in p], np.float64)


@functools.lru_cache(maxsize=8)
def _online_sharded_jit(config: SolveConfig, inner_iters: int, mesh):
    """Mesh block update: W/A row-sharded, the block's X tiled, H col-
    sharded, c replicated — the same K-sized psums as the batch solvers
    (H's update psums over 'mr'; the A/c statistics psum over 'mc')."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ..ops.elementwise import eps_clamp
    from ..ops.mu import _recon_ratio, matmul
    from ..parallel.mesh import COL_AXIS, ROW_AXIS
    from ..parallel.sharded import kl_partial, update_h_sharded

    eps, prec = config.eps, config.precision
    quant = prec.x_dtype == "int8"
    track = bool(config.track_cost)
    _f32 = jnp.float32

    def block_update(w, a, c, x_b, h0_b, rho):
        if quant:
            from ..parallel.sharded import _dequant_local

            x_b = _dequant_local(x_b, mesh.shape[ROW_AXIS])
        h = jax.lax.fori_loop(
            0,
            inner_iters,
            lambda _, hh: update_h_sharded(w, hh, x_b, eps, prec),
            h0_b,
        )
        if track:
            cost = jax.lax.psum(
                kl_partial(x_b, w, h, eps), (ROW_AXIS, COL_AXIS)
            )
        else:
            cost = jnp.float32(jnp.nan)
        z = _recon_ratio(w, h, x_b, eps, prec)
        num = jax.lax.psum(matmul(z, h, prec, transpose_b=True), COL_AXIS)
        a = rho * a + num
        c = rho * c + jax.lax.psum(jnp.sum(h, axis=1, dtype=_f32), COL_AXIS)
        w = (w * (a / eps_clamp(c, eps)[None, :])).astype(w.dtype)
        return w, a, c, cost

    if quant:
        from ..parallel.sharded import _quant_specs

        x_spec = _quant_specs(prec)
    else:
        x_spec = P(ROW_AXIS, COL_AXIS)
    return jax.jit(
        jax.shard_map(
            block_update,
            mesh=mesh,
            in_specs=(
                P(ROW_AXIS, None), P(ROW_AXIS, None), P(), x_spec,
                P(None, COL_AXIS), P(),
            ),
            out_specs=(P(ROW_AXIS, None), P(ROW_AXIS, None), P(), P()),
            check_vma=False,
        ),
        donate_argnums=(0, 1, 2),
    )


@functools.lru_cache(maxsize=8)
def _online_jit(config: SolveConfig, inner_iters: int):
    import jax
    import jax.numpy as jnp

    from ..ops.elementwise import eps_clamp
    from ..ops.divergence import kl_divergence
    from ..ops.mu import _recon_ratio, matmul, update_h

    eps, prec = config.eps, config.precision
    quant = prec.x_dtype == "int8"
    track = bool(config.track_cost)
    _f32 = jnp.float32

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def block_update(w, a, c, x_b, h0_b, rho):
        if quant:
            from ..ops.quant import dequantize

            x_b = dequantize(x_b[0], x_b[1])
        h = jax.lax.fori_loop(
            0,
            inner_iters,
            lambda _, hh: update_h(w, hh, x_b, eps, prec),
            h0_b,
        )
        # the learning-curve cost is optional: it is an extra HIGHEST-
        # precision reconstruction pass plus a per-block host fetch
        cost = kl_divergence(x_b, w, h, eps) if track else jnp.float32(jnp.nan)
        # same clamp-site source of truth as update_h/update_w (mu.py)
        z = _recon_ratio(w, h, x_b, eps, prec)
        a = rho * a + matmul(z, h, prec, transpose_b=True)
        c = rho * c + jnp.sum(h, axis=1, dtype=_f32)
        w = (w * (a / eps_clamp(c, eps)[None, :])).astype(w.dtype)
        return w, a, c, cost

    return block_update


def solve_online(
    x,
    w0,
    config: SolveConfig = SolveConfig(),
    *,
    block_n: Optional[int] = None,
    inner_iters: int = 20,
    rho: float = 1.0,
    passes: int = 1,
    seed: int = 0,
    mesh=None,
) -> OnlineResult:
    """One-pass streaming dictionary learning (see module docstring).

    ``x`` may be an array / memmap / ``.bin`` path / column source; only
    the KL (beta=1) MU family is implemented (the reference objective).
    ``inner_iters`` H iterations fit each block's activations before its
    statistics are folded in; ``passes`` > 1 re-streams the source (with
    the accumulators carried over) for finite corpora.  X storage honors
    ``precision.x_dtype`` (f32 / bf16 / int8 wire bytes).  With
    ``track_cost=False`` the per-block learning-curve costs (an extra
    reconstruction pass + a host fetch each) are skipped and
    ``block_costs`` holds one empty list per pass.

    With ``mesh`` the learner runs on the canonical ('mr', 'mc') layout —
    W and the A statistics row-sharded for the whole run, each block's
    collectives the usual K-sized psums — an M (and stream) far beyond one
    chip.
    """
    import jax
    import jax.numpy as jnp

    from .streaming import _as_source, _host_prep, pick_block_n

    config.validate()
    if config.backend == "pallas":
        raise NotImplementedError(
            "online NMF's per-block statistics updates run as XLA ops "
            "(the fused MU kernels implement full W@H sweeps, not the "
            "A/B-folded updates) — backend='pallas' would be silently "
            "ignored; use backend='auto'"
        )
    if config.live_metrics:
        raise NotImplementedError(
            "online learning tracks per-block costs, not the global "
            "per-check divergence live_metrics streams; read "
            "OnlineResult.block_costs (track_cost=True) instead"
        )
    if config.beta != 1.0 or config.algorithm != "mu" or config.regularized:
        raise NotImplementedError(
            "online NMF implements the reference KL (beta=1) MU family"
        )
    if config.accelerate:
        raise NotImplementedError(
            "online learning's per-block statistics folding has no global "
            "cost to safeguard an extrapolated step against; accelerate=True "
            "applies to the full-solve families"
        )
    if not (0.0 < rho <= 1.0):
        raise ValueError(f"rho must be in (0, 1], got {rho}")
    if inner_iters < 1:
        raise ValueError("inner_iters must be >= 1")
    if passes < 1:
        raise ValueError("passes must be >= 1")
    source = _as_source(x)
    m, n = source.shape
    w0 = np.asarray(w0, np.float32)
    if w0.ndim != 2 or w0.shape[0] != m:
        raise ValueError(f"W0 {w0.shape} does not match X {(m, n)}")
    k = w0.shape[1]
    eps = config.eps
    sd = jnp.dtype(config.precision.state_dtype)
    xd = config.precision.x_dtype
    quant = xd == "int8"
    bn = block_n if block_n is not None else pick_block_n(m, n)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import COL_AXIS, ROW_AXIS

        r, cdev = mesh.shape[ROW_AXIS], mesh.shape[COL_AXIS]
        if m % r or n % cdev:
            raise ValueError(
                f"global dims (M={m}, N={n}) must divide the mesh "
                f"{dict(mesh.shape)}"
            )
        if block_n is not None and block_n % cdev:
            # silently rounding would cut the stream into DIFFERENT blocks
            # than a single-device run with the same arguments (per-block
            # seeded inits -> a genuinely different learned W)
            raise ValueError(
                f"block_n={block_n} must be a multiple of the mesh column "
                f"count {cdev} (block partitions define the learning "
                f"trajectory)"
            )
        bn = max(cdev, (bn // cdev) * cdev)
        from ..parallel.mesh import quant_scale_spec_for

        x_t = NamedSharding(mesh, P(ROW_AXIS, COL_AXIS))
        w_t = NamedSharding(mesh, P(ROW_AXIS, None))
        h_t = NamedSharding(mesh, P(None, COL_AXIS))
        rep_t = NamedSharding(mesh, P())
        sc_t = NamedSharding(
            mesh,
            quant_scale_spec_for(config.precision),
        )
    blocks: List[Tuple[int, int]] = [
        (j, min(j + bn, n)) for j in range(0, n, bn)
    ]

    def _put(idx):
        x_np = _host_prep(
            source.columns(*blocks[idx]), eps, xd,
            config.precision.x_quant_rows,
        )
        if quant:
            if mesh is not None:
                x_dev = (
                    jax.device_put(x_np[0], x_t),
                    jax.device_put(x_np[1], sc_t),
                )
            else:
                x_dev = (jnp.asarray(x_np[0]), jnp.asarray(x_np[1]))
        else:
            x_dev = (
                jax.device_put(x_np, x_t) if mesh is not None
                else jnp.asarray(x_np)
            )
        rng = np.random.RandomState(seed + idx)
        h0 = np.maximum(
            rng.rand(k, blocks[idx][1] - blocks[idx][0]).astype(np.float32),
            np.float32(eps),
        )
        h_dev = (
            jax.device_put(h0, h_t) if mesh is not None else jnp.asarray(h0)
        )
        return x_dev, h_dev.astype(sd)

    if mesh is not None:
        fn = _online_sharded_jit(config, int(inner_iters), mesh)
        w = jnp.maximum(
            jax.device_put(w0, w_t).astype(sd), jnp.asarray(eps, sd)
        )
        a = jax.device_put(jnp.zeros((m, k), jnp.float32), w_t)
        c = jax.device_put(jnp.zeros((k,), jnp.float32), rep_t)
    else:
        fn = _online_jit(config, int(inner_iters))
        w = jnp.maximum(jnp.asarray(w0, sd), jnp.asarray(eps, sd))
        a = jnp.zeros((m, k), jnp.float32)
        c = jnp.zeros((k,), jnp.float32)
    rho_j = jnp.asarray(rho, jnp.float32)
    track = bool(config.track_cost)
    all_costs: List[List[float]] = []
    for p in range(passes):
        pass_costs: List[float] = []
        inflight = _put(0)
        pend = None
        for idx in range(len(blocks)):
            x_dev, h0_dev = inflight
            w, a, c, cost = fn(w, a, c, x_dev, h0_dev, rho_j)
            if idx + 1 < len(blocks):
                inflight = _put(idx + 1)  # overlaps this block's compute
            if track:
                if pend is not None:
                    pass_costs.append(float(pend))  # drains idx-1
                pend = cost
        if track:
            pass_costs.append(float(pend))
        all_costs.append(pass_costs)
    return OnlineResult(
        w=np.asarray(w, np.float32),
        block_costs=all_costs,
        blocks=blocks,
        passes=passes,
    )
