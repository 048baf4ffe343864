"""Semi-adaptive NMF: train a dictionary with some columns FROZEN.

The reference paper's application is template-based drum extraction
(nmf_ismir_2009.pdf section 2): drum templates are learned offline from
solo recordings, and factorizing a full song should keep those template
columns fixed while extra columns adapt to the non-drum content.  That is
the general "semi-supervised NMF" pattern — a continuum between
:func:`nmf_tpu.solve` (nothing frozen) and :func:`nmf_tpu.solve_h_only`
(the whole dictionary frozen).

Semantics: the H update always sees the FULL W (frozen + free columns);
the W update is computed normally and the frozen columns are then restored
to their initial (clamped) values.  For the multiplicative families this
is exact — each W column's update reads only pre-update values — so a run
with ``n_frozen == K`` is trajectory-identical to ``solve_h_only`` and
``n_frozen == 0`` to ``solve`` (same backend resolution included).  HALS
is excluded: its in-place W sweep reads columns mid-update, so freezing
after the sweep would leak intermediate values into the free columns.

By convention the frozen columns are the FIRST ``n_frozen`` of ``w0``
(order your template columns first).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .solver import (
    SolveResult,
    _cost_fn,
    _default_platform,
    _prep_jit,
    maybe_live_chunked,
    resolve_step_fn,
    run_checked_loop,
)
from ..utils.config import SolveConfig

__all__ = ["solve_semi"]

_F32 = jnp.float32


@functools.lru_cache(maxsize=8)
def _semi_jit(config: SolveConfig, platform: Optional[str]):
    step_fn = resolve_step_fn(config, platform)
    cost_fn = _cost_fn(config, platform)

    # h donated as in solve_jit; w is NOT — its pre-loop value is the
    # frozen source and must stay live for the whole run
    @functools.partial(jax.jit, donate_argnums=(2,))
    def _solve(x, w, h, mk, initial_cost, initial_momentum=None,
               initial_extrap=None):
        w_frz = w

        def step(w_, h_, x_):
            w2, h2 = step_fn(w_, h_, x_)
            w2 = jnp.where(mk[None, :], w_frz, w2).astype(w2.dtype)
            return w2, h2

        return run_checked_loop(
            x, w, h, config, step, cost_fn, initial_cost=initial_cost,
            initial_momentum=initial_momentum, initial_extrap=initial_extrap,
        )

    return _solve


def solve_semi(
    x,
    w0,
    h0,
    config: SolveConfig = SolveConfig(),
    n_frozen: int = 0,
    mesh=None,
) -> SolveResult:
    """Factorize with the first ``n_frozen`` dictionary columns fixed.

    MU families only (KL, beta, penalized — HALS raises, see module
    docstring); composes with meshes (the frozen shard is the initial
    local W shard) and the f32/bf16/int8 X storage tiers.
    """
    config.validate()
    if config.algorithm == "hals":
        raise NotImplementedError(
            "HALS's in-place W sweep reads columns mid-update; frozen "
            "columns need the MU families"
        )
    if isinstance(x, tuple):
        raise NotImplementedError(
            "solve_semi quantizes X itself (its prep clamps the frozen "
            "template columns too); pass the float X — pre-quantized "
            "(codes, scales) pairs are accepted by solve/solve_sharded/"
            "solve_h_only"
        )
    sx, sw, sh = jnp.shape(x), jnp.shape(w0), jnp.shape(h0)
    if sx != (sw[0], sh[1]) or sw[1] != sh[0]:
        raise ValueError(f"shape mismatch: X{sx} vs W{sw} @ H{sh}")
    k = sw[1]
    if not (0 <= int(n_frozen) <= k):
        raise ValueError(f"n_frozen must be in [0, {k}], got {n_frozen}")
    # frozen values are the clamped initial columns (the load-time clamp,
    # nmf.cu:211, applies to templates exactly as to any input)
    x, w0, h0 = _prep_jit(config)(x, w0, h0)
    mk = jnp.asarray(np.arange(k) < int(n_frozen))
    c0 = jnp.asarray(jnp.nan, _F32)
    quant = config.precision.x_dtype == "int8"
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import COL_AXIS, ROW_AXIS, shard_problem
        from ..parallel.sharded import _use_fused, build_sharded_semi_solver

        fused = config.algorithm == "mu" and _use_fused(
            config,
            sx[0] // mesh.shape[ROW_AXIS],
            k,
            sx[1] // mesh.shape[COL_AXIS],
            list(mesh.devices.flat)[0].platform,
            quant=quant,
        )
        x, w0, h0 = shard_problem(x, w0, h0, mesh)
        mk = jax.device_put(mk, NamedSharding(mesh, P()))

        def make_fn(c):
            fn = build_sharded_semi_solver(c, mesh, fused)
            return lambda x_, w_, h_, c0_, m0_, **kw: fn(x_, w_, h_, mk, c0_, m0_, **kw)

        fallback = maybe_live_chunked(make_fn, x, w0, h0, config, mesh)
        if fallback is not None:
            return fallback
        return build_sharded_semi_solver(config, mesh, fused)(
            x, w0, h0, mk, c0, jnp.asarray(jnp.nan, _F32)
        )
    platform = _default_platform(x)
    if (
        platform == "tpu"
        and config.beta == 1.0
        and not config.regularized
        and config.backend in ("auto", "autotune")
        and not quant
    ):
        # same measured per-shape backend policy as solve(): keeps the
        # documented n_frozen=0 == solve endpoint kernel-identical
        from ..utils import autotune

        if config.backend == "autotune":
            choice = autotune.pick_backend(config, sw[0], k, sh[1])
        else:
            choice = autotune.rule_pick(
                sw[0], k, sh[1], config.precision.matmul_dtype
            )
        config = dataclasses.replace(config, backend=choice)

    def make_fn(c):
        fn = _semi_jit(c, platform)
        return lambda x_, w_, h_, c0_, m0_, **kw: fn(x_, w_, h_, mk, c0_, m0_, **kw)

    fallback = maybe_live_chunked(make_fn, x, w0, h0, config)
    if fallback is not None:
        return fallback
    return _semi_jit(config, platform)(x, w0, h0, mk, c0)
