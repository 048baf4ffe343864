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
``n_frozen == 0`` to ``solve``.  HALS is excluded: its in-place W sweep
reads columns mid-update, so freezing after the sweep would leak
intermediate values into the free columns.

By convention the frozen columns are the FIRST ``n_frozen`` of ``w0``
(order your template columns first).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .solver import SolveResult, _cost_fn, _prep_jit, resolve_step_fn, run_checked_loop
from ..utils.config import SolveConfig

__all__ = ["solve_semi"]

_F32 = jnp.float32


@functools.lru_cache(maxsize=8)
def _semi_jit(config: SolveConfig, platform: Optional[str]):
    step_fn = resolve_step_fn(config, platform)
    cost_fn = _cost_fn(config, platform)

    @jax.jit
    def _solve(x, w, h, mk, initial_cost):
        # the frozen source IS the initial dictionary (w is therefore not
        # donated: its pre-loop value stays live for the whole run)
        w_frz = w

        def step(w_, h_, x_):
            w2, h2 = step_fn(w_, h_, x_)
            w2 = jnp.where(mk[None, :], w_frz, w2).astype(w2.dtype)
            return w2, h2

        return run_checked_loop(
            x, w, h, config, step, cost_fn, initial_cost=initial_cost
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
    docstring); composes with meshes (frozen template row-sharded like W)
    and the f32/bf16/int8 X storage tiers.
    """
    config.validate()
    if config.algorithm == "hals":
        raise NotImplementedError(
            "HALS's in-place W sweep reads columns mid-update; frozen "
            "columns need the MU families"
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
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import shard_problem
        from ..parallel.sharded import build_sharded_semi_solver

        x, w0, h0 = shard_problem(x, w0, h0, mesh)
        mk = jax.device_put(mk, NamedSharding(mesh, P()))
        return build_sharded_semi_solver(config, mesh)(x, w0, h0, mk, c0)
    try:
        platform = list(
            (x[0] if isinstance(x, tuple) else x).devices()
        )[0].platform
    except AttributeError:
        platform = jax.default_backend()
    return _semi_jit(config, platform)(x, w0, h0, mk, c0)
