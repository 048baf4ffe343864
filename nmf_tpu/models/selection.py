"""Model selection: multi-restart and rank-sweep NMF in one compiled batch.

NMF's objective is non-convex: different initializations reach different
local minima, and the rank K is a model-order choice the data does not give
away for free.  The reference library has no notion of either (one run, one
init, fixed K — nmf.cu:37-45); standard practice is to re-solve from several
random initializations and keep the lowest-cost factorization, and to sweep
K to pick the model size.  Both are embarrassingly parallel across *solves*,
which on TPU makes them nearly free:

* **Restarts** — ``vmap`` over the member axis turns R independent solves
  into one compiled program whose GEMMs are R-times-larger MXU contractions
  (the same mechanism as :func:`nmf_tpu.solve_batched`), with X shared —
  vmapping X with ``in_axes=None`` means the R members read ONE copy of X
  from HBM, not R.

* **Rank sweep** — all candidate ranks run in the *same* compiled program by
  embedding each member in the widest rank ``Kmax`` and pinning its unused
  trailing columns of W (and rows of H) at exactly zero.  Multiplicative
  updates preserve exact zeros — a zero column of W gives a zero numerator
  row for H, so ``h * (num / den)`` stays zero, and symmetrically for W —
  which makes each member *exactly* the lower-rank problem: identical
  factors, identical KL cost (zero columns contribute nothing to W@H).
  Each step re-applies the mask anyway as numerical belt-and-braces.

The per-member convergence semantics are those of the batched solver: with
``thresh > 0`` each member stops changing at its own convergence point (the
vmapped while_loop masks finished members); with ``thresh == 0`` every
member runs exactly ``max_iter`` iterations.

HALS rank sweeps are exact for the same reason as MU's: with both the masked
W columns and H rows exactly zero, a masked rank's coordinate-descent
gradient is exactly zero (``wtx[k] = 0``, ``wtw[k] @ h = 0``), so zero is a
fixed point of the in-place sweep and active ranks read only zero
contributions from masked ones — the masked member IS the lower-rank HALS
problem (up to GEMM reduction-order rounding).  Frozen (template) columns
remain MU-only: a frozen column is NONZERO and would be read mid-sweep
before the end-of-step re-pin.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .solver import SolveResult, _cost_fn, resolve_step_fn, run_checked_loop
from ..utils.config import SolveConfig

__all__ = ["SelectionResult", "solve_restarts", "solve_rank_sweep"]

_F32 = jnp.float32


@dataclasses.dataclass
class SelectionResult:
    """Batched selection outcome.

    ``results`` is the raw batched :class:`SolveResult` (member axis first;
    factors are embedded at the widest rank).  ``ranks[i]`` is member i's
    effective rank; :meth:`factors` crops the embedding away.
    """

    results: SolveResult
    ranks: np.ndarray

    @property
    def n_members(self) -> int:
        return int(self.ranks.shape[0])

    @property
    def costs(self) -> np.ndarray:
        return np.asarray(self.results.cost)

    @property
    def iterations(self) -> np.ndarray:
        return np.asarray(self.results.iterations)

    @property
    def converged(self) -> np.ndarray:
        return np.asarray(self.results.converged)

    @property
    def best_index(self) -> int:
        """Member with the lowest final cost.

        Meaningful for restarts (same model, comparable costs); for a rank
        sweep the costs form a curve over ``ranks`` — wider models fit
        better by construction, so pick by elbow/IC, not argmin.
        """
        return int(np.argmin(self.costs))

    def factors(self, i: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Member i's (W, H) cropped to its effective rank."""
        k = int(self.ranks[i])
        return self.results.w[i, :, :k], self.results.h[i, :k, :]

    @property
    def best(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.factors(self.best_index)

    @property
    def best_cost(self) -> float:
        return float(self.costs[self.best_index])

    def best_solve_result(self) -> SolveResult:
        """The lowest-cost member as a single-problem :class:`SolveResult`
        (factors at the embedding width; use :attr:`best` for cropped
        factors)."""
        b = self.best_index
        return jax.tree_util.tree_map(lambda a: a[b], self.results)


def _mask_factors(w, h, mk):
    # mk: [Kmax] {0,1}; zero the unused rank slots (cast-free: mk in state dtype)
    return w * mk[None, :].astype(w.dtype), h * mk[:, None].astype(h.dtype)


@functools.lru_cache(maxsize=8)
def _selection_jit(
    config: SolveConfig,
    platform: Optional[str],
    masked: bool,
    n_frozen: int = 0,
):
    step_fn = resolve_step_fn(config, platform)
    cost_fn = _cost_fn(config, platform)

    def one(x, w, h, mk):
        # template columns (models.semi semantics): frozen source is each
        # member's initial dictionary, so W is not donated when frozen
        w_frz = w
        fz = jnp.arange(w.shape[1]) < n_frozen

        def sf(w_, h_, x_):
            w2, h2 = step_fn(w_, h_, x_)
            if masked:
                w2, h2 = _mask_factors(w2, h2, mk)
            if n_frozen:
                w2 = jnp.where(fz[None, :], w_frz, w2).astype(w2.dtype)
            return w2, h2

        return run_checked_loop(x, w, h, config, sf, cost_fn)

    # x shared across members (in_axes=None): one HBM copy, R solves
    donate = (2,) if n_frozen else (1, 2)
    return jax.jit(
        jax.vmap(one, in_axes=(None, 0, 0, 0)), donate_argnums=donate
    )


@functools.lru_cache(maxsize=16)
def _selection_prep_jit(precision, eps: float, clamp_inputs: bool, masked: bool):
    """One-launch member prep: clamp + state/X casts + rank-embedding mask
    (+ shared int8 quantization).  The selection twin of solver._prep_jit."""
    sd = jnp.dtype(precision.state_dtype)
    quant = precision.x_dtype == "int8"

    @jax.jit
    def prep(x, w0s, h0s, mks):
        x = jnp.asarray(x, _F32)
        w0s = w0s.astype(sd)
        h0s = h0s.astype(sd)
        if clamp_inputs:
            x = jnp.maximum(x, jnp.asarray(eps, _F32))
            w0s = jnp.maximum(w0s, jnp.asarray(eps, sd))
            h0s = jnp.maximum(h0s, jnp.asarray(eps, sd))
        mks_j = mks.astype(sd)
        if masked:
            w0s, h0s = jax.vmap(_mask_factors)(w0s, h0s, mks_j)
        if quant:
            from ..ops.quant import quantize_policy

            # once: members share the codes (per-column or row-block scales)
            x = quantize_policy(x, eps, precision.x_quant_rows)
        else:
            x = x.astype(jnp.dtype(precision.x_dtype))
        return x, w0s, h0s, mks_j

    return prep


def _solve_selection(
    x,
    w0s: np.ndarray,
    h0s: np.ndarray,
    ranks: np.ndarray,
    config: SolveConfig,
    mesh,
    clamp_inputs: bool,
    n_frozen: int = 0,
) -> SelectionResult:
    config.validate()
    # final costs are the selection signal — always track them
    if not config.track_cost and config.thresh == 0.0:
        config = dataclasses.replace(config, track_cost=True)
    if config.live_metrics:
        # one callback per member per check is noise, not observability.
        # Normalized HERE so live/non-live configs share one _selection_jit
        # cache entry (they compile to the identical program).
        config = dataclasses.replace(config, live_metrics=False)
    r, kmax = w0s.shape[0], w0s.shape[2]
    masked = bool(np.any(ranks < kmax))
    if n_frozen:
        if config.algorithm == "hals":
            raise NotImplementedError(
                "HALS's in-place W sweep reads columns mid-update; frozen "
                "columns need the MU families"
            )
        if not (0 < n_frozen <= int(np.min(ranks))):
            raise ValueError(
                f"n_frozen must be in [1, min(ranks)={int(np.min(ranks))}], "
                f"got {n_frozen}"
            )
    # Rank sweeps need exact-zero-preserving updates.  MU preserves them
    # multiplicatively; HALS preserves them too: with BOTH the masked W
    # columns and H rows exactly zero, a masked rank's CD gradient is
    # exactly zero (wtx[k] = 0^T X = 0, wtw[k] @ h = 0 and hht[:, k] = 0),
    # so max(0 + 0/eps, 0) = 0 is a fixed point of the in-place sweep and
    # active ranks read only zero contributions from masked ones — verified
    # bitwise in tests/test_selection.py::test_rank_sweep_hals*.  The
    # post-step re-mask below stays as numerical belt-and-braces.

    m, n = jnp.shape(x)
    if jnp.shape(w0s) != (r, m, kmax) or jnp.shape(h0s) != (r, kmax, n):
        raise ValueError(
            f"member shapes disagree: X{jnp.shape(x)} vs W{jnp.shape(w0s)} "
            f"@ H{jnp.shape(h0s)}"
        )
    # the embedding mask goes on AFTER the clamp: unused slots are exact zero
    mks = (np.arange(kmax)[None, :] < np.asarray(ranks)[:, None]).astype(
        np.float32
    )
    # ONE jitted prep program (clamp + casts + mask + quantize): the eager
    # per-op version paid ~5-10 ms per launch in tunnel RPCs on this
    # platform — same fix as solver._prep_jit
    x, w0s, h0s, mks_j = _selection_prep_jit(
        config.precision, config.eps, bool(clamp_inputs), masked
    )(x, w0s, h0s, jnp.asarray(mks))

    platform = None
    if config.backend in ("auto", "autotune") and config.beta == 1.0:
        # member solves are vmapped: default to the jnp/XLA path (vmapped
        # Pallas serializes the member axis as an outer grid dimension —
        # see parallel/batched.py for the measurements)
        config = dataclasses.replace(config, backend="jnp")

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]
        if r % mesh.shape[axis]:
            raise ValueError(
                f"members {r} must be a multiple of mesh axis "
                f"{axis}={mesh.shape[axis]}"
            )
        member = NamedSharding(mesh, P(axis))
        replicated = NamedSharding(mesh, P())
        x = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, replicated), x
        )
        w0s = jax.device_put(w0s, member)
        h0s = jax.device_put(h0s, member)
        mks_j = jax.device_put(mks_j, member)
        # the step/cost kernels must resolve for the MESH's backend, which
        # can differ from the default one (mixed CPU-mesh/TPU sessions)
        platform = list(mesh.devices.flat)[0].platform

    res = _selection_jit(config, platform, masked, int(n_frozen))(
        x, w0s, h0s, mks_j
    )
    return SelectionResult(results=res, ranks=np.asarray(ranks, np.int64))


def _member_inits(
    x_np: np.ndarray, ranks: Sequence[int], init: str, seed: int
) -> Tuple[np.ndarray, np.ndarray]:
    from .init import nndsvd_init, random_init, scaled_random_init

    m, n = x_np.shape
    r, kmax = len(ranks), int(max(ranks))
    w0s = np.zeros((r, m, kmax), np.float32)
    h0s = np.zeros((r, kmax, n), np.float32)
    svd = None
    if init not in ("random", "scaled"):
        # the SVD depends only on X: compute it ONCE at kmax and let each
        # member slice its rank (only the random zero-fill differs per seed)
        svd = np.linalg.svd(np.asarray(x_np, np.float64), full_matrices=False)
    for i, k in enumerate(ranks):
        if init == "random":
            wi, hi = random_init(m, int(k), n, seed=seed + i)
        elif init == "scaled":
            wi, hi = scaled_random_init(x_np, int(k), seed=seed + i)
        else:
            wi, hi = nndsvd_init(
                x_np, int(k), variant=init, seed=seed + i, svd=svd
            )
        w0s[i, :, : int(k)] = wi
        h0s[i, : int(k), :] = hi
    return w0s, h0s


def solve_restarts(
    x,
    rank: Optional[int] = None,
    n_restarts: Optional[int] = None,
    config: SolveConfig = SolveConfig(),
    *,
    seed: int = 0,
    init: str = "scaled",
    w0s=None,
    h0s=None,
    mesh=None,
    clamp_inputs: bool = True,
    n_frozen: int = 0,
) -> SelectionResult:
    """Solve one problem from ``n_restarts`` initializations; pick the best.

    All restarts run in ONE compiled batched program sharing a single HBM
    copy of X.  Provide either ``rank`` (inits generated with ``init`` and
    per-member seeds ``seed + i``; ``n_restarts`` defaults to 8; note the
    deterministic 'nndsvd'/'nndsvda' variants ignore the seed and would make
    identical members — use the default 'scaled', 'random', or 'nndsvdar'
    for restarts) or explicit ``w0s``/``h0s`` stacks of shape [R, M, K] /
    [R, K, N] — the stacks define the rank and member count, so combining
    them with ``rank``/``n_restarts`` is an error.

    With ``mesh`` the member axis is sharded over the mesh's first axis
    (pure data parallelism, zero per-iteration collectives; X replicated).

    Returns a :class:`SelectionResult`; ``result.best`` is the lowest-cost
    (W, H).

    ``n_frozen`` keeps each member's FIRST columns of W fixed at their
    initial values (:func:`nmf_tpu.solve_semi` semantics) — restart only
    the free columns of a template-seeded dictionary.

    Like :func:`nmf_tpu.solve`, the member state buffers are donated to the
    compiled program; with ``clamp_inputs=False`` and device-resident
    ``w0s``/``h0s`` the caller's arrays are consumed (the default clamped
    copies keep caller buffers intact).
    """
    if (w0s is None) != (h0s is None):
        raise ValueError("provide both w0s and h0s, or neither")
    if w0s is not None:
        if rank is not None or n_restarts is not None:
            # the stacks define both: a conflicting rank/n_restarts would be
            # silently ignored, and the caller would read factors of the
            # wrong rank or count believing their request was honored
            raise ValueError(
                "explicit w0s/h0s stacks define the rank and member count — "
                "do not also pass rank or n_restarts (seed/init are likewise "
                "unused with explicit stacks)"
            )
        # keep device arrays device-resident (no forced host round trip);
        # _solve_selection casts to the state dtype on device
        if not hasattr(w0s, "ndim"):
            w0s = np.asarray(w0s, np.float32)
        if not hasattr(h0s, "ndim"):
            h0s = np.asarray(h0s, np.float32)
        if w0s.ndim != 3 or h0s.ndim != 3:
            raise ValueError("w0s/h0s must be [R, M, K] / [R, K, N] stacks")
        ranks = np.full((w0s.shape[0],), w0s.shape[2], np.int64)
    else:
        if rank is None:
            raise ValueError("provide rank (for generated inits) or w0s/h0s")
        n_restarts = 8 if n_restarts is None else n_restarts
        if n_restarts < 1:
            raise ValueError("n_restarts must be >= 1")
        ranks = np.full((n_restarts,), int(rank), np.int64)
        w0s, h0s = _member_inits(np.asarray(x, np.float32), ranks, init, seed)
    return _solve_selection(
        x, w0s, h0s, ranks, config, mesh, clamp_inputs, n_frozen=n_frozen
    )


def solve_rank_sweep(
    x,
    ranks: Sequence[int],
    config: SolveConfig = SolveConfig(),
    *,
    seed: int = 0,
    init: str = "scaled",
    mesh=None,
    clamp_inputs: bool = True,
) -> SelectionResult:
    """Solve one problem at several ranks in one compiled batched program.

    Each entry of ``ranks`` becomes a member embedded at ``max(ranks)`` with
    its unused rank slots pinned to exact zero, so every member is *exactly*
    the lower-rank factorization (see module docstring).  Repeat a rank to
    combine the sweep with restarts (members get seeds ``seed + i``):
    ``solve_rank_sweep(x, [16]*3 + [32]*3)``.

    ``result.costs`` over ``result.ranks`` is the model-selection curve;
    ``result.factors(i)`` returns member i's factors cropped to its rank.
    All families: MU (KL, beta, penalized) and HALS (whose CD sweep also
    preserves the exact-zero embedding — module docstring).
    """
    ranks = np.asarray(list(ranks), np.int64)
    if ranks.size == 0:
        raise ValueError("ranks must be non-empty")
    if np.any(ranks < 1):
        raise ValueError("ranks must be >= 1")
    w0s, h0s = _member_inits(np.asarray(x, np.float32), ranks, init, seed)
    return _solve_selection(x, w0s, h0s, ranks, config, mesh, clamp_inputs)
