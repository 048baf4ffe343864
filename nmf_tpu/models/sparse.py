"""Sparse-X KL-NMF prototype: memory proportional to nnz(X).

Why KL-MU admits a sparse data path (text/recsys-scale X):

  * The update numerators read X only through ``Z = X / clamp(W@H, eps)``,
    and Z vanishes wherever X is exactly zero — so both numerator GEMMs
    (``W^T Z`` and ``Z H^T``) touch only X's nonzeros.
  * The update denominators are ``colsum(W)`` / ``rowsum(H)`` — K-sized,
    X-free (nmf.cu:134, 164).
  * The KL cost splits as ``sum_nnz(x log x - x log y - x) + sum(W@H)``,
    and ``sum(W@H) = colsum(W) . rowsum(H)`` — an O(K) dot, never a dense
    M x N reconstruction.

Semantics note: sparse mode treats zero entries as EXACT zeros (their
x*log(x/y) limit is 0 and only '+y' mass remains), matching the dense solver
with ``clamp_inputs=False`` — NOT the reference's load-time clamp of zeros
to EPS (which makes every entry "observed" at EPS).  The equivalence tests
pin sparse == dense-unclamped.

TPU mapping: nonzeros are processed in fixed-size chunks under ``lax.scan``
(static shapes; VMEM-bounded (chunk, K) intermediates); per-chunk work is
two K-length gathers, an elementwise ratio, and a deterministic scatter-add
(``.at[].add``).  Chunk padding uses zero data values, which contribute
exactly nothing to every sum.  This is a correctness-first prototype behind
its own entry point — the dense hot path is untouched (VERDICT next-round
item 9: "keep behind a flag; don't destabilize the dense hot path").
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import numpy as np

from ..utils.config import SolveConfig

__all__ = ["SparseX", "solve_sparse", "sparse_from_dense"]

_CHUNK = 1 << 16  # nonzeros per scan step: (chunk, K) stays VMEM-friendly


def _register(cls):
    import jax

    return jax.tree_util.register_dataclass(cls)


@_register
@dataclasses.dataclass
class SparseX:
    """COO nonzeros of X (data may be any nonnegative values; exact zeros in
    ``data`` are inert padding)."""

    data: "jnp.ndarray"    # (nnz,) f32
    rows: "jnp.ndarray"    # (nnz,) i32
    cols: "jnp.ndarray"    # (nnz,) i32
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))


def sparse_from_dense(x) -> SparseX:
    """Build a SparseX from a dense array's nonzeros (test/convenience)."""
    import jax.numpy as jnp

    x = np.asarray(x, np.float32)
    rows, cols = np.nonzero(x)
    if rows.size and x[rows, cols].min() < 0:
        # NMF requires nonnegative data; sparse values are used as-is
        raise ValueError(
            f"sparse data must be nonnegative (min {x[rows, cols].min()})"
        )
    return SparseX(
        data=jnp.asarray(x[rows, cols]),
        rows=jnp.asarray(rows.astype(np.int32)),
        cols=jnp.asarray(cols.astype(np.int32)),
        shape=tuple(x.shape),
    )


def _pad_chunks(sx: SparseX, chunk: int) -> SparseX:
    """Pad nnz to a chunk multiple with zero-data entries at (0, 0) —
    z = 0 / clamp(y) = 0, so padding contributes nothing anywhere."""
    import jax.numpy as jnp

    nnz = sx.data.shape[0]
    padded = -(-max(nnz, 1) // chunk) * chunk
    if padded == nnz:
        return sx
    p = padded - nnz
    return SparseX(
        data=jnp.pad(sx.data, (0, p)),
        rows=jnp.pad(sx.rows, (0, p)),
        cols=jnp.pad(sx.cols, (0, p)),
        shape=sx.shape,
    )


@functools.lru_cache(maxsize=16)
def _sparse_fns(config: SolveConfig, chunk: int):
    import jax
    import jax.numpy as jnp

    from ..ops.elementwise import eps_clamp

    eps = config.eps
    _f32 = jnp.float32

    def _scan_chunks(w, h, data, rows, cols, target: str):
        """Sum z_e * gather over nonzero chunks into a (dim, K) accumulator.

        target 'h': accumulate z * W[rows] into index cols -> (N, K)
        target 'w': accumulate z * H[:, cols]^T into index rows -> (M, K)
        """
        k = w.shape[1]
        dim = h.shape[1] if target == "h" else w.shape[0]
        n_chunks = data.shape[0] // chunk
        d = data.reshape(n_chunks, chunk)
        r = rows.reshape(n_chunks, chunk)
        c = cols.reshape(n_chunks, chunk)

        def body(acc, inp):
            dd, rr, cc = inp
            wr = w[rr].astype(_f32)          # (chunk, K)
            hc = h[:, cc].T.astype(_f32)     # (chunk, K)
            y = jnp.sum(wr * hc, axis=1)     # reconstruction at the nonzeros
            z = dd / jnp.maximum(y, eps)
            if target == "h":
                acc = acc.at[cc].add(z[:, None] * wr)
            else:
                acc = acc.at[rr].add(z[:, None] * hc)
            return acc, None

        acc0 = jnp.zeros((dim, k), _f32)
        acc, _ = jax.lax.scan(body, acc0, (d, r, c))
        return acc

    def step(w, h, sx: SparseX):
        """One full MU iteration in reference order (H half, then W half
        with the new H), X read only at its nonzeros."""
        numer = _scan_chunks(w, h, sx.data, sx.rows, sx.cols, "h")  # (N, K)
        sum_w = eps_clamp(jnp.sum(w, axis=0, dtype=_f32), eps)
        h = (h * (numer.T / sum_w[:, None])).astype(h.dtype)

        numer = _scan_chunks(w, h, sx.data, sx.rows, sx.cols, "w")  # (M, K)
        sum_h = eps_clamp(jnp.sum(h, axis=1, dtype=_f32), eps)
        w = (w * (numer / sum_h[None, :])).astype(w.dtype)
        return w, h

    def cost(sx: SparseX, w, h):
        """KL divergence with the x -> 0 limit at zeros: the '+y' mass of
        the WHOLE matrix is colsum(W) . rowsum(H) (O(K)); nonzeros add
        x*log(x/y) - x with y evaluated at the nonzeros only."""
        n_chunks = sx.data.shape[0] // chunk
        d = sx.data.reshape(n_chunks, chunk)
        r = sx.rows.reshape(n_chunks, chunk)
        c = sx.cols.reshape(n_chunks, chunk)

        def body(acc, inp):
            dd, rr, cc = inp
            y = jnp.maximum(
                jnp.sum(w[rr].astype(_f32) * h[:, cc].T.astype(_f32), axis=1),
                eps,
            )
            term = jnp.where(
                dd > 0, dd * (jnp.log(jnp.maximum(dd, eps)) - jnp.log(y)) - dd, 0.0
            )
            return acc + jnp.sum(term), None

        nnz_part, _ = jax.lax.scan(body, jnp.float32(0.0), (d, r, c))
        total_y = jnp.dot(
            jnp.sum(w, axis=0, dtype=_f32), jnp.sum(h, axis=1, dtype=_f32)
        )
        return nnz_part + total_y

    from .solver import run_checked_loop

    @functools.partial(jax.jit, donate_argnums=(1, 2), static_argnames=())
    def solve_fn(sx, w, h, initial_cost, initial_momentum=None,
                 initial_extrap=None):
        return run_checked_loop(
            sx, w, h, config, step, cost, initial_cost=initial_cost,
            initial_momentum=initial_momentum, initial_extrap=initial_extrap,
        )

    return solve_fn


def solve_sparse(
    x,
    w0,
    h0,
    config: SolveConfig = SolveConfig(),
    chunk: int = _CHUNK,
) -> "SolveResult":
    """Factorize a sparse X (SparseX, or anything dense-like whose nonzeros
    define it).  Zero entries are exact zeros (see module docstring); W/H
    are dense device arrays as usual.

    .. deprecated::
        The COO path is VPU-bound (K-length gathers per nonzero) and is
        strictly dominated by :func:`nmf_tpu.solve_sparse_tiled`, which runs
        batched MXU contractions over occupied tiles at 6-8x the dense rate
        and composes with meshes, batching, int8 tiles and checkpointing.
        ``tiles_from_coo`` converts the same COO triplets.  This prototype
        stays for truly unclustered nonzeros (where a tile would hold a
        single entry) and as an independent equivalence oracle.
    """
    import warnings

    import jax.numpy as jnp

    warnings.warn(
        "solve_sparse (COO) is deprecated: use solve_sparse_tiled "
        "(tiles_from_coo accepts the same triplets); the tiled path is "
        "6-8x faster and composes with mesh/batch/int8/checkpointing",
        DeprecationWarning,
        stacklevel=2,
    )
    config.validate()
    if config.beta != 1.0 or config.regularized or config.algorithm != "mu":
        raise NotImplementedError(
            "sparse solve implements the KL (beta=1) MU family"
        )
    sx = x if isinstance(x, SparseX) else sparse_from_dense(x)
    m, n = sx.shape
    sd = jnp.dtype(config.precision.state_dtype)
    w0 = jnp.maximum(jnp.asarray(w0, sd), jnp.asarray(config.eps, sd))
    h0 = jnp.maximum(jnp.asarray(h0, sd), jnp.asarray(config.eps, sd))
    if (m, n) != (w0.shape[0], h0.shape[1]) or w0.shape[1] != h0.shape[0]:
        raise ValueError(
            f"shape mismatch: X{(m, n)} vs W{w0.shape} @ H{h0.shape}"
        )
    sx = _pad_chunks(sx, chunk)
    fn = _sparse_fns(config, int(chunk))
    return fn(sx, w0, h0, jnp.asarray(jnp.nan, jnp.float32))
