"""Tile-sparse X: block-sparse KL-NMF that keeps the MXU busy.

The COO prototype (models/sparse.py) is memory-optimal but VPU-bound: each
nonzero costs a K-length gather + elementwise work, so the MXU idles (its
docstring says so; ROADMAP.md defers "Sparse X at scale" to exactly this
module).  Real sparse data (spectrogram harmonics, text/recsys co-occurrence)
is CLUSTERED: nonzeros concentrate in a small fraction of (bm x bn) tiles.
Storing just the occupied tiles densely turns the sparse solve into batched
dense GEMMs — the TPU-native sparse format:

  * X is partitioned into (bm, bn) tiles; only tiles containing a nonzero
    are kept, as a dense (T, bm, bn) payload + (T,) row/col BLOCK indices.
  * Per occupied tile t at block (i, j), with W_i = W[i*bm:(i+1)*bm] and
    H_j = H[:, j*bn:(j+1)*bn]:
        Y_t = W_i @ H_j          Z_t = X_t / clamp(Y_t)
        H-numerator[j] += W_i^T @ Z_t        W-numerator[i] += Z_t @ H_j^T
    Unoccupied tiles have X = 0 => Z = 0: they contribute NOTHING to either
    numerator, so skipping them is exact (same argument as sparse.py).
  * The update denominators are the X-free colsum(W)/rowsum(H) (nmf.cu:134,
    164), and the KL cost splits as sum_tiles(x log x - x log y - x) +
    colsum(W) . rowsum(H) — never a dense M x N reconstruction.

TPU mapping: tiles are processed in fixed-size chunks under ``lax.scan``;
each chunk gathers its W row-blocks / H col-blocks ((chunk, bm, K) and
(chunk, K, bn)), runs three batched MXU contractions (reconstruct, H-side,
W-side), and scatter-adds into per-block accumulators (deterministic
``.at[].add``).  Compute and memory scale with OCCUPIED TILES, not M x N.

Semantics match models/sparse.py: zeros are EXACT zeros (== the dense solver
with ``clamp_inputs=False``), not the reference's load-time clamp.

With ``mesh`` the solve shards the canonical ('mr','mc') layout: each device
owns the tiles of its (row-block range x col-block range), per-device tile
lists are padded to a common length with inert zero tiles, and the
numerators psum over the same axes as the dense sharded solver
(parallel/sharded.py) — tile-sparse at pod scale.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import numpy as np

from ..utils.config import SolveConfig

__all__ = [
    "TileSparseX",
    "solve_sparse_tiled",
    "solve_sparse_tiled_batched",
    "tiles_from_coo",
    "tiles_from_dense",
]

_CHUNK = 64      # tiles per scan step: (chunk, bm, bn) + two gathered factor
#                  chunks stay comfortably inside VMEM-friendly working sets
_TILE = 128      # default (bm, bn): one MXU/lane-aligned block


def _register(cls):
    import jax

    return jax.tree_util.register_dataclass(cls)


@_register
@dataclasses.dataclass
class TileSparseX:
    """Occupied (bm, bn) tiles of X with their block coordinates.

    ``tiles[t]`` is the dense payload of block (rows[t], cols[t]); exact-zero
    tiles (all-zero payload) are inert padding.  ``shape`` is the LOGICAL
    (m, n); the block grid covers ceil(m/bm) x ceil(n/bn) with zero-padded
    edges (zero entries contribute nothing anywhere — see module docstring).
    """

    tiles: "jnp.ndarray"   # (T, bm, bn) f32
    rows: "jnp.ndarray"    # (T,) i32 — row-block index
    cols: "jnp.ndarray"    # (T,) i32 — col-block index
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))

    @property
    def tile_shape(self) -> Tuple[int, int]:
        return tuple(self.tiles.shape[1:])

    def occupancy(self) -> float:
        """Stored fraction of the dense M x N footprint."""
        t, bm, bn = self.tiles.shape
        m, n = self.shape
        return t * bm * bn / float(m * n)


def tiles_from_coo(
    data, rows, cols, shape: Tuple[int, int], tile: Tuple[int, int] = (_TILE, _TILE)
) -> TileSparseX:
    """Bucket COO nonzeros into dense occupied tiles (host-side, NumPy; the
    payload stays on host until a solver places it)."""
    bm, bn = int(tile[0]), int(tile[1])
    m, n = int(shape[0]), int(shape[1])
    data = np.asarray(data, np.float32).ravel()
    rows = np.asarray(rows, np.int64).ravel()
    cols = np.asarray(cols, np.int64).ravel()
    if not (data.shape == rows.shape == cols.shape):
        raise ValueError("data/rows/cols must have identical lengths")
    if data.size and (
        rows.min() < 0 or cols.min() < 0 or rows.max() >= m or cols.max() >= n
    ):
        raise ValueError(f"indices out of bounds for shape {(m, n)}")
    if data.size and data.min() < 0:
        # NMF requires nonnegative data; the dense path's load-time clamp
        # would hide this, but sparse values are used as-is
        raise ValueError(
            f"tile-sparse data must be nonnegative (min {data.min()})"
        )
    nb = -(-n // bn)
    key = (rows // bm) * nb + (cols // bn)
    uniq = np.unique(key)
    t = max(len(uniq), 1)
    tiles = np.zeros((t, bm, bn), np.float32)
    if data.size:
        slot = np.searchsorted(uniq, key)
        # duplicates sum (standard COO semantics)
        np.add.at(tiles, (slot, rows % bm, cols % bn), data)
    trows = (uniq // nb).astype(np.int32) if len(uniq) else np.zeros(1, np.int32)
    tcols = (uniq % nb).astype(np.int32) if len(uniq) else np.zeros(1, np.int32)
    # the payload stays HOST-resident: _prepare_tiled owns device placement
    # (pad/quantize/shard), so X crosses the ~0.01-0.05 GB/s host link
    # exactly once — an eager device_put here would bounce it D2H for the
    # padding pass and H2D again
    return TileSparseX(
        tiles=tiles,
        rows=trows,
        cols=tcols,
        shape=(m, n),
    )


def tiles_from_dense(x, tile: Tuple[int, int] = (_TILE, _TILE)) -> TileSparseX:
    """Build a TileSparseX from a dense array's nonzeros (test/convenience)."""
    x = np.asarray(x, np.float32)
    rows, cols = np.nonzero(x)
    return tiles_from_coo(x[rows, cols], rows, cols, x.shape, tile)


def _quantize_tiles_np(tiles, eps: float):
    """Per-TILE uint8 quantization: codes + one f32 scale per tile such that
    ``tile ~= codes * scale``.

    Per-tile scales beat the dense path's per-column scales when magnitudes
    vary across the matrix (each tile's error bound is its OWN max/510, not
    the global column peak's) — the natural granularity for tile storage.
    All-zero (padding) tiles get scale eps/255 and all-zero codes, so they
    dequantize to exact zeros and stay inert.
    """
    tiles = np.asarray(tiles, np.float32)
    tmax = tiles.max(axis=(1, 2))
    scales = (np.maximum(tmax, np.float32(eps)) / np.float32(255.0)).astype(
        np.float32
    )
    v = tiles * (np.float32(1.0) / scales)[:, None, None]
    v += np.float32(0.5)
    np.clip(v, 0, 255, out=v)
    return v.astype(np.uint8), scales


def _pad_tiles_np(tiles, rows, cols, multiple: int):
    """Pad the tile list to a count multiple with zero tiles at block (0,0)."""
    t = tiles.shape[0]
    padded = -(-max(t, 1) // multiple) * multiple
    if padded == t:
        return tiles, rows, cols
    p = padded - t
    return (
        np.concatenate([tiles, np.zeros((p, *tiles.shape[1:]), tiles.dtype)]),
        np.concatenate([rows, np.zeros(p, rows.dtype)]),
        np.concatenate([cols, np.zeros(p, cols.dtype)]),
    )


def _dq_chunk(t, s):
    """Tile-chunk payload -> f32 values.  ``s`` is the chunk's per-tile
    scales for uint8 codes (the multiply fuses into the consumer) or None
    for an already-dense payload.  Shared by the single-device, batched,
    and sharded factories so the dequant formula lives in ONE place."""
    import jax.numpy as jnp

    tf = t.astype(jnp.float32)
    return tf * s[:, None, None] if s is not None else tf


def _chunk_arrays(chunk: int, tiles, rows, cols, scales=None):
    """Reshape the flat tile lists into (n_chunks, chunk, ...) scan inputs
    (+ scales when quantized).  Shared by all solve factories."""
    n_chunks = tiles.shape[0] // chunk
    out = (
        tiles.reshape(n_chunks, chunk, *tiles.shape[1:]),
        rows.reshape(n_chunks, chunk),
        cols.reshape(n_chunks, chunk),
    )
    if scales is not None:
        out = out + (scales.reshape(n_chunks, chunk),)
    return out


@functools.lru_cache(maxsize=16)
def _tiled_fns(
    config: SolveConfig, chunk: int, pallas: bool = False, batched: bool = False
):
    """Jitted solve program for tile-sparse KL-MU (single device).

    With ``pallas`` the numerator sweeps run the scalar-prefetch Pallas
    kernels (ops/pallas/tile_sparse.py) and the solve's X payload is
    ``(tx, plan_h, plan_w)`` — the sweep plans are host-precomputed,
    sorted-by-output-block index triples.  The cost pass stays on the
    jnp scan (checks are amortized by check_every).
    """
    import jax
    import jax.numpy as jnp

    from ..ops.elementwise import eps_clamp
    from .solver import run_checked_loop

    eps = config.eps
    prec = config.precision
    quant = prec.x_dtype == "int8"
    _f32 = jnp.float32
    mmd = jnp.dtype(prec.mm_input_dtype)
    pmm = prec.lax_matmul_precision()
    phi = jax.lax.Precision.HIGHEST  # cost reconstruction never drifts

    _chunked = functools.partial(_chunk_arrays, chunk)
    _dq = _dq_chunk

    def _z(t, s, wt, ht):
        """Z = X_t / clamp(W_i H_j) for a gathered tile chunk, f32."""
        y = jnp.einsum(
            "tbk,tkn->tbn", wt, ht, precision=pmm, preferred_element_type=_f32
        )
        return _dq(t, s) / eps_clamp(y, eps)

    def _sweep(w, h, tiles, rows, cols, scales, target: str):
        """Accumulate the numerator GEMMs over occupied-tile chunks.

        target 'h': sum W_i^T Z_t into col-block j -> (K, Np)
        target 'w': sum Z_t H_j^T into row-block i -> (Mp, K)
        """
        k = w.shape[1]
        bm, bn = tiles.shape[1:]
        mb, nb = w.shape[0] // bm, h.shape[1] // bn
        wb = w.reshape(mb, bm, k).astype(mmd)
        hb = h.reshape(k, nb, bn).transpose(1, 0, 2).astype(mmd)  # (Nb, K, bn)
        chunks = _chunked(tiles, rows, cols, scales)

        def body(acc, inp):
            t, r, c = inp[0], inp[1], inp[2]
            s = inp[3] if quant else None
            wt = wb[r]                      # (chunk, bm, K)
            ht = hb[c]                      # (chunk, K, bn)
            z = _z(t, s, wt, ht).astype(mmd)
            if target == "h":
                contrib = jnp.einsum(
                    "tbk,tbn->tkn", wt, z,
                    precision=pmm, preferred_element_type=_f32,
                )
                acc = acc.at[c].add(contrib)
            else:
                contrib = jnp.einsum(
                    "tbn,tkn->tbk", z, ht,
                    precision=pmm, preferred_element_type=_f32,
                )
                acc = acc.at[r].add(contrib)
            return acc, None

        if target == "h":
            acc0 = jnp.zeros((nb, k, bn), _f32)
            acc, _ = jax.lax.scan(body, acc0, chunks)
            return acc.transpose(1, 0, 2).reshape(k, nb * bn)
        acc0 = jnp.zeros((mb, bm, k), _f32)
        acc, _ = jax.lax.scan(body, acc0, chunks)
        return acc.reshape(mb * bm, k)

    if pallas:
        from ..ops.pallas import tile_sparse as ts

        def step(w, h, xarg):
            """One full MU iteration (reference order, nmf.cu:118-176) with
            the numerators swept by the Pallas block-sparse kernels."""
            tx, plan_h, plan_w = xarg
            numer = ts.h_numerator(w, h, tx.tiles, *plan_h, eps, prec)
            sum_w = eps_clamp(jnp.sum(w, axis=0, dtype=_f32), eps)
            h = (h * (numer / sum_w[:, None])).astype(h.dtype)

            numer = ts.w_numerator(w, h, tx.tiles, *plan_w, eps, prec)
            sum_h = eps_clamp(jnp.sum(h, axis=1, dtype=_f32), eps)
            w = (w * (numer / sum_h[None, :])).astype(w.dtype)
            return w, h

    else:

        def step(w, h, xarg):
            """One full MU iteration in reference order (H half, then W half
            with the new H; nmf.cu:118-176), X read only at its occupied
            tiles."""
            tx, scales = xarg if quant else (xarg, None)
            numer = _sweep(w, h, tx.tiles, tx.rows, tx.cols, scales, "h")
            sum_w = eps_clamp(jnp.sum(w, axis=0, dtype=_f32), eps)
            h = (h * (numer / sum_w[:, None])).astype(h.dtype)

            numer = _sweep(w, h, tx.tiles, tx.rows, tx.cols, scales, "w")
            sum_h = eps_clamp(jnp.sum(h, axis=1, dtype=_f32), eps)
            w = (w * (numer / sum_h[None, :])).astype(w.dtype)
            return w, h

    def cost(xarg, w, h):
        """KL with the x -> 0 limit at zeros: the '+y' mass of the WHOLE
        matrix is colsum(W) . rowsum(H); occupied tiles add x*log(x/y) - x."""
        if pallas:
            tx, scales = xarg[0], None
        elif quant:
            tx, scales = xarg
        else:
            tx, scales = xarg, None
        k = w.shape[1]
        bm, bn = tx.tiles.shape[1:]
        mb, nb = w.shape[0] // bm, h.shape[1] // bn
        wb = w.reshape(mb, bm, k).astype(_f32)
        hb = h.reshape(k, nb, bn).transpose(1, 0, 2).astype(_f32)
        chunks = _chunked(tx.tiles, tx.rows, tx.cols, scales)

        def body(acc, inp):
            t, r, c = inp[0], inp[1], inp[2]
            s = inp[3] if quant else None
            y = eps_clamp(
                jnp.einsum(
                    "tbk,tkn->tbn", wb[r], hb[c],
                    precision=phi, preferred_element_type=_f32,
                ),
                eps,
            )
            tf = _dq(t, s)
            term = jnp.where(
                tf > 0,
                tf * (jnp.log(jnp.maximum(tf, eps)) - jnp.log(y)) - tf,
                0.0,
            )
            return acc + jnp.sum(term), None

        x_part, _ = jax.lax.scan(body, jnp.float32(0.0), chunks)
        total_y = jnp.dot(
            jnp.sum(w, axis=0, dtype=_f32), jnp.sum(h, axis=1, dtype=_f32)
        )
        return x_part + total_y

    if batched:
        # vmap over independent problems: ONE compiled program whose member
        # sweeps become batched MXU contractions.  jnp path only — vmapped
        # Pallas serializes the member axis as an outer grid dimension
        # (parallel/batched.py has the measurements).
        def one(tx, w, h):
            return run_checked_loop(tx, w, h, config, step, cost)

        return jax.jit(jax.vmap(one), donate_argnums=(1, 2))

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def solve_fn(tx, w, h, initial_cost, initial_momentum=None,
                 initial_extrap=None):
        return run_checked_loop(
            tx, w, h, config, step, cost, initial_cost=initial_cost,
            initial_momentum=initial_momentum, initial_extrap=initial_extrap,
        )

    return solve_fn


# ---------------------------------------------------------------------------
# Mesh-sharded tile-sparse solve
# ---------------------------------------------------------------------------


def _partition_tiles_np(tiles, rows, cols, mb_pad, nb_pad, mesh, chunk):
    """Split the tile list into per-device lists by (row-range, col-range),
    localize the block indices, and pad every list to one common
    chunk-aligned length (zero tiles at local (0,0) are inert).

    Returns host arrays stacked in ``mesh.devices.flat`` order, ready to be
    device_put with a P(('mr','mc')) leading-axis sharding, plus the common
    per-device tile count.
    """
    from ..parallel.mesh import COL_AXIS, ROW_AXIS

    r, c = mesh.shape[ROW_AXIS], mesh.shape[COL_AXIS]
    rows_per, cols_per = mb_pad // r, nb_pad // c
    parts = []
    for p in range(r):
        for q in range(c):
            sel = (
                (rows // rows_per == p) & (cols // cols_per == q)
            )
            parts.append(
                (
                    tiles[sel],
                    (rows[sel] - p * rows_per).astype(np.int32),
                    (cols[sel] - q * cols_per).astype(np.int32),
                )
            )
    t_max = max(max(p[0].shape[0] for p in parts), 1)
    t_max = -(-t_max // chunk) * chunk
    out_t, out_r, out_c = [], [], []
    for t, rr, cc in parts:
        pad = t_max - t.shape[0]
        out_t.append(
            np.concatenate([t, np.zeros((pad, *tiles.shape[1:]), tiles.dtype)])
        )
        out_r.append(np.concatenate([rr, np.zeros(pad, np.int32)]))
        out_c.append(np.concatenate([cc, np.zeros(pad, np.int32)]))
    return (
        np.concatenate(out_t),
        np.concatenate(out_r),
        np.concatenate(out_c),
        t_max,
    )


@functools.lru_cache(maxsize=8)
def _tiled_sharded_fns(config: SolveConfig, chunk: int, mesh):
    """Jitted shard_map solve for tile-sparse KL-MU on the canonical mesh.

    Each device sweeps ITS tiles into local accumulators; the H numerator
    psums over 'mr' and the W numerator over 'mc' — exactly the dense
    sharded solver's collectives (parallel/sharded.py), with per-device
    compute proportional to the device's occupied tiles.  The cost psums
    its x-part over both axes and adds the colsum(W).rowsum(H) term from
    already-psummed factor sums (computed replicated, counted once).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ..ops.elementwise import eps_clamp
    from ..parallel.mesh import COL_AXIS, ROW_AXIS
    from .solver import SolveResult, run_checked_loop

    eps = config.eps
    prec = config.precision
    quant = prec.x_dtype == "int8"
    _f32 = jnp.float32
    mmd = jnp.dtype(prec.mm_input_dtype)
    pmm = prec.lax_matmul_precision()
    phi = jax.lax.Precision.HIGHEST

    _dq = _dq_chunk
    _chunk_xs = functools.partial(_chunk_arrays, chunk)

    def _sweep_local(w, h, tiles, rows, cols, scales, target: str):
        k = w.shape[1]
        bm, bn = tiles.shape[1:]
        mb, nb = w.shape[0] // bm, h.shape[1] // bn
        wb = w.reshape(mb, bm, k).astype(mmd)
        hb = h.reshape(k, nb, bn).transpose(1, 0, 2).astype(mmd)
        chunks = _chunk_xs(tiles, rows, cols, scales)

        def body(acc, inp):
            t, r, c = inp[0], inp[1], inp[2]
            s = inp[3] if quant else None
            wt, ht = wb[r], hb[c]
            y = jnp.einsum(
                "tbk,tkn->tbn", wt, ht,
                precision=pmm, preferred_element_type=_f32,
            )
            z = (_dq(t, s) / eps_clamp(y, eps)).astype(mmd)
            if target == "h":
                contrib = jnp.einsum(
                    "tbk,tbn->tkn", wt, z,
                    precision=pmm, preferred_element_type=_f32,
                )
                return acc.at[c].add(contrib), None
            contrib = jnp.einsum(
                "tbn,tkn->tbk", z, ht,
                precision=pmm, preferred_element_type=_f32,
            )
            return acc.at[r].add(contrib), None

        if target == "h":
            acc0 = jnp.zeros((nb, k, bn), _f32)
            acc, _ = jax.lax.scan(body, acc0, chunks)
            return acc.transpose(1, 0, 2).reshape(k, nb * bn)
        acc0 = jnp.zeros((mb, bm, k), _f32)
        acc, _ = jax.lax.scan(body, acc0, chunks)
        return acc.reshape(mb * bm, k)

    def _unpack(tx):
        if quant:
            tiles, scales, rows, cols = tx
        else:
            (tiles, rows, cols), scales = tx, None
        return tiles, rows, cols, scales

    def step(w, h, tx):
        tiles, rows, cols, scales = _unpack(tx)
        numer = jax.lax.psum(
            _sweep_local(w, h, tiles, rows, cols, scales, "h"), ROW_AXIS
        )
        sum_w = eps_clamp(
            jax.lax.psum(jnp.sum(w, axis=0, dtype=_f32), ROW_AXIS), eps
        )
        h = (h * (numer / sum_w[:, None])).astype(h.dtype)

        numer = jax.lax.psum(
            _sweep_local(w, h, tiles, rows, cols, scales, "w"), COL_AXIS
        )
        sum_h = eps_clamp(
            jax.lax.psum(jnp.sum(h, axis=1, dtype=_f32), COL_AXIS), eps
        )
        w = (w * (numer / sum_h[None, :])).astype(w.dtype)
        return w, h

    def cost(tx, w, h):
        tiles, rows, cols, scales = _unpack(tx)
        k = w.shape[1]
        bm, bn = tiles.shape[1:]
        mb, nb = w.shape[0] // bm, h.shape[1] // bn
        wb = w.reshape(mb, bm, k).astype(_f32)
        hb = h.reshape(k, nb, bn).transpose(1, 0, 2).astype(_f32)
        chunks = _chunk_xs(tiles, rows, cols, scales)

        def body(acc, inp):
            t, r, c = inp[0], inp[1], inp[2]
            s = inp[3] if quant else None
            y = eps_clamp(
                jnp.einsum(
                    "tbk,tkn->tbn", wb[r], hb[c],
                    precision=phi, preferred_element_type=_f32,
                ),
                eps,
            )
            tf = _dq(t, s)
            term = jnp.where(
                tf > 0,
                tf * (jnp.log(jnp.maximum(tf, eps)) - jnp.log(y)) - tf,
                0.0,
            )
            return acc + jnp.sum(term), None

        x_loc, _ = jax.lax.scan(body, jnp.float32(0.0), chunks)
        # x-part psums over both axes (tiles are disjoint across devices);
        # the '+y' mass comes from globally-psummed K-sized factor sums and
        # is computed replicated — counted exactly once
        x_part = jax.lax.psum(x_loc, (ROW_AXIS, COL_AXIS))
        sum_w = jax.lax.psum(jnp.sum(w, axis=0, dtype=_f32), ROW_AXIS)
        sum_h = jax.lax.psum(jnp.sum(h, axis=1, dtype=_f32), COL_AXIS)
        return x_part + jnp.dot(sum_w, sum_h)

    from ..parallel.sharded import _emit_live_origin

    def local_solve(tx, w_loc, h_loc, initial_cost, initial_momentum,
                    initial_extrap=None):
        # cost() already psums its partials; the predicate scalar is
        # replicated by construction, so no outer all_reduce.  live_emit is
        # gated to mesh coordinate (0,0) like every sharded builder — a
        # pod prints once per check, not once per device.
        return run_checked_loop(
            tx, w_loc, h_loc, config, step, cost,
            initial_cost=initial_cost, live_emit=_emit_live_origin,
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
    tile_axis = P((ROW_AXIS, COL_AXIS))
    x_spec = (tile_axis,) * (4 if quant else 3)
    from ..parallel.sharded import _finish_sharded_builder

    return _finish_sharded_builder(
        local_solve,
        (x_spec, P(ROW_AXIS, None), P(None, COL_AXIS), P(), P()),
        out_specs, mesh, config, donate=(1, 2),
    )


def solve_sparse_tiled(
    x,
    w0,
    h0,
    config: SolveConfig = SolveConfig(),
    chunk: int = _CHUNK,
    tile: Tuple[int, int] = (_TILE, _TILE),
    mesh=None,
    initial_cost: float = float("nan"),
) -> "SolveResult":
    """Factorize a tile-sparse X (TileSparseX, or anything dense-like whose
    nonzeros define one).  Zero entries are exact zeros (module docstring);
    W/H are dense device arrays as usual; compute scales with occupied tiles.

    With ``mesh`` the solve shards the canonical ('mr','mc') layout (each
    device owns its block-range's tiles; numerators psum like the dense
    sharded solver).  ``precision.x_dtype='int8'`` stores tiles as uint8
    codes with PER-TILE f32 scales (error bound: each tile's own max/510 —
    finer than the dense path's per-column scales; jnp scan path, since
    Mosaic's uint8 conversion is ~1000x slower than the math it feeds).
    ``initial_cost`` seeds the convergence baseline for resumed segments
    (:func:`nmf_tpu.utils.checkpoint.solve_with_checkpoints` routes
    TileSparseX inputs here).
    """
    xarg, w_dev, h_dev, info = _prepare_tiled(x, w0, h0, config, chunk, tile, mesh)
    res = _run_tiled(xarg, w_dev, h_dev, config, info, initial_cost)
    return _crop_tiled(res, info)


def _prepare_tiled(x, w0, h0, config: SolveConfig, chunk, tile, mesh):
    """ONE-TIME host->device preparation: tile bucketing / chunk padding /
    per-tile quantization / device placement (sharded on a mesh), factor
    padding + clamp, and the Pallas-plan decision.  Shared by
    :func:`solve_sparse_tiled` and the checkpointed segment driver — the
    driver calls this once and then runs segments on the returned
    device-resident payload, so X never re-crosses the host link between
    segments.  Returns ``(xarg, w_dev, h_dev, info)``.
    """
    import jax
    import jax.numpy as jnp

    config.validate()
    if config.beta != 1.0 or config.regularized or config.algorithm != "mu":
        raise NotImplementedError(
            "tile-sparse solve implements the KL (beta=1) MU family"
        )
    tx = x if isinstance(x, TileSparseX) else tiles_from_dense(x, tile)
    m, n = tx.shape
    bm, bn = tx.tile_shape
    sd = jnp.dtype(config.precision.state_dtype)
    xd = jnp.dtype(config.precision.x_dtype)
    shape_w, shape_h = jnp.shape(w0), jnp.shape(h0)
    if (m, n) != (shape_w[0], shape_h[1]) or shape_w[1] != shape_h[0]:
        raise ValueError(
            f"shape mismatch: X{(m, n)} vs W{shape_w} @ H{shape_h}"
        )
    k = shape_w[1]
    mb, nb = -(-m // bm), -(-n // bn)
    _validate_hand_built(tx, mb, nb)
    if mesh is not None:
        if config.backend == "pallas":
            raise NotImplementedError(
                "the tile-sparse mesh path runs the XLA scan (the Pallas "
                "scalar-prefetch kernels are single-device); drop "
                "backend='pallas' or mesh"
            )
        from ..parallel.mesh import COL_AXIS, ROW_AXIS

        r, c = mesh.shape[ROW_AXIS], mesh.shape[COL_AXIS]
        mb, nb = -(-mb // r) * r, -(-nb // c) * c
    mp, np_ = mb * bm, nb * bn
    quant = config.precision.x_dtype == "int8"

    if (mp, np_) == (m, n):
        # block-aligned problem: device-resident factors stay on device
        w_pad = jnp.maximum(jnp.asarray(w0, jnp.float32), jnp.float32(config.eps))
        h_pad = jnp.maximum(jnp.asarray(h0, jnp.float32), jnp.float32(config.eps))
    else:
        # Padded factors: clamp the LOGICAL region, zero the padding — padded
        # H columns / W rows see zero numerators and stay exactly zero under
        # the multiplicative update, and contribute zero to every sum (incl.
        # the colsum.rowsum '+y' mass): the padded solve == the logical solve.
        w_pad = np.zeros((mp, k), np.float32)
        h_pad = np.zeros((k, np_), np.float32)
        w_pad[:m] = np.maximum(np.asarray(w0, np.float32), np.float32(config.eps))
        h_pad[:, :n] = np.maximum(np.asarray(h0, np.float32), np.float32(config.eps))

    info = dict(
        mesh=mesh, chunk=int(chunk), m=m, n=n, mp=mp, np_=np_,
        use_pallas=False,
    )
    if mesh is not None:
        tiles_np = np.asarray(tx.tiles, np.float32)
        rows_np = np.asarray(tx.rows, np.int32)
        cols_np = np.asarray(tx.cols, np.int32)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import COL_AXIS, ROW_AXIS

        tiles_np, rows_np, cols_np, _ = _partition_tiles_np(
            tiles_np, rows_np, cols_np, mb, nb, mesh, int(chunk)
        )
        both = NamedSharding(mesh, P((ROW_AXIS, COL_AXIS)))
        if quant:
            # per-tile uint8 codes + scales (order-stable: quantization is
            # per tile, so partition/pad order does not change any value)
            codes, scales = _quantize_tiles_np(tiles_np, config.eps)
            xarg = (
                jax.device_put(codes, both),
                jax.device_put(scales, both),
                jax.device_put(rows_np, both),
                jax.device_put(cols_np, both),
            )
        else:
            xarg = (
                jax.device_put(tiles_np.astype(xd), both),
                jax.device_put(rows_np, both),
                jax.device_put(cols_np, both),
            )
        w_dev = jax.device_put(
            w_pad.astype(sd), NamedSharding(mesh, P(ROW_AXIS, None))
        )
        h_dev = jax.device_put(
            h_pad.astype(sd), NamedSharding(mesh, P(None, COL_AXIS))
        )
        return xarg, w_dev, h_dev, info

    if int(tx.tiles.shape[0]) % int(chunk):
        tiles_a, rows_a, cols_a = _pad_tiles_np(
            np.asarray(tx.tiles, np.float32),
            np.asarray(tx.rows, np.int32),
            np.asarray(tx.cols, np.int32),
            int(chunk),
        )
    else:
        # already chunk-aligned: device-resident tile arrays pass
        # through without a host round trip
        tiles_a, rows_a, cols_a = tx.tiles, tx.rows, tx.cols
    scales_dev = None
    if quant:
        codes, scales = _quantize_tiles_np(
            np.asarray(tiles_a, np.float32), config.eps
        )
        tiles_dev = jnp.asarray(codes)
        scales_dev = jnp.asarray(scales)
    else:
        tiles_dev = jnp.asarray(tiles_a, xd)
    tx_dev = TileSparseX(
        tiles=tiles_dev,
        rows=jnp.asarray(rows_a, jnp.int32),
        cols=jnp.asarray(cols_a, jnp.int32),
        shape=(mp, np_),
    )
    from ..ops.pallas import tile_sparse as ts

    # int8 tiles take the jnp scan (same call as the dense path: Mosaic's
    # uint8 conversion is ~1000x slower than the math it feeds)
    use_pallas = (not quant) and (
        ts.supported(k, bm, bn, config.precision)
        if config.backend == "pallas"
        else (
            config.backend != "jnp"
            and ts.preferred(k, bm, bn, config.precision)
        )
    )
    info["use_pallas"] = use_pallas
    if use_pallas:
        # sweep plans are host-side index metadata (tiny); the padding
        # tiles are all-zero and land in block (0,0)'s run, contributing
        # nothing
        rows_h = np.asarray(rows_a, np.int32)
        cols_h = np.asarray(cols_a, np.int32)
        plan_h = tuple(
            jnp.asarray(a) for a in ts.sweep_plan(rows_h, cols_h, nb, "col")
        )
        plan_w = tuple(
            jnp.asarray(a) for a in ts.sweep_plan(rows_h, cols_h, mb, "row")
        )
        xarg = (tx_dev, plan_h, plan_w)
    elif quant:
        xarg = (tx_dev, scales_dev)
    else:
        xarg = tx_dev
    return (
        xarg,
        jnp.asarray(w_pad, jnp.dtype(config.precision.state_dtype)),
        jnp.asarray(h_pad, jnp.dtype(config.precision.state_dtype)),
        info,
    )


def _run_tiled(
    xarg, w, h, config: SolveConfig, info, initial_cost,
    initial_momentum: float = float("nan"),
    initial_extrap=None,
):
    """Run one (segment of a) prepared tile-sparse solve on device-resident
    inputs; ``w``/``h`` are the PADDED factors and are donated (chain
    ``res.w``/``res.h`` into the next segment).  ``initial_momentum`` /
    ``initial_extrap`` (PADDED, like the factors) resume the accelerator's
    state across segments exactly like the dense solver's parameters."""
    import jax
    import jax.numpy as jnp

    c0 = jnp.asarray(initial_cost, jnp.float32)
    if info["mesh"] is not None:
        def make(c):
            return _tiled_sharded_fns(c, info["chunk"], info["mesh"])
    else:
        def make(c):
            return _tiled_fns(c, info["chunk"], pallas=info["use_pallas"])
    # same fallback as the dense solvers, keyed on the MESH's platform (a
    # CPU mesh in a TPU-default session supports callbacks; the reverse mix
    # must take the chunked path or crash at execute time)
    from .solver import maybe_live_chunked

    fallback = maybe_live_chunked(
        make, xarg, w, h, config, info["mesh"], initial_cost=initial_cost,
        initial_momentum=initial_momentum,
        initial_extrap=initial_extrap,
    )
    if fallback is not None:
        return fallback
    kw = {} if initial_extrap is None else {"initial_extrap": initial_extrap}
    return make(config)(
        xarg, w, h, c0, jnp.asarray(initial_momentum, jnp.float32), **kw
    )


def _crop_tiled(res, info):
    """De-pad the factors to the logical shape (write_matrix-equivalent)."""
    if (info["mp"], info["np_"]) != (info["m"], info["n"]):
        return dataclasses.replace(
            res, w=res.w[: info["m"]], h=res.h[:, : info["n"]]
        )
    return res


def _validate_hand_built(tx: "TileSparseX", mb: int, nb: int) -> None:
    """Boundary checks for a (possibly hand-built) TileSparseX.

    A TileSparseX with element indices (or any out-of-grid block ids) would
    be silently dropped/clamped by the gather/scatter and partition
    selection — wrong results with no error anywhere.  Negative tile
    payloads likewise produce silently wrong factorizations (NaN drift at
    f32; all-zero codes at int8) — checked when the tiles are HOST-resident
    (the constructors build host arrays; device-resident tiles were
    validated at construction and a host round trip here would cost more
    than the solve on this link)."""
    m, n = tx.shape
    bm, bn = tx.tile_shape
    rows_chk = np.asarray(tx.rows, np.int64)
    cols_chk = np.asarray(tx.cols, np.int64)
    if rows_chk.size and (
        rows_chk.min() < 0 or cols_chk.min() < 0
        or rows_chk.max() >= mb or cols_chk.max() >= nb
    ):
        raise ValueError(
            f"TileSparseX block ids out of range for the {mb}x{nb} block "
            f"grid (tile {bm}x{bn}, shape {(m, n)}): rows in "
            f"[{rows_chk.min()}, {rows_chk.max()}], cols in "
            f"[{cols_chk.min()}, {cols_chk.max()}] — ids are BLOCK indices, "
            "not element indices (tiles_from_coo builds them)"
        )
    if isinstance(tx.tiles, np.ndarray) and tx.tiles.size:
        tmin = float(tx.tiles.min())
        if tmin < 0:
            raise ValueError(
                f"TileSparseX tiles contain negative values (min {tmin:g}); "
                "NMF requires non-negative data — the multiplicative "
                "updates would silently drift negative/NaN (f32) or clip "
                "to zero (int8)"
            )


def solve_sparse_tiled_batched(
    xs,
    w0s,
    h0s,
    config: SolveConfig = SolveConfig(),
    chunk: int = _CHUNK,
    tile: Tuple[int, int] = (_TILE, _TILE),
) -> "SolveResult":
    """B independent tile-sparse factorizations in ONE compiled program.

    ``xs`` is a sequence of problems (TileSparseX or dense-like) sharing one
    logical shape; ``w0s``/``h0s`` are (B, M, K) / (B, K, N).  Member tile
    lists are padded to a common chunk-aligned count with inert zero tiles,
    stacked, and the solve vmaps over the member axis — the tile sweeps
    become batched MXU contractions exactly like :func:`nmf_tpu.solve_batched`
    does for dense members.  Returns the batched
    :class:`~nmf_tpu.models.solver.SolveResult` (member axis first).
    Per-member convergence follows the batched solver's semantics (the
    vmapped while_loop masks finished members).
    """
    import jax.numpy as jnp

    from .solver import SolveResult  # noqa: F401  (return type)

    config.validate()
    if config.live_metrics:
        # same policy as the dense batched solver (parallel/batched.py):
        # vmapped per-member emitters would interleave meaningless streams
        # (and this platform's PJRT plugin rejects the callbacks anyway)
        config = dataclasses.replace(config, live_metrics=False)
    if config.beta != 1.0 or config.regularized or config.algorithm != "mu":
        raise NotImplementedError(
            "tile-sparse solve implements the KL (beta=1) MU family"
        )
    if config.backend == "pallas":
        raise NotImplementedError(
            "the batched tile-sparse solve runs the vmapped XLA scan (the "
            "Pallas scalar-prefetch kernels are single-problem); drop "
            "backend='pallas' or batch"
        )
    txs = [
        x if isinstance(x, TileSparseX) else tiles_from_dense(x, tile)
        for x in xs
    ]
    if not txs:
        raise ValueError("xs must be non-empty")
    shape = txs[0].shape
    tshape = txs[0].tile_shape
    if any(t.shape != shape or t.tile_shape != tshape for t in txs):
        raise ValueError("all members must share one logical and tile shape")
    w0s = np.asarray(w0s, np.float32)
    h0s = np.asarray(h0s, np.float32)
    b = len(txs)
    m, n = shape
    bm, bn = tshape
    if w0s.ndim != 3 or h0s.ndim != 3:
        raise ValueError(
            "solve_sparse_tiled_batched expects 3-D [batch, rows, cols] "
            f"factors, got W{w0s.shape} H{h0s.shape}"
        )
    k = w0s.shape[2]
    if w0s.shape != (b, m, k) or h0s.shape != (b, k, n):
        raise ValueError(
            f"member shapes disagree: {b} problems of X{shape} vs "
            f"W{w0s.shape} @ H{h0s.shape}"
        )
    mb, nb = -(-m // bm), -(-n // bn)
    mp, np_ = mb * bm, nb * bn
    for t in txs:  # same hand-built guards as the single/mesh entry
        _validate_hand_built(t, mb, nb)
    t_max = max(max(int(t.tiles.shape[0]) for t in txs), 1)
    t_max = -(-t_max // int(chunk)) * int(chunk)
    tiles_list, rows_list, cols_list = [], [], []
    for t in txs:
        tl, rl, cl = _pad_tiles_np(
            np.asarray(t.tiles, np.float32),
            np.asarray(t.rows, np.int32),
            np.asarray(t.cols, np.int32),
            t_max,
        )
        # _pad_tiles_np pads to a multiple of t_max, which IS t_max here
        tiles_list.append(tl[:t_max])
        rows_list.append(rl[:t_max])
        cols_list.append(cl[:t_max])
    tiles_b = np.stack(tiles_list)
    rows_b = np.stack(rows_list)
    cols_b = np.stack(cols_list)

    sd = jnp.dtype(config.precision.state_dtype)
    quant = config.precision.x_dtype == "int8"
    w_pad = np.zeros((b, mp, k), np.float32)
    h_pad = np.zeros((b, k, np_), np.float32)
    w_pad[:, :m] = np.maximum(w0s, np.float32(config.eps))
    h_pad[:, :, :n] = np.maximum(h0s, np.float32(config.eps))

    if quant:
        codes, scales = _quantize_tiles_np(
            tiles_b.reshape(b * t_max, bm, bn), config.eps
        )
        tx_dev = TileSparseX(
            tiles=jnp.asarray(codes.reshape(b, t_max, bm, bn)),
            rows=jnp.asarray(rows_b),
            cols=jnp.asarray(cols_b),
            shape=(mp, np_),
        )
        xarg = (tx_dev, jnp.asarray(scales.reshape(b, t_max)))
    else:
        xd = jnp.dtype(config.precision.x_dtype)
        tx_dev = TileSparseX(
            tiles=jnp.asarray(tiles_b, xd),
            rows=jnp.asarray(rows_b),
            cols=jnp.asarray(cols_b),
            shape=(mp, np_),
        )
        xarg = tx_dev
    fn = _tiled_fns(config, int(chunk), pallas=False, batched=True)
    res = fn(xarg, jnp.asarray(w_pad, sd), jnp.asarray(h_pad, sd))
    if (mp, np_) != (m, n):
        res = dataclasses.replace(res, w=res.w[:, :m], h=res.h[:, :, :n])
    return res
