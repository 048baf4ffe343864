"""Out-of-core NMF: factorize an X that does not fit one chip's HBM.

The reference's stated motivation is whole-song factorization on a single
device (paper p.1 abstract; ~60 MB/min of audio, SURVEY.md section 6) with an
allocate-once / stream-once discipline (nmf.cu:76-116).  This module
generalizes that discipline to X beyond HBM capacity: X lives on the host (a
NumPy array, a memmap, or directly a ``.bin`` file — whose column-major
payload makes column blocks contiguous reads, nmf.cu:189) and is streamed to
the device in N-axis column blocks, double-buffered so the next block's H2D
transfer overlaps the current block's compute.

Why ONE stream of X per iteration suffices (the key restatement)
----------------------------------------------------------------
The reference iteration is update_h then update_w with the NEW H
(nmf.cu:108-109).  Both half-updates decompose over column blocks:

  * H's update for block j reads only X_j and the global colsum(W):
        H_j <- H_j * (W^T (X_j / clamp(W @ H_j))) / colsum(W)
  * W's numerator is a sum of independent block contributions that use the
    NEW H_j — available immediately after block j's H update:
        numer_W = sum_j (X_j / clamp(W @ H_j_new)) @ H_j_new^T
    and its denominator rowsum(H_new) likewise accumulates per block.

So each iteration visits every block once: update H_j, then immediately fold
block j's W-numerator contribution into an (M, K) accumulator while X_j is
still in HBM.  After the sweep, one K-sized epilogue updates W.  This is
bit-faithful to the reference ordering (H first, then W with new H); only the
f32 summation order of W's numerator differs from the single-GEMM in-memory
path (blockwise partial sums), bounded by the usual 1e-7-grade fp drift.

Performance model: per iteration the device receives X once over the
host link, so the ceiling is the H2D bandwidth — iteration_time >=
bytes(X) / H2D_bw.  Double buffering hides compute behind the transfer;
the quality metric is the achieved fraction of that H2D roofline (reported
by ``bench.py --workload oocore``).  The cost/convergence check streams X
one extra time on check iterations only (amortized by ``check_every``).

Device memory high-water mark: W + H + accumulator (M x K) + 2 column
blocks — independent of N.  Family caveats: beta != 1 and masked runs carry
a SECOND (M, K) accumulator (the blockwise W denominator), and masked runs
stream the mask alongside X, doubling the per-iteration wire bytes (the
H2D roofline scales accordingly).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import List, Optional, Tuple, Union

import numpy as np

from ..utils.config import SolveConfig

__all__ = [
    "ArrayColumnSource",
    "BinColumnSource",
    "solve_out_of_core",
    "transform_out_of_core",
    "TransformResult",
    "pick_block_n",
]

# Default device-side budget for one streamed X block.  Big blocks amortize
# per-transfer latency (which dominates on slow links); two are in flight.
_DEFAULT_BLOCK_BYTES = 256 * 1024 * 1024


class ArrayColumnSource:
    """Column-block reader over an in-host-memory array (or np.memmap)."""

    def __init__(self, a):
        if a.ndim != 2:
            raise ValueError(f"X must be 2-D, got shape {a.shape}")
        self._a = a
        self.shape = tuple(a.shape)

    def columns(self, j0: int, j1: int) -> np.ndarray:
        return np.ascontiguousarray(self._a[:, j0:j1], dtype=np.float32)


class BinColumnSource:
    """Column-block reader over a reference-format ``.bin`` file.

    The payload is column-major (nmf.cu:189), so columns [j0, j1) are one
    contiguous span at byte offset ``8 + j0*rows*4`` — X never needs to fit
    in host memory either.
    """

    def __init__(self, path: Union[str, os.PathLike]):
        from ..io import binio

        self._path = os.fspath(path)
        with open(self._path, "rb") as f:
            rows, cols = binio.read_header(f)
        expected = 8 + rows * cols * 4
        actual = os.path.getsize(self._path)
        if actual < expected:
            raise ValueError(
                f"truncated .bin payload in {self._path}: expected "
                f"{expected} bytes, got {actual}"
            )
        self.shape = (rows, cols)

    def columns(self, j0: int, j1: int) -> np.ndarray:
        rows, cols = self.shape
        # native C++ fast path: one bulk pread + cache-blocked transpose
        # (native/binio.cpp nmf_read_columns); NumPy fallback below
        from ..io import native

        if os.environ.get("NMF_TPU_NO_NATIVE") != "1" and native.has_read_columns():
            return native.read_columns_native(self._path, rows, cols, j0, j1)
        count = (j1 - j0) * rows
        with open(self._path, "rb") as f:
            f.seek(8 + j0 * rows * 4)
            payload = np.fromfile(f, dtype="<f4", count=count)
        if payload.size != count:
            raise ValueError(
                f"short read in {self._path}: wanted {count} words at column "
                f"{j0}, got {payload.size}"
            )
        return np.ascontiguousarray(
            payload.reshape((rows, j1 - j0), order="F")
        )


def _as_source(x):
    if isinstance(x, (ArrayColumnSource, BinColumnSource)):
        return x
    if isinstance(x, (str, os.PathLike)):
        return BinColumnSource(x)
    return ArrayColumnSource(np.asarray(x))


def pick_block_n(m: int, n: int, block_bytes: int = _DEFAULT_BLOCK_BYTES) -> int:
    """Columns per streamed block: ~block_bytes of f32, lane-aligned (128)
    when the budget allows a whole lane tile.  For very tall X the budget
    wins over alignment — the memory contract (two in-flight blocks) must
    hold even when 128 columns alone would blow it."""
    if n < 1 or m < 1:
        raise ValueError(f"X must be non-empty to stream, got shape ({m}, {n})")
    bn = max(1, block_bytes // (4 * m))
    if bn >= 128:
        bn = (bn // 128) * 128
    return min(n, bn)


def _cast_mask(m_blk: np.ndarray, xd) -> np.ndarray:
    """Storage-match a mask block to X's wire dtype: bf16 masks ride the
    same wire as bf16 X (lossless for the common binary 0/1 masks)."""
    if str(xd) == "bfloat16":
        import ml_dtypes

        m_blk = m_blk.astype(ml_dtypes.bfloat16)
    return m_blk


def _penalty_fns(config: SolveConfig):
    """Shared penalized-family closures: the masked / regularized W
    epilogues and the once-per-pass W-penalty cost term contain no
    collectives, so the single-device and mesh block factories use the SAME
    definitions (one source of truth for the penalty math)."""
    import jax.numpy as jnp

    from ..ops.elementwise import eps_clamp

    eps = config.eps
    l1_w, l2_w = config.l1_w, config.l2_w
    _f32 = jnp.float32

    def masked_epilogue(w, a1, a2):
        den = eps_clamp(a2, eps) + l1_w + l2_w * w.astype(_f32)
        return (w * (a1 / den)).astype(w.dtype)

    def reg_epilogue(w, a1, a2):
        den = eps_clamp(a2, eps)[None, :] + l1_w + l2_w * w.astype(_f32)
        return (w * (a1 / den)).astype(w.dtype)

    if config.regularized:
        def cost_extra(w):
            wf = w.astype(_f32)
            return l1_w * jnp.sum(jnp.abs(wf)) + 0.5 * l2_w * jnp.sum(wf * wf)
    else:
        def cost_extra(w):
            return jnp.float32(0.0)

    return masked_epilogue, reg_epilogue, cost_extra


@functools.lru_cache(maxsize=32)
def _block_fns(config: SolveConfig, platform: str, masked: bool = False):
    """Jitted per-block kernels:
    (step_acc, w_epilogue, cost_block, cost_extra, a2_shape) — cost_extra is
    the once-per-pass W-penalty term (zero for unpenalized families) and
    a2_shape tags the second accumulator's shape ('mk' or None for (K,)).

    step_acc fuses the H_j update, the block's W-side contributions, AND the
    accumulation into one jitted call — one dispatch per block matters on
    high-latency links.  The iteration carry is a generic pair (a1, a2):
    KL carries (W-numerator (M,K), rowsum(H) (K,)); the beta family carries
    BOTH W-side GEMM accumulators (numerator, denominator — each (M,K)),
    since for beta != 1 the denominator is a data-dependent GEMM that also
    decomposes over column blocks.
    """
    import jax
    import jax.numpy as jnp

    from ..ops.divergence import kl_divergence_from_recon
    from ..ops.elementwise import eps_clamp
    from ..ops.mu import matmul, update_h

    eps, prec = config.eps, config.precision
    _f32 = jnp.float32
    beta = float(config.beta)

    use_fused = (
        platform == "tpu"
        and beta == 1.0
        and config.algorithm == "mu"
        and not masked
        and not config.regularized
        and (
            config.backend == "pallas"
            or (config.backend == "auto" and config.precision.x_dtype != "int8")
        )
    )
    if use_fused:
        from ..ops.pallas import fused_mu
    l1_w, l1_h = config.l1_w, config.l1_h
    l2_w, l2_h = config.l2_w, config.l2_h

    def _dense(x_j):
        if isinstance(x_j, tuple):
            from ..ops.quant import dequantize

            return dequantize(x_j[0], x_j[1])
        return x_j

    if config.algorithm == "hals":
        # HALS: the H row sweep is column-local, so it decomposes over blocks
        # EXACTLY (same wtx/wtw as the in-memory sweep); the W sweep's global
        # X H^T / H H^T products accumulate blockwise.  W is fixed during the
        # sweep, so the per-block W^T W recompute is identical every block
        # and costs <1% of the block GEMMs (M*K^2 vs 3*M*K*bn FLOPs) — the
        # price of keeping the one-dispatch-per-block contract.
        from ..ops.hals import cd_sweep_h, cd_sweep_w

        def step_acc(w, h_j, x_j, a1, a2):
            x_j = _dense(x_j)
            wtx = matmul(w, x_j, prec, transpose_a=True)       # (K, bn)
            wtw = matmul(w, w, prec, transpose_a=True)         # (K, K)
            h_new = cd_sweep_h(h_j, wtx, wtw, eps)
            xht = matmul(x_j, h_new, prec, transpose_b=True)   # (M, K)
            hht = matmul(h_new, h_new, prec, transpose_b=True) # (K, K)
            return h_new, a1 + xht, a2 + hht

        def w_epilogue(w, a1, a2):
            return cd_sweep_w(w, a1, a2, eps)

        def cost_block(w, h_j, x_j):
            from ..parallel.sharded import beta_partial

            return beta_partial(_dense(x_j), w, h_j, 2.0, eps)

        a2_shape = "kk"
    elif masked:
        # masked/weighted KL (+ optional penalties): the mask streams with X
        # as a (x_j, mask_j) pair; BOTH W-side GEMMs accumulate blockwise
        # (models.masked.mu_step_masked restated per block).
        def step_acc(w, h_j, xm_j, a1, a2):
            x_j, m_j = xm_j
            x_j = _dense(x_j)
            z = m_j * (x_j / eps_clamp(matmul(w, h_j, prec), eps))
            numer = matmul(w, z, prec, transpose_a=True)
            denom = (
                eps_clamp(matmul(w, m_j, prec, transpose_a=True), eps)
                + l1_h + l2_h * h_j.astype(_f32)
            )
            h_new = (h_j * (numer / denom)).astype(h_j.dtype)

            z = m_j * (x_j / eps_clamp(matmul(w, h_new, prec), eps))
            w_num = matmul(z, h_new, prec, transpose_b=True)
            w_den = matmul(m_j, h_new, prec, transpose_b=True)
            return h_new, a1 + w_num, a2 + w_den

        w_epilogue, _, _ = _penalty_fns(config)

        def cost_block(w, h_j, xm_j):
            from .masked import masked_kl

            x_j, m_j = xm_j
            # per-block masked KL + the block's H penalty share; the W
            # penalty is added once per pass via cost_extra
            hf = h_j.astype(_f32)
            return masked_kl(_dense(x_j), w, h_j, m_j, eps) + (
                l1_h * jnp.sum(jnp.abs(hf)) + 0.5 * l2_h * jnp.sum(hf * hf)
            )

        a2_shape = "mk"
    elif beta == 1.0 and config.regularized:
        # penalized KL: the penalty gradients are block-local for H and join
        # the W epilogue denominator (ops.mu.mu_step_kl_reg restated).
        def step_acc(w, h_j, x_j, a1, a2):
            x_j = _dense(x_j)
            z = x_j / eps_clamp(matmul(w, h_j, prec), eps)
            numer = matmul(w, z, prec, transpose_a=True)
            sum_w = eps_clamp(jnp.sum(w, axis=0, dtype=_f32), eps)
            denom = sum_w[:, None] + l1_h + l2_h * h_j.astype(_f32)
            h_new = (h_j * (numer / denom)).astype(h_j.dtype)

            z = x_j / eps_clamp(matmul(w, h_new, prec), eps)
            wnum = matmul(z, h_new, prec, transpose_b=True)
            sh = jnp.sum(h_new, axis=1, dtype=_f32)
            return h_new, a1 + wnum, a2 + sh

        _, w_epilogue, _ = _penalty_fns(config)

        def cost_block(w, h_j, x_j):
            y = matmul(
                w.astype(_f32), h_j.astype(_f32),
                dataclasses.replace(prec, matmul_dtype="float32"),
            )
            hf = h_j.astype(_f32)
            return kl_divergence_from_recon(_dense(x_j), y, eps) + (
                l1_h * jnp.sum(jnp.abs(hf)) + 0.5 * l2_h * jnp.sum(hf * hf)
            )

        a2_shape = None
    elif beta == 1.0:

        def step_acc(w, h_j, x_j, a1, a2):
            """H_j full update + block-j W-numerator/rowsum folded into a1/a2.

            ``x_j`` arrives already load-clamped (host side); with quantized
            storage it is a (uint8 codes, scales) pair — the fused kernels
            dequantize in-register, the jnp path inside its XLA fusion.
            colsum(W) is computed from the full (device-resident) W inside
            update_h — global, hence identical to the in-memory solver.
            """
            if use_fused and fused_mu.supported(w.shape[1]):
                h_new = fused_mu.update_h_fused(w, h_j, x_j, eps, prec)
                wnum = fused_mu.update_w_fused(
                    w, h_new, x_j, eps, prec, numerator_only=True
                )
            else:
                x_j = _dense(x_j)
                h_new = update_h(w, h_j, x_j, eps, prec)
                z = x_j / eps_clamp(matmul(w, h_new, prec), eps)
                wnum = matmul(z, h_new, prec, transpose_b=True)
            sh = jnp.sum(h_new, axis=1, dtype=_f32)
            return h_new, a1 + wnum, a2 + sh

        def w_epilogue(w, a1, a2):
            return (w * (a1 / eps_clamp(a2, eps)[None, :])).astype(w.dtype)

        def cost_block(w, h_j, x_j):
            y = matmul(
                w.astype(_f32), h_j.astype(_f32),
                dataclasses.replace(prec, matmul_dtype="float32"),
            )
            return kl_divergence_from_recon(_dense(x_j), y, eps)

        a2_shape = None  # (K,)
    else:
        from ..ops.mu import _beta_ratios
        from ..parallel.sharded import beta_partial

        def step_acc(w, h_j, x_j, a1, a2):
            """beta-MU: H_j block update, then both W-side GEMM contributions
            (numerator AND denominator) folded into the accumulators."""
            x_j = _dense(x_j)
            num, den = _beta_ratios(w, h_j, x_j, beta, eps, prec)
            h_num = matmul(w, num, prec, transpose_a=True)
            h_den = eps_clamp(matmul(w, den, prec, transpose_a=True), eps)
            h_new = (h_j * (h_num / h_den)).astype(h_j.dtype)

            num, den = _beta_ratios(w, h_new, x_j, beta, eps, prec)
            w_num = matmul(num, h_new, prec, transpose_b=True)
            w_den = matmul(den, h_new, prec, transpose_b=True)
            return h_new, a1 + w_num, a2 + w_den

        def w_epilogue(w, a1, a2):
            return (w * (a1 / eps_clamp(a2, eps))).astype(w.dtype)

        def cost_block(w, h_j, x_j):
            return beta_partial(_dense(x_j), w, h_j, beta, eps)

        a2_shape = "mk"  # (M, K)

    _, _, cost_extra = _penalty_fns(config)

    return (
        jax.jit(step_acc, donate_argnums=(1, 3, 4)),
        jax.jit(w_epilogue, donate_argnums=(0,)),
        jax.jit(cost_block),
        jax.jit(cost_extra),
        a2_shape,
    )


@functools.lru_cache(maxsize=16)
def _sharded_block_fns(
    config: SolveConfig, mesh, fused: bool = False, masked: bool = False
):
    # (quantized KL handled below: codes shard like X, scales over 'mc')
    """Mesh variant of :func:`_block_fns`: per-block shard_map over the
    canonical ('mr','mc') layout — X beyond the POD's aggregate HBM.

    Per block: the H_j update psums its K-sized terms over 'mr' and the
    block's W-side contributions psum over 'mc' into the row-sharded (M/r, K)
    accumulator(s).  Every host streams (its shards of) the blocks; W, the H
    blocks, and the accumulators stay sharded the whole run.  Family
    structure mirrors :func:`_block_fns`: KL carries (numerator, rowsum);
    beta and masked carry (numerator, denominator) — the masked denominators
    and the beta Y^(b-1) denominators both decompose over column blocks.
    Returns (step_acc, w_epilogue, cost_block, cost_extra, a2_shape).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ..ops.elementwise import eps_clamp
    from ..ops.mu import matmul
    from ..parallel.mesh import COL_AXIS, ROW_AXIS
    from ..parallel.sharded import kl_partial, update_h_sharded

    eps, prec = config.eps, config.precision
    _f32 = jnp.float32
    beta = float(config.beta)
    l1_w, l1_h = config.l1_w, config.l1_h
    l2_w, l2_h = config.l2_w, config.l2_h

    # int8 X storage composes with EVERY family here: each shard dequantizes
    # its (codes, scales) block in-register before the family math; codes
    # shard like X, scales per the policy (per-column over 'mc'; a
    # per-row-block table replicates block rows over 'mr' and each shard
    # gathers its rows' blocks — parallel.sharded._dequant_local)
    quantized = prec.x_dtype == "int8"
    from ..parallel.sharded import _dequant_local, _quant_specs

    _n_row = mesh.shape[ROW_AXIS]

    def _local_x(x_loc):
        if quantized:
            return _dequant_local(x_loc, _n_row)
        return x_loc

    x_spec = _quant_specs(prec) if quantized else P(ROW_AXIS, COL_AXIS)
    if config.algorithm == "hals":
        # HALS on the mesh: per block the Gram/cross products psum like the
        # sharded in-memory step (hals_step_sharded); the coordinate sweeps
        # are local to each shard.  a2 is the replicated (K,K) H H^T.
        from ..ops.hals import cd_sweep_h, cd_sweep_w

        def block_step(w_loc, h_loc, x_loc, a1_loc, a2_loc):
            x_loc = _local_x(x_loc)
            wtx = jax.lax.psum(
                matmul(w_loc, x_loc, prec, transpose_a=True), ROW_AXIS
            )
            wtw = jax.lax.psum(
                matmul(w_loc, w_loc, prec, transpose_a=True), ROW_AXIS
            )
            h_new = cd_sweep_h(h_loc, wtx, wtw, eps)
            xht = jax.lax.psum(
                matmul(x_loc, h_new, prec, transpose_b=True), COL_AXIS
            )
            hht = jax.lax.psum(
                matmul(h_new, h_new, prec, transpose_b=True), COL_AXIS
            )
            return h_new, a1_loc + xht, a2_loc + hht

        def w_epilogue(w, a1, a2):
            # row-sharded W/a1 with replicated a2: the sweep partitions over
            # rows, so GSPMD runs it collective-free
            return cd_sweep_w(w, a1, a2, eps)

        def cost_partial(w_loc, h_loc, x_loc):
            from ..parallel.sharded import beta_partial

            return jax.lax.psum(
                beta_partial(_local_x(x_loc), w_loc, h_loc, 2.0, eps),
                (ROW_AXIS, COL_AXIS),
            )

        a2_shape = "kk"
    elif masked:
        # masked/weighted KL (+ optional penalties): the mask block shards
        # like X; both W-side mask-GEMMs psum over 'mc' and accumulate
        def block_step(w_loc, h_loc, xm_loc, a1_loc, a2_loc):
            x_loc, m_loc = xm_loc
            x_loc = _local_x(x_loc)
            z = m_loc * (x_loc / eps_clamp(matmul(w_loc, h_loc, prec), eps))
            numer = jax.lax.psum(
                matmul(w_loc, z, prec, transpose_a=True), ROW_AXIS
            )
            denom = eps_clamp(
                jax.lax.psum(
                    matmul(w_loc, m_loc, prec, transpose_a=True), ROW_AXIS
                ),
                eps,
            ) + l1_h + l2_h * h_loc.astype(_f32)
            h_new = (h_loc * (numer / denom)).astype(h_loc.dtype)

            z = m_loc * (x_loc / eps_clamp(matmul(w_loc, h_new, prec), eps))
            w_num = jax.lax.psum(
                matmul(z, h_new, prec, transpose_b=True), COL_AXIS
            )
            w_den = jax.lax.psum(
                matmul(m_loc, h_new, prec, transpose_b=True), COL_AXIS
            )
            return h_new, a1_loc + w_num, a2_loc + w_den

        w_epilogue, _, _ = _penalty_fns(config)

        def cost_partial(w_loc, h_loc, xm_loc):
            from ..parallel.sharded import masked_kl_partial

            x_loc, m_loc = xm_loc
            part = masked_kl_partial(_local_x(x_loc), w_loc, h_loc, m_loc, eps)
            # the H-penalty partial, replication-normalized over 'mr'
            hf = h_loc.astype(_f32)
            part = part + (
                l1_h * jnp.sum(jnp.abs(hf)) + 0.5 * l2_h * jnp.sum(hf * hf)
            ) / mesh.shape[ROW_AXIS]
            return jax.lax.psum(part, (ROW_AXIS, COL_AXIS))

        x_spec = (x_spec, P(ROW_AXIS, COL_AXIS))
        a2_shape = "mk"
    elif beta == 1.0 and config.regularized:

        def block_step(w_loc, h_loc, x_loc, a1_loc, a2_loc):
            x_loc = _local_x(x_loc)
            z = x_loc / eps_clamp(matmul(w_loc, h_loc, prec), eps)
            numer = jax.lax.psum(
                matmul(w_loc, z, prec, transpose_a=True), ROW_AXIS
            )
            sum_w = eps_clamp(
                jax.lax.psum(jnp.sum(w_loc, axis=0, dtype=_f32), ROW_AXIS), eps
            )
            denom = sum_w[:, None] + l1_h + l2_h * h_loc.astype(_f32)
            h_new = (h_loc * (numer / denom)).astype(h_loc.dtype)

            z = x_loc / eps_clamp(matmul(w_loc, h_new, prec), eps)
            wnum = jax.lax.psum(
                matmul(z, h_new, prec, transpose_b=True), COL_AXIS
            )
            sh = jax.lax.psum(jnp.sum(h_new, axis=1, dtype=_f32), COL_AXIS)
            return h_new, a1_loc + wnum, a2_loc + sh

        _, w_epilogue, _ = _penalty_fns(config)

        def cost_partial(w_loc, h_loc, x_loc):
            part = kl_partial(_local_x(x_loc), w_loc, h_loc, eps)
            hf = h_loc.astype(_f32)
            part = part + (
                l1_h * jnp.sum(jnp.abs(hf)) + 0.5 * l2_h * jnp.sum(hf * hf)
            ) / mesh.shape[ROW_AXIS]
            return jax.lax.psum(part, (ROW_AXIS, COL_AXIS))

        a2_shape = None
    elif beta == 1.0:

        def block_step(w_loc, h_loc, x_loc, a1_loc, a2_loc):
            x_loc = _local_x(x_loc)
            h_new = update_h_sharded(w_loc, h_loc, x_loc, eps, prec, fused=fused)
            if fused:
                from ..ops.pallas import fused_mu

                wnum_loc = fused_mu.update_w_fused(
                    w_loc, h_new, x_loc, eps, prec, numerator_only=True
                )
            else:
                z = x_loc / eps_clamp(matmul(w_loc, h_new, prec), eps)
                wnum_loc = matmul(z, h_new, prec, transpose_b=True)
            wnum = jax.lax.psum(wnum_loc, COL_AXIS)
            sh = jax.lax.psum(jnp.sum(h_new, axis=1, dtype=_f32), COL_AXIS)
            return h_new, a1_loc + wnum, a2_loc + sh

        def w_epilogue(w, a1, a2):
            # elementwise on identically-sharded operands: GSPMD partitions it
            return (w * (a1 / eps_clamp(a2, eps)[None, :])).astype(w.dtype)

        def cost_partial(w_loc, h_loc, x_loc):
            return jax.lax.psum(
                kl_partial(_local_x(x_loc), w_loc, h_loc, eps),
                (ROW_AXIS, COL_AXIS),
            )

        a2_shape = None
    else:
        from ..ops.mu import _beta_ratios
        from ..parallel.sharded import beta_partial

        def block_step(w_loc, h_loc, x_loc, a1_loc, a2_loc):
            x_loc = _local_x(x_loc)
            num, den = _beta_ratios(w_loc, h_loc, x_loc, beta, eps, prec)
            h_num = jax.lax.psum(
                matmul(w_loc, num, prec, transpose_a=True), ROW_AXIS
            )
            h_den = eps_clamp(
                jax.lax.psum(
                    matmul(w_loc, den, prec, transpose_a=True), ROW_AXIS
                ),
                eps,
            )
            h_new = (h_loc * (h_num / h_den)).astype(h_loc.dtype)

            num, den = _beta_ratios(w_loc, h_new, x_loc, beta, eps, prec)
            w_num = jax.lax.psum(
                matmul(num, h_new, prec, transpose_b=True), COL_AXIS
            )
            w_den = jax.lax.psum(
                matmul(den, h_new, prec, transpose_b=True), COL_AXIS
            )
            return h_new, a1_loc + w_num, a2_loc + w_den

        def w_epilogue(w, a1, a2):
            return (w * (a1 / eps_clamp(a2, eps))).astype(w.dtype)

        def cost_partial(w_loc, h_loc, x_loc):
            return jax.lax.psum(
                beta_partial(_local_x(x_loc), w_loc, h_loc, beta, eps),
                (ROW_AXIS, COL_AXIS),
            )

        a2_shape = "mk"

    a2_spec = P(ROW_AXIS, None) if a2_shape == "mk" else P()
    step_acc = jax.jit(
        jax.shard_map(
            block_step,
            mesh=mesh,
            in_specs=(
                P(ROW_AXIS, None),
                P(None, COL_AXIS),
                x_spec,
                P(ROW_AXIS, None),
                a2_spec,
            ),
            out_specs=(P(None, COL_AXIS), P(ROW_AXIS, None), a2_spec),
            check_vma=False,
        ),
        donate_argnums=(1, 3, 4),
    )

    cost_block = jax.jit(
        jax.shard_map(
            cost_partial,
            mesh=mesh,
            in_specs=(P(ROW_AXIS, None), P(None, COL_AXIS), x_spec),
            out_specs=P(),
            check_vma=False,
        )
    )

    _, _, cost_extra = _penalty_fns(config)

    return (
        step_acc,
        jax.jit(w_epilogue, donate_argnums=(0,)),
        cost_block,
        jax.jit(cost_extra),
        a2_shape,
    )


@functools.lru_cache(maxsize=1)
def _accel_jits():
    """Jitted factor-sized helpers for the streamed loops:
    ``extrap(new, old, m, eps)`` is the Nesterov extrapolation the in-memory
    loop applies (solver._run_accel_loop), ``copy`` materializes a buffer
    that survives later donation (snapshot restores, extrapolation-state
    seeds, the frozen-template W source).  Neither donates: ``old`` may be
    a snapshot buffer the reject path still needs.  Both follow their
    inputs' shardings, so the mesh path reuses them unchanged."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def extrap(new, old, m, eps):
        e = new.astype(jnp.float32) + m * (
            new.astype(jnp.float32) - old.astype(jnp.float32)
        )
        return jnp.maximum(e, eps).astype(new.dtype)

    @jax.jit
    def copy(a):
        return a + jnp.zeros((), a.dtype)

    return extrap, copy


@functools.lru_cache(maxsize=1)
def _freeze_jit():
    """One persistent jitted frozen-column restore (per-call jit wrappers
    would re-trace/re-compile on every solve; compiles are 10-60 s remote
    round trips on this platform)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def freeze(w_new, mk, wf):
        return jnp.where(mk[None, :], wf, w_new).astype(w_new.dtype)

    return freeze


def _host_prep(blk: np.ndarray, eps: float, xd, qrows: int = 0, mask=None):
    """Load-time clamp (nmf.cu:211) + storage-dtype cast, on the host so the
    wire carries the final bytes (bf16 halves them; int8 quarters them —
    uint8 codes + f32 scales, dequantized in-register on device).  A
    streamed chunk is a column slice spanning ALL M rows, so its per-column
    scales ARE the global per-column scales, and with ``qrows`` its
    per-(row-block, column) table is exactly the in-memory layout's table
    for those columns (``Precision.x_quant_rows``)."""
    blk = np.maximum(blk, np.float32(eps))
    if mask is not None:
        # zero unobserved entries for EVERY storage dtype (the in-memory
        # masked prep's invariant, models/masked.py): masked values may be
        # garbage INCLUDING NaN/Inf; the update multiplies them by 0
        # regardless, so exact-0 storage is bit-neutral for finite inputs,
        # and for int8 it keeps garbage out of the quantization scales
        blk = np.where(mask > 0, blk, np.float32(0))
    if str(xd) == "int8":
        from ..ops.quant import quantize_policy_np

        return quantize_policy_np(blk, eps, qrows)
    if str(xd) == "bfloat16":
        import ml_dtypes

        blk = blk.astype(ml_dtypes.bfloat16)
    return blk


def solve_out_of_core(
    x,
    w0,
    h0,
    config: SolveConfig = SolveConfig(),
    block_n: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 100,
    resume: bool = True,
    mesh=None,
    mask=None,
    n_frozen: int = 0,
) -> "SolveResult":
    """Factorize ``x ~= w @ h`` with X streamed from the host per iteration.

    ``x`` may be a NumPy array / memmap, a path to a reference-format
    ``.bin`` file, or a column source object.  W, H, and the (M, K)
    accumulator live on device; X blocks are double-buffered.  Semantics
    match :func:`nmf_tpu.solve` (same update ordering, clamp sites,
    convergence rule); the cost check streams X once more on check
    iterations only.

    With ``checkpoint_dir`` the run writes an interoperable ``.bin``
    checkpoint every ``checkpoint_every`` iterations (and at the end) and,
    with ``resume``, continues from the newest one — the natural companion
    of multi-hour link-bound streaming runs.  X is NOT checkpointed (it is
    the immutable input); only (W, H, iteration, cost history) is state.

    With ``mesh`` the run streams onto the canonical ('mr','mc') mesh: W, the
    H blocks, and the (M/r, K) accumulator stay sharded for the whole run
    and each block's collectives are the usual K-sized psums — X beyond the
    POD's aggregate HBM, not just one chip's.

    Implements every solver family — the reference KL, the general
    beta-divergence family (its data-dependent W denominator also
    accumulates blockwise, so the same one-pass sweep applies with two
    accumulators), penalized KL, masked KL (``mask=``), and HALS (whose
    column-local H row sweep decomposes over blocks exactly, with the W
    sweep's global X H^T / H H^T products accumulated blockwise) — each
    both single-device and on meshes, and each composable with int8 X
    storage (each device dequantizes its (codes, scales) block shards
    in-register).  ``n_frozen`` keeps the first template columns of W
    fixed (the streamed counterpart of :func:`nmf_tpu.solve_semi`; MU
    families).

    ``config.accelerate`` runs the safeguarded Nesterov-accelerated loop
    (the host-driven restatement of the in-memory one,
    solver._run_accel_loop): same extrapolation, same per-check acceptance
    on the streamed cost, same accept/reject momentum schedule.  Because
    iterations — not bytes — are what acceleration removes, the ~4x fewer
    iterations translate directly to ~4x less X traffic on this link-bound
    path; an accepted check block streams X (check_every + 1) times,
    exactly the plain loop's volume with cost tracking on.  Extra device
    memory: two more factor-sized (W, H) copies (snapshot + extrapolation
    state); X never copies.  Checkpoints carry the FULL accelerator state
    (adapted momentum + extrapolation pair), so a killed accelerated run
    resumes exactly where it left off — identical to the uninterrupted run.
    """
    import jax
    import jax.numpy as jnp

    from .solver import SolveResult

    config.validate()
    if config.precision.x_quant_rows and config.backend == "pallas":
        raise NotImplementedError(
            "per-row-block int8 scales (x_quant_rows) take the jnp path — "
            "the fused kernels' scales operand is per-column; drop "
            "backend='pallas' or x_quant_rows"
        )
    if mask is not None and config.beta != 1.0:
        raise NotImplementedError(
            "masked streaming implements the (optionally penalized) KL family"
        )
    if checkpoint_every <= 0:
        raise ValueError("checkpoint_every must be >= 1")
    if n_frozen and config.algorithm == "hals":
        raise NotImplementedError(
            "HALS's in-place W sweep reads columns mid-update; frozen "
            "columns need the MU families (see models.semi)"
        )

    source = _as_source(x)
    m, n = source.shape
    mask_source = None
    if mask is not None:
        mask_source = _as_source(mask)
        if mask_source.shape != (m, n):
            raise ValueError(
                f"mask shape {mask_source.shape} != X shape {(m, n)}"
            )
    sd = jnp.dtype(config.precision.state_dtype)
    xd = jnp.dtype(config.precision.x_dtype)
    w0 = np.asarray(w0, np.float32)
    h0 = np.asarray(h0, np.float32)
    if (m, n) != (w0.shape[0], h0.shape[1]) or w0.shape[1] != h0.shape[0]:
        raise ValueError(
            f"shape mismatch: X{(m, n)} vs W{w0.shape} @ H{h0.shape}"
        )
    k = w0.shape[1]
    if block_n is not None and int(block_n) < 1:
        raise ValueError(f"block_n must be >= 1, got {block_n}")
    bn = block_n if block_n is not None else pick_block_n(m, n)
    if mesh is not None:
        from ..parallel.mesh import COL_AXIS, ROW_AXIS

        r, c = mesh.shape[ROW_AXIS], mesh.shape[COL_AXIS]
        if m % r or n % c:
            raise ValueError(
                f"global dims (M={m}, N={n}) must divide the mesh "
                f"{dict(mesh.shape)}"
            )
        # block width must also shard evenly over 'mc'
        bn = max(c, (bn // c) * c)
    blocks: List[Tuple[int, int]] = [
        (j, min(j + bn, n)) for j in range(0, n, bn)
    ]

    eps = config.eps
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.sharded import _use_fused

        from ..ops.pallas import fused_mu as _fused_mu

        fused = (
            config.beta == 1.0
            and not config.regularized
            and mask is None
            and _fused_mu.supported(k)
            and _use_fused(
                config, m // r, k, max(1, bn // c),
                list(mesh.devices.flat)[0].platform,
                # int8 X streams dequantize shard-locally (XLA-fused);
                # _use_fused rejects an explicit pallas request loudly
                quant=config.precision.x_dtype == "int8",
            )
        )
        step_acc, w_epilogue, cost_block, cost_extra, a2_shape = (
            _sharded_block_fns(config, mesh, fused=fused, masked=mask is not None)
        )
        x_target = NamedSharding(mesh, P(ROW_AXIS, COL_AXIS))
        w_target = NamedSharding(mesh, P(ROW_AXIS, None))
        h_target = NamedSharding(mesh, P(None, COL_AXIS))
        acc_target = w_target
        rep_target = NamedSharding(mesh, P())
        from ..parallel.mesh import quant_scale_spec_for

        scales_target = NamedSharding(
            mesh,
            quant_scale_spec_for(config.precision),
        )
    else:
        platform = jax.default_backend()
        step_acc, w_epilogue, cost_block, cost_extra, a2_shape = _block_fns(
            config, platform, masked=mask is not None
        )
        x_target = w_target = h_target = acc_target = rep_target = (
            scales_target
        ) = jax.devices()[0]
    device = x_target  # placement target for streamed blocks

    it = 0
    hist_list: List[float] = []
    labels: List[int] = []
    converged = False
    h_blocks_resumed = None
    resumed_mom = float("nan")      # accel state restored from a checkpoint
    resumed_w_ex = None             # (None / NaN = fresh start)
    resumed_h_ex = None
    if checkpoint_dir and resume:
        from ..utils import checkpoint as ckpt

        latest = ckpt.latest_checkpoint(checkpoint_dir)
        if latest is not None:
            if mesh is not None:
                # sharded restore: each host reads only its shards, and the
                # H column blocks come back as the list the loop carries
                w_like = jax.ShapeDtypeStruct((m, k), sd, sharding=w_target)
                h_like = [
                    jax.ShapeDtypeStruct((k, j1 - j0), sd, sharding=h_target)
                    for j0, j1 in blocks
                ]
                state = ckpt.load_checkpoint_sharded(
                    latest, w_like, h_like, config
                )
                w0, h_blocks_resumed = state.w, state.h
            else:
                state = ckpt.load_checkpoint(latest, config)
                if np.shape(state.w) != w0.shape or np.shape(state.h) != h0.shape:
                    raise ValueError(
                        f"checkpoint shapes {np.shape(state.w)}/"
                        f"{np.shape(state.h)} do not match inputs "
                        f"{w0.shape}/{h0.shape}"
                    )
                w0, h0 = state.w, state.h
            it = state.iteration
            hist_list = list(state.cost_history)
            labels = list(state.check_iterations or [])
            converged = state.converged
            resumed_mom = float(state.momentum)
            if state.w_ex is not None:
                resumed_w_ex = state.w_ex
                resumed_h_ex = state.h_ex

    a2_dims = {"mk": (m, k), "kk": (k, k)}.get(a2_shape, (k,))
    if mesh is not None:
        # accumulators are generated ON DEVICE with the right shardings
        # (a host zeros upload per iteration would be an M x K H2D)
        a2_target = acc_target if a2_shape == "mk" else rep_target
        _zeros = jax.jit(
            lambda: (
                jnp.zeros((m, k), jnp.float32),
                jnp.zeros(a2_dims, jnp.float32),
            ),
            out_shardings=(acc_target, a2_target),
        )
    else:
        def _zeros():
            return (
                jnp.zeros((m, k), jnp.float32),
                jnp.zeros(a2_dims, jnp.float32),
            )

    # factors resident on device for the whole run (clamped once, nmf.cu:211)
    w = jnp.maximum(
        jax.device_put(w0, w_target).astype(sd), jnp.asarray(eps, sd)
    )
    if n_frozen:
        # template columns (models.semi) also stream: restore them after
        # every W epilogue.  Resume-safe: checkpointed W's frozen columns
        # never changed, so the restored W IS the frozen source.
        if not (0 <= int(n_frozen) <= k):
            raise ValueError(f"n_frozen must be in [0, {k}], got {n_frozen}")
        _mk = jnp.asarray(np.arange(k) < int(n_frozen))
        if mesh is not None:
            _mk = jax.device_put(_mk, rep_target)
        # a COPY: the loop's w buffer is donated into the epilogue each
        # iteration, so the frozen source needs its own storage
        _w_frz = _accel_jits()[1](w)
        _freeze = _freeze_jit()
    if h_blocks_resumed is not None:
        h_blocks = [
            jnp.maximum(hb.astype(sd), jnp.asarray(eps, sd))
            for hb in h_blocks_resumed
        ]
    else:
        h_blocks = [
            jnp.maximum(
                jax.device_put(
                    np.ascontiguousarray(h0[:, j0:j1]), h_target
                ).astype(sd),
                jnp.asarray(eps, sd),
            )
            for j0, j1 in blocks
        ]

    quantized = str(xd) == "int8"
    # int8 storage: quantize blocks ONCE (first sweep) and keep the uint8
    # codes host-side — 1/4 the f32 footprint — and the tiny per-block scale
    # vectors device-resident, so every later sweep pays exactly one uint8
    # transfer per block.  The cache is CAPPED: beyond the budget (or when X
    # genuinely exceeds host memory) later blocks re-quantize per sweep
    # instead of growing host RSS without bound; re-quantization is
    # deterministic so cached and uncached blocks see identical codes.
    _qcache = {}        # idx -> uint8 codes (host), capped by budget
    _scales_dev = {}    # idx -> device-resident scales (tiny, ALWAYS cached:
    #                     per-transfer latency on slow links makes a few
    #                     hundred bytes cost almost as much as megabytes)
    _qcache_bytes = [0]
    _raw_budget = os.environ.get("NMF_TPU_QCACHE_BYTES", 8 * 1024**3)
    try:
        _QCACHE_BUDGET = int(float(_raw_budget))
    except (TypeError, ValueError):
        raise ValueError(
            f"NMF_TPU_QCACHE_BYTES must be a number of bytes, got "
            f"{_raw_budget!r}"
        ) from None

    def _put_x(idx: int, mask_np=None):
        """Place block idx's X on device; int8 codes come from the host
        cache when budgeted (masked and unmasked runs share this path —
        on meshes the scales get their own policy placement).  ``mask_np``
        (masked runs, EVERY dtype) zeroes unobserved entries host-side —
        the in-memory invariant: masked values may be garbage including
        NaN/Inf, and 0 * NaN = NaN would poison the streamed factors."""
        j0, j1 = blocks[idx]
        if not quantized:
            return jax.device_put(
                _host_prep(source.columns(j0, j1), eps, xd, mask=mask_np),
                device,
            )
        if idx in _qcache:
            q_np = _qcache[idx]
        else:
            q_np, s_np = _host_prep(
                source.columns(j0, j1), eps, xd,
                config.precision.x_quant_rows, mask=mask_np,
            )
            if idx not in _scales_dev:
                _scales_dev[idx] = jax.device_put(s_np, scales_target)
            if _qcache_bytes[0] + q_np.nbytes <= _QCACHE_BUDGET:
                _qcache[idx] = q_np
                _qcache_bytes[0] += q_np.nbytes
        return (jax.device_put(q_np, device), _scales_dev[idx])

    def put(idx: int):
        if mask_source is None:
            return _put_x(idx)
        j0, j1 = blocks[idx]
        m_np = mask_source.columns(j0, j1)
        x_dev = _put_x(idx, mask_np=m_np)
        return (x_dev, jax.device_put(_cast_mask(m_np, xd), device))

    # the accelerated loop deposits its full resume state here before every
    # _save (adapted momentum + extrapolation pair), so a killed accelerated
    # streamed run resumes EXACTLY where it left off; the plain loop leaves
    # the defaults (NaN / None) and checkpoints stay as before
    _accel_ck = {"mom": float("nan"), "w_ex": None, "h_ex": None}

    def _save():
        from ..utils import checkpoint as ckpt

        if mesh is not None:
            # factors stay sharded end-to-end (pod-safe orbax path: each
            # host writes its addressable shards; the H blocks are saved as
            # the list the loop carries — no gather, no host round trip; the
            # accel extrapolation pair shards exactly like W / the H blocks)
            state = ckpt.CheckpointState(
                w=w,
                h=h_blocks,
                iteration=it,
                cost_history=hist_list,
                converged=converged,
                check_iterations=labels,
                momentum=_accel_ck["mom"],
                w_ex=_accel_ck["w_ex"],
                h_ex=_accel_ck["h_ex"],
            )
            ckpt.save_checkpoint_sharded(checkpoint_dir, state, config)
            return
        state = ckpt.CheckpointState(
            w=np.asarray(w),
            h=np.concatenate([np.asarray(hb) for hb in h_blocks], axis=1),
            iteration=it,
            cost_history=hist_list,
            converged=converged,
            check_iterations=labels,
            momentum=_accel_ck["mom"],
            w_ex=(
                np.asarray(_accel_ck["w_ex"], np.float32)
                if _accel_ck["w_ex"] is not None else None
            ),
            h_ex=(
                np.concatenate(
                    [np.asarray(hb, np.float32) for hb in _accel_ck["h_ex"]],
                    axis=1,
                )
                if _accel_ck["h_ex"] is not None else None
            ),
        )
        ckpt.save_checkpoint(checkpoint_dir, state, config)

    max_iter = int(config.max_iter)
    check_every = int(config.check_every)
    thresh = float(config.thresh)
    need_cost = config.track_cost or thresh > 0.0
    prev_cost = hist_list[-1] if hist_list else float("nan")

    from ..utils.metrics import emit_live

    def _sweep(w_src, get_h, set_h):
        """One full iteration: a single double-buffered sweep over the
        blocks (prefetch overlaps each block's math), reading each block's
        H through ``get_h`` and committing through ``set_h`` — the ONE
        sweep body both the plain and the accelerated loops run (the
        accelerated loop's accessors add the extrapolation)."""
        a1, a2 = _zeros()
        inflight = put(0)
        for idx in range(len(blocks)):
            x_dev = inflight
            if idx + 1 < len(blocks):
                inflight = put(idx + 1)  # prefetch overlaps this block's math
            h_new, a1, a2 = step_acc(w_src, get_h(idx), x_dev, a1, a2)
            set_h(idx, h_new)
        w_new = w_epilogue(w_src, a1, a2)
        if n_frozen:
            w_new = _freeze(w_new, _mk, _w_frz)
        return w_new

    def _plain_sweep(w_cur):
        """One plain-MU iteration; mutates ``h_blocks`` in place (their
        buffers are donated) and returns the new W."""
        return _sweep(
            w_cur, h_blocks.__getitem__, h_blocks.__setitem__
        )

    def _cost_pass(w_c, h_list):
        """Stream X once more and return the full-objective cost (check
        iterations only; the accelerated loop's acceptance test too).

        Per-block costs stay on device (async futures) and sync ONCE at the
        end — a per-block float() would insert a D2H round-trip stall
        between block dispatches on this high-latency link."""
        parts = []
        inflight = put(0)
        for idx in range(len(blocks)):
            x_dev = inflight
            if idx + 1 < len(blocks):
                inflight = put(idx + 1)
            parts.append(cost_block(w_c, h_list[idx], x_dev))
        total = float(jnp.sum(jnp.stack(parts))) if parts else 0.0
        return total + float(cost_extra(w_c))

    start_iter = it
    if config.accelerate:
        # ---- safeguarded Nesterov-accelerated streamed loop ----
        # The host-driven restatement of solver._run_accel_loop: each sweep
        # runs from an extrapolated (W, H) pair, the recorded iterate stays
        # the un-extrapolated sweep output, and every check block the
        # streamed cost gates acceptance — a rejected block restores the
        # block-start snapshot and is redone with plain MU, so the recorded
        # history keeps MU's monotone guarantee.  Streaming-cost accounting:
        # an accepted block streams X (chunk + 1) times, exactly what the
        # plain loop streams with cost tracking on; only the (measured-rare)
        # reject path re-streams its block.  The snapshot/extrapolation
        # state is factor-sized (W + H twice over) — X never copies.
        _extrap, _copy = _accel_jits()
        # resumed runs continue from the checkpoint's adapted coefficient
        # (NaN = fresh / pre-field checkpoint -> config.accel_momentum)
        mom = (
            resumed_mom
            if resumed_mom == resumed_mom
            else float(config.accel_momentum)
        )
        m_hi = float(config.accel_momentum_max)
        grow = float(config.accel_grow)
        shrink = float(config.accel_shrink)
        # Acceptance needs a real baseline: resumed runs reuse their last
        # recorded check; fresh runs pay one up-front cost stream (the
        # in-memory loop seeds identically, solver.py _seed_cost).
        baseline = prev_cost
        if baseline != baseline and it < max_iter and not converged:  # NaN
            baseline = _cost_pass(w, h_blocks)
        # Extrapolation state starts AT the iterate; copies, because the
        # sweep donates the extrapolated buffers while the iterate (and the
        # snapshot aliasing it) must survive the block.  A checkpoint that
        # carries the pair restores it instead, so a killed accelerated run
        # resumes EXACTLY (resume == straight run; tests/test_streaming.py).
        if resumed_w_ex is not None:
            if mesh is not None:
                # sharded restore: the pair came back as the (already
                # sharded, sd-dtype) W array + H block list
                w_ex = resumed_w_ex
                h_ex = list(resumed_h_ex)
            else:
                w_ex = jnp.maximum(
                    jax.device_put(
                        np.asarray(resumed_w_ex, np.float32), w_target
                    ).astype(sd),
                    jnp.asarray(eps, sd),
                )
                hx = np.asarray(resumed_h_ex, np.float32)
                h_ex = [
                    jnp.maximum(
                        jax.device_put(
                            np.ascontiguousarray(hx[:, j0:j1]), h_target
                        ).astype(sd),
                        jnp.asarray(eps, sd),
                    )
                    for j0, j1 in blocks
                ]
        else:
            w_ex = _copy(w)
            h_ex = [_copy(hb) for hb in h_blocks]
        w_snap, h_snap = w, list(h_blocks)
        last_save = it
        def _set_h_extrapolated(idx, h_new):
            # commit the plain iterate; the NEXT sweep runs from the
            # extrapolated point (reads the current momentum each call)
            h_ex[idx] = _extrap(h_new, h_blocks[idx], mom, eps)
            h_blocks[idx] = h_new

        while it < max_iter and not converged:
            chunk = min(check_every, max_iter - it)
            for _ in range(chunk):
                w_new = _sweep(w_ex, h_ex.__getitem__, _set_h_extrapolated)
                w_ex = _extrap(w_new, w, mom, eps)
                w = w_new
            it += chunk
            total = _cost_pass(w, h_blocks)
            if total <= baseline:
                mom = min(mom * grow, m_hi)
            else:
                # reject (NaN escapes land here too): restore the
                # block-start snapshot, redo the block with plain MU
                w = _copy(w_snap)
                h_blocks[:] = [_copy(hb) for hb in h_snap]
                for _ in range(chunk):
                    w = _plain_sweep(w)
                total = _cost_pass(w, h_blocks)
                w_ex = _copy(w)
                h_ex = [_copy(hb) for hb in h_blocks]
                mom = mom * shrink
            w_snap, h_snap = w, list(h_blocks)
            rel = (
                abs(baseline - total) / abs(total) if total else float("nan")
            )
            hist_list.append(total)
            labels.append(it)
            prev_cost = baseline = total
            if config.live_metrics:
                emit_live(it, total, rel)
            if thresh > 0.0 and rel < thresh:
                converged = True
            if checkpoint_dir and (
                it - last_save >= checkpoint_every
                or it == max_iter
                or converged
            ):
                # full accel resume state rides the checkpoint (read by
                # _save; the pair is consumed there before the next sweep
                # can donate those buffers away)
                _accel_ck.update(mom=mom, w_ex=w_ex, h_ex=list(h_ex))
                _save()
                last_save = it
    else:
        while it < max_iter and not converged:
            w = _plain_sweep(w)
            it += 1

            if need_cost and (it % check_every == 0 or it == max_iter):
                total = _cost_pass(w, h_blocks)
                hist_list.append(total)
                labels.append(it)
                rel = (
                    abs(prev_cost - total) / abs(total)
                    if total
                    else float("nan")
                )
                if config.live_metrics:
                    emit_live(it, total, rel)
                if thresh > 0.0 and rel < thresh:
                    converged = True
                prev_cost = total
            if checkpoint_dir and (
                (it - start_iter) % checkpoint_every == 0
                or it == max_iter
                or converged
            ):
                _save()

    n_slots = max(len(hist_list), 1)
    hist = np.full((n_slots,), np.nan, np.float32)
    hist[: len(hist_list)] = hist_list
    return SolveResult(
        w=w,
        h=jnp.concatenate(h_blocks, axis=1),
        iterations=jnp.asarray(it, jnp.int32),
        cost=jnp.asarray(prev_cost, jnp.float32),
        cost_history=jnp.asarray(hist),
        num_checks=jnp.asarray(len(hist_list), jnp.int32),
        converged=jnp.asarray(converged, jnp.bool_),
        momentum=jnp.asarray(
            mom if config.accelerate else float("nan"), jnp.float32
        ),
    )


@dataclasses.dataclass
class TransformResult:
    """Out-of-core H-only result.  ``h`` lives on the HOST (N may exceed
    HBM); per-block fields are aligned with ``blocks``."""

    h: np.ndarray                # (K, N) float32
    cost: float                  # total divergence over all columns (NaN if untracked)
    iterations: np.ndarray       # i32 [n_blocks]: solve iterations per block
    converged: np.ndarray        # bool [n_blocks]
    block_costs: np.ndarray      # f32 [n_blocks]
    blocks: List[Tuple[int, int]]


def transform_out_of_core(
    x,
    w,
    h0=None,
    config: SolveConfig = SolveConfig(),
    block_n: Optional[int] = None,
    mesh=None,
    seed: int = 0,
    mask=None,
) -> TransformResult:
    """Solve H against a FIXED W with X streamed from the host (inference).

    The H half-update is column-local — block j's H depends only on X block
    j and W — so unlike :func:`solve_out_of_core` each block needs exactly
    ONE visit: stream it in (double-buffered), run the full H-only solve
    (same loop/convergence machinery as :func:`nmf_tpu.solve_h_only`, with
    per-block convergence), and stream H back out.  X crosses the link once
    per RUN, not once per iteration: whole-catalog inference against a
    learned dictionary at any N.

    ``x`` may be an array / memmap / ``.bin`` path / column source;
    ``h0`` an optional (K, N) warm start (sliced per block) — omitted, each
    block gets a seeded uniform init like ``NMF.transform``.  ``cost`` is
    exact: divergences are column-separable, so the total is the sum of
    block costs (NaN when ``track_cost=False`` and ``thresh == 0``).

    All H-only families are supported (KL, beta, penalized-KL, HALS), f32 /
    bf16 / int8 X storage (the wire carries the storage bytes), and meshes
    (per-block sharded H-only solves on the canonical layout) — including
    int8 on meshes (shard-local dequantization, as in :func:`solve_h_only`).
    ``mask`` (array / ``.bin`` path / source, same shape as X) streams
    alongside X for missing-data scoring — the stream-once counterpart of
    :func:`nmf_tpu.solve_masked_h_only` (KL family; dense f32/bf16 X).
    """
    import jax
    import jax.numpy as jnp

    config.validate()
    if config.live_metrics:
        # per-block restarts of the iteration counter are noise, not signal
        config = dataclasses.replace(config, live_metrics=False)
    if config.precision.x_quant_rows and config.backend == "pallas":
        # same contract as solve_out_of_core/solve_online: the fused
        # kernels' scales operand is per-column, and a dequant-then-Pallas
        # wrap would materialize full f32 X blocks each visit
        raise NotImplementedError(
            "per-row-block int8 scales (x_quant_rows) take the jnp path — "
            "the fused kernels' scales operand is per-column; drop "
            "backend='pallas' or x_quant_rows"
        )
    quant = config.precision.x_dtype == "int8"
    source = _as_source(x)
    m, n = source.shape
    mask_source = None
    if mask is not None:
        if config.beta != 1.0 or config.algorithm != "mu":
            raise NotImplementedError(
                "masked transforms implement the KL (beta=1) MU family"
            )
        if quant:
            raise NotImplementedError(
                "masked transforms take dense f32/bf16 X"
            )
        mask_source = _as_source(mask)
        if mask_source.shape != (m, n):
            raise ValueError(
                f"mask shape {mask_source.shape} != X shape {(m, n)}"
            )
    w = np.asarray(w, np.float32)
    if w.ndim != 2 or w.shape[0] != m:
        raise ValueError(f"W {w.shape} does not match X {(m, n)}")
    k = w.shape[1]
    if h0 is not None:
        h0 = np.asarray(h0, np.float32)
        if h0.shape != (k, n):
            raise ValueError(f"h0 {h0.shape} must be ({k}, {n})")
    eps = config.eps
    sd = jnp.dtype(config.precision.state_dtype)
    xd = config.precision.x_dtype
    if block_n is not None and int(block_n) < 1:
        raise ValueError(f"block_n must be >= 1, got {block_n}")
    bn = block_n if block_n is not None else pick_block_n(m, n)
    if mesh is not None:
        from ..parallel.mesh import COL_AXIS, ROW_AXIS

        r, c = mesh.shape[ROW_AXIS], mesh.shape[COL_AXIS]
        if m % r or n % c:
            raise ValueError(
                f"global dims (M={m}, N={n}) must divide the mesh "
                f"{dict(mesh.shape)}"
            )
        bn = max(c, (bn // c) * c)
    blocks: List[Tuple[int, int]] = [
        (j, min(j + bn, n)) for j in range(0, n, bn)
    ]

    w_clamped = np.maximum(w, np.float32(eps))
    if mesh is None:
        platform = jax.default_backend()
        w_dev = jnp.asarray(w_clamped, sd)

        def _cfg_for(width: int) -> SolveConfig:
            if config.beta != 1.0 or config.backend not in ("auto", "autotune"):
                return config
            if platform == "tpu" and not config.regularized and not quant:
                from ..utils.autotune import rule_pick

                choice = rule_pick(m, k, width, config.precision.matmul_dtype)
            else:
                choice = "jnp"
            return dataclasses.replace(config, backend=choice)

        if mask_source is not None:
            from .masked import _masked_h_only_jit

            def _solve_block(x_dev, h_dev, width):
                x_only, m_dev = x_dev
                return _masked_h_only_jit(config)(x_only, w_dev, h_dev, m_dev)

        else:
            from .nmf import _h_only_jit

            def _solve_block(x_dev, h_dev, width):
                return _h_only_jit(_cfg_for(width), platform)(
                    x_dev, w_dev, h_dev
                )

    def _gen_h0(idx):
        j0, j1 = blocks[idx]
        if h0 is not None:
            return np.maximum(h0[:, j0:j1], np.float32(eps))
        rng = np.random.RandomState(seed + idx)
        # clamp like every other random-init entry path: an exact-zero entry
        # is an absorbing state under multiplicative updates
        return np.maximum(rng.rand(k, j1 - j0).astype(np.float32), np.float32(eps))

    # ---- the single pass: solve block idx while block idx+1 transfers
    # and block idx-1's result drains; at most ~3 blocks are device-live,
    # so memory stays independent of N ----
    h_parts: List[np.ndarray] = []
    iters: List[int] = []
    convs: List[bool] = []
    costs: List[float] = []

    def _fetch(res):
        h_parts.append(np.asarray(res.h, np.float32))
        iters.append(int(res.iterations))
        convs.append(bool(res.converged))
        costs.append(float(res.cost))

    if mesh is None:

        def _put(idx):
            j0, j1 = blocks[idx]
            # the mask reaches _host_prep for EVERY dtype: unobserved
            # entries may be NaN/Inf and must be zeroed before anything
            # (including the bf16 cast / quantization) reads them — the
            # in-memory _masked_validate_and_prep invariant
            m_np = (
                mask_source.columns(j0, j1) if mask_source is not None
                else None
            )
            x_np = _host_prep(
                source.columns(j0, j1), eps, xd,
                config.precision.x_quant_rows, mask=m_np,
            )
            if quant:
                x_dev = (jnp.asarray(x_np[0]), jnp.asarray(x_np[1]))
            else:
                x_dev = jnp.asarray(x_np)
            if mask_source is not None:
                x_dev = (x_dev, jnp.asarray(_cast_mask(m_np, xd)))
            return x_dev, jnp.asarray(_gen_h0(idx), sd)

        inflight = _put(0)
        prev = None
        for idx in range(len(blocks)):
            x_dev, h_dev = inflight
            res = _solve_block(x_dev, h_dev, blocks[idx][1] - blocks[idx][0])
            if idx + 1 < len(blocks):
                inflight = _put(idx + 1)  # overlaps this block's solve
            if prev is not None:
                _fetch(prev)  # drains idx-1 while idx computes
            prev = res
        _fetch(prev)
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import COL_AXIS, nmf_shardings

        if mask_source is not None:
            from .masked import _masked_h_only_sharded_jit

            solver = _masked_h_only_sharded_jit(config, mesh)
        else:
            from .nmf import _h_only_sharded_jit

            solver = _h_only_sharded_jit(config, mesh)
        from ..parallel.mesh import quant_scale_spec_for

        xs_t, ws_t, hs_t, _ = nmf_shardings(mesh)
        scales_t = NamedSharding(
            mesh,
            quant_scale_spec_for(config.precision),
        )
        # W crosses the link ONCE for the whole run (it is fixed)
        w_placed = jax.device_put(w_clamped, ws_t).astype(sd)

        def _put_mesh(idx):
            # mask into _host_prep for EVERY dtype (NaN/Inf-safe zeroing
            # of unobserved entries — the in-memory prep invariant)
            m_np = (
                mask_source.columns(*blocks[idx])
                if mask_source is not None else None
            )
            x_np = _host_prep(
                source.columns(*blocks[idx]), eps, xd,
                config.precision.x_quant_rows, mask=m_np,
            )
            if quant:
                x_s = (
                    jax.device_put(x_np[0], xs_t),
                    jax.device_put(x_np[1], scales_t),
                )
            else:
                x_s = jax.device_put(x_np, xs_t)
            if mask_source is not None:
                x_s = (x_s, jax.device_put(_cast_mask(m_np, xd), xs_t))
            return x_s, jax.device_put(_gen_h0(idx), hs_t).astype(sd)

        inflight = _put_mesh(0)
        prev = None
        for idx in range(len(blocks)):
            x_s, h_s = inflight
            res = solver(
                x_s, w_placed, h_s,
                jnp.asarray(jnp.nan, jnp.float32),
                jnp.asarray(jnp.nan, jnp.float32),
            )
            if idx + 1 < len(blocks):
                inflight = _put_mesh(idx + 1)  # overlaps this block's solve
            if prev is not None:
                _fetch(prev)  # drains idx-1 while idx computes
            prev = res
        _fetch(prev)

    need_cost = config.track_cost or config.thresh > 0.0
    total = float(np.sum(costs)) if need_cost else float("nan")
    return TransformResult(
        h=np.concatenate(h_parts, axis=1),
        cost=total,
        iterations=np.asarray(iters, np.int32),
        converged=np.asarray(convs, np.bool_),
        block_costs=np.asarray(costs, np.float32),
        blocks=blocks,
    )
