"""Fused Pallas TPU kernels for the multiplicative-update hot path.

Why these exist (the HBM-traffic argument)
------------------------------------------
The reference materialises ``Z = X ./ clamp(W@H)`` as an M x N device buffer
and reads it back for the second GEMM of each half-update (nmf.cu:94,
125-145): per iteration that is ~6 full M x N HBM passes besides X itself.
On TPU the whole half-update is instead computed *tile-wise in VMEM*:

    H half-update:  numer = W^T @ (X / clamp(W @ H, eps))
    W half-update:  numer = (X / clamp(W @ H, eps)) @ H^T

Each kernel streams X exactly once, keeps the (bm x bn) reconstruction tile,
the clamp, the divide and both MXU contractions on-chip, and writes only the
K-sized result — Z never exists in HBM.  Per full iteration the HBM traffic
drops to ~2 reads of X + a few K-sized streams, which together with bf16 MXU
inputs is what buys the ">= 80% of roofline" target (BASELINE.md).

Grid layout (both kernels): 2-D grid with the *contraction* axis innermost so
the accumulator scratch is revisited across consecutive grid steps — the
standard Pallas reduction pattern.  The final grid step applies the
broadcast-divide (by clamped column/row sums, computed cheaply outside) and
the elementwise multiply with the old factor, fusing the reference's
``col_divide``/``row_divide`` + ``vec_mul`` epilogues (nmf.cu:142-145,
172-175) into the same kernel.

Numerics: accumulation is always float32; with ``Precision('bfloat16')`` the
MXU inputs (W, H tiles and the ratio tile) are cast to bf16.  Zero padding to
tile multiples is exact (pad regions contribute 0 to every contraction),
replacing the reference's EPS-contaminated padding (SURVEY.md section 2.4).

Every kernel has a jnp fallback (``nmf_tpu.ops.mu``) selected automatically
off-TPU; ``interpret=True`` runs these same kernels on CPU for tests.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.config import Precision
from ...utils.device import chip_spec
from ..elementwise import EPS, eps_clamp

__all__ = [
    "supported",
    "update_h_fused",
    "update_w_fused",
    "mu_step_fused",
]

_F32 = jnp.float32

# Conservative (v5e-measured) defaults; the per-generation values live in
# utils/device.py and are resolved via chip_spec() at call time.  This
# constant is kept as the module-level fallback ceiling (tests reference it;
# the GENERIC spec row equals it).
MAX_FUSED_K = 2048


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fit_blocks(k: int, block_m: int, block_n: int, mm_dtype) -> tuple:
    """Shrink (bm, bn) until the kernel's VMEM working set fits.

    Word model per grid step: double-buffered inputs 2*(bm*k + k*bn + bm*bn)
    plus the accumulator and output (~k*bn + bm*k).  fp32-HIGHEST dots use
    multi-pass Mosaic scratch proportional to the tile product, so the fp32
    budget is half the bf16 one — measured on v5e: (512, 1024) f32 tiles at
    K=256 exceed the 16 MiB scoped-vmem limit while bf16 fits comfortably.
    Budgets are per-generation (utils/device.py).
    """
    spec = chip_spec()
    budget = (
        spec.vmem_words_f32 if jnp.dtype(mm_dtype) == _F32
        else spec.vmem_words_bf16
    )
    bm, bn = block_m, block_n
    while True:
        words = 2 * (bm * k + k * bn + bm * bn) + k * bn + bm * k
        if words <= budget or (bm <= 64 and bn <= 128):
            return bm, bn
        if bn >= bm and bn > 128:
            bn //= 2
        elif bm > 64:
            bm //= 2
        else:
            bn //= 2


def _balanced(extent: int, quantum: int, block: int) -> int:
    """Largest block <= ``block`` that divides the padded extent evenly.

    Avoids ragged-tail waste: e.g. 1025 rows with block 512 would pad to
    1536 (+50%); the balanced block 344 pads to 1032 (+0.7%).
    """
    padded = _round_up(extent, quantum)
    n_blk = -(-padded // block)
    return _round_up(-(-padded // n_blk), quantum)


def supported(k: Optional[int] = None) -> bool:
    """Whether the fused path applies (rank small enough to keep in VMEM).

    The ceiling is per device generation (utils/device.py); above it the
    jnp/XLA path — which tiles K itself — is used instead.
    """
    return k is None or k <= chip_spec().max_fused_k


def _default_blocks(block_m: Optional[int], block_n: Optional[int]) -> Tuple[int, int]:
    """Fill unspecified tile extents from the device-generation table.

    The v5e-measured (512, 1024) reaches ~97% of bf16 peak at the flagship
    10240x10240 rank-256 workload vs ~60% for (256, 512); other generations
    carry their own row (f32 sublane/lane quanta are (8, 128)).
    """
    spec = chip_spec()
    return (
        spec.block_m if block_m is None else block_m,
        spec.block_n if block_n is None else block_n,
    )


def _pad2(a: jnp.ndarray, rows: int, cols: int) -> jnp.ndarray:
    pr, pc = rows - a.shape[0], cols - a.shape[1]
    if pr == 0 and pc == 0:
        return a
    return jnp.pad(a, ((0, pr), (0, pc)))


def _unpack_x(x):
    """X is either an array or a (uint8 codes, per-column f32 scales) pair
    from ops.quant.quantize_columns (x_dtype='int8')."""
    if isinstance(x, tuple):
        q, scales = x
        return q, scales, True
    return x, None, False


def _dense_x(x):
    """Dequantize for the jnp fallback paths (never taken on the hot path)."""
    if isinstance(x, tuple):
        from ..quant import dequantize

        return dequantize(x[0], x[1])
    return x


def _scales_operand(xs, n, np_):
    """Padded (1, np_) scales row for the kernel, or a (1,1) placeholder."""
    if xs is None:
        return jnp.zeros((1, 1), _F32)
    return jnp.pad(
        xs.astype(_F32), (0, np_ - n), constant_values=1.0
    ).reshape(1, np_)


def _x_quantum(xq) -> int:
    if xq.dtype == jnp.uint8:
        return 32
    return 16 if xq.dtype == jnp.bfloat16 else 8


def _plan_launch(m, n, k, xq, precision, block_m, block_n, state_dtype):
    """Shared launch planning for the three fused kernels: default tile
    extents, the single-N-tile deepening heuristic, VMEM fitting, and
    quantum-aligned balancing.

    The sublane quantum honors BOTH operands that ``bm`` slices: X (8/16/32
    words per sublane tile by dtype) and the W/state blocks (16 for bf16
    state) — keying on X alone could hand Mosaic a bf16 W block on a
    non-16-multiple row boundary.  An EXPLICIT block_m is respected: the
    single-N-tile bump applies only to the device-table default, so tuning
    sweeps measure the tile they asked for.
    """
    explicit_m = block_m is not None
    block_m, block_n = _default_blocks(block_m, block_n)
    mm_dt = jnp.dtype(precision.mm_input_dtype)
    if not explicit_m and _round_up(n, 128) <= block_n:
        # single lane-tile along N: more rows per grid step instead
        # (measured on the H kernel at 4096x350 k=128: 86 -> 119 TF/s;
        # adopted for all three launches)
        block_m = max(block_m, 1024)
    bm_cap, bn_cap = _fit_blocks(k, block_m, block_n, mm_dt)
    quantum = _x_quantum(xq)
    if jnp.dtype(state_dtype) == jnp.bfloat16:
        quantum = max(quantum, 16)
    bm = _balanced(m, quantum, bm_cap)
    bn = _balanced(n, 128, bn_cap)
    mp, np_ = _round_up(m, bm), _round_up(n, bn)
    # float32_fast: Mosaic cannot lower Precision.HIGH, so the kernels do
    # the 3-pass bf16 decomposition themselves (split3).
    split3 = precision.matmul_dtype == "float32_fast"
    return bm, bn, mp, np_, mm_dt, split3


# ---------------------------------------------------------------------------
# In-kernel GEMM operand preparation.  Mosaic does not lower
# lax.Precision.HIGH, so the float32_fast policy's 3-pass bf16 split-float
# dot is implemented manually: a = hi + lo with hi = bf16(a),
# lo = bf16(a - hi); a@b ~= hi@bh + hi@bl + lo@bh (the lo*lo term, of
# relative order 2^-16, is dropped).  Each pass runs the MXU at full bf16
# rate, so the ceiling is bf16_peak/3 vs ~bf16_peak/6 for HIGHEST.
# ---------------------------------------------------------------------------


def _prep_operand(a, mm_dtype, split3):
    """Cast a kernel tile for the MXU: bf16/f32 array, or (hi, lo) pair."""
    if not split3:
        return a.astype(mm_dtype)
    a32 = a.astype(_F32)
    hi = a32.astype(jnp.bfloat16)
    lo = (a32 - hi.astype(_F32)).astype(jnp.bfloat16)
    return (hi, lo)


def _kdot(pa, pb, dims, lax_prec, split3):
    """dot_general over prepared operands (3-pass decomposition if split3)."""

    def d(u, v, prec):
        return jax.lax.dot_general(
            u, v, dims, preferred_element_type=_F32, precision=prec
        )

    if not split3:
        return d(pa, pb, lax_prec)
    (ah, al), (bh, bl) = pa, pb
    fast = jax.lax.Precision.DEFAULT
    return d(ah, bh, fast) + d(ah, bl, fast) + d(al, bh, fast)


# ---------------------------------------------------------------------------
# H half-update: H_new = H * (W^T @ (X / clamp(W@H))) / sumW[:, None]
# ---------------------------------------------------------------------------


def _h_kernel(w_ref, h_ref, x_ref, xs_ref, sumw_ref, out_ref, acc_ref, *, eps, mm_dtype, lax_prec, n_m, epilogue, split3=False, quantized=False):
    i = pl.program_id(1)  # contraction step over M tiles (innermost)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w_blk = _prep_operand(w_ref[:], mm_dtype, split3)   # (bm, K)
    h_blk = _prep_operand(h_ref[:], mm_dtype, split3)   # (K, bn)
    wh = _kdot(
        w_blk, h_blk, (((1,), (0,)), ((), ())), lax_prec, split3
    )                                          # (bm, bn) f32
    # dequant-in-register: uint8 codes * per-column scales, never in HBM
    # Mosaic lacks a direct uint8->f32 cast; hop through int32
    xv = (
        (x_ref[:].astype(jnp.int32).astype(_F32) * xs_ref[:])
        if quantized
        else x_ref[:]
    )
    z = xv / jnp.maximum(wh, eps)              # clamp per nmf.cu:128
    # acc += W_blk^T @ z : contract over the bm rows
    acc_ref[:] += _kdot(
        w_blk, _prep_operand(z, mm_dtype, split3),
        (((0,), (0,)), ((), ())), lax_prec, split3,
    )

    @pl.when(i == n_m - 1)
    def _():
        if epilogue:
            # fused col_divide + vec_mul epilogue (nmf.cu:142-145); sumw is
            # (K, 1) and broadcasts across lanes.
            out_ref[:] = (
                h_ref[:].astype(_F32) * acc_ref[:] / sumw_ref[:]
            ).astype(out_ref.dtype)
        else:
            # numerator only: sharded callers psum it across the mesh row
            # axis before applying the epilogue (parallel/sharded.py).
            out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def update_h_fused(
    w: jnp.ndarray,
    h: jnp.ndarray,
    x: jnp.ndarray,
    eps: float = EPS,
    precision: Precision = Precision(),
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    interpret: bool = False,
    numerator_only: bool = False,
) -> jnp.ndarray:
    """Fused H half-update (reference semantics of nmf.cu:118-146).

    With ``numerator_only=True`` returns just ``W^T @ (X/clamp(W@H))`` in f32
    (no divide/multiply epilogue) — the building block for the sharded solver,
    which must psum the numerator across the mesh before the epilogue.
    """
    m, k = w.shape
    _, n = h.shape
    xq, xs, quantized = _unpack_x(x)
    if not supported(k):
        from ..mu import matmul as _mm
        from ..mu import update_h

        x = _dense_x(x)
        if numerator_only:
            z = x / eps_clamp(_mm(w, h, precision), eps)
            return _mm(w, z, precision, transpose_a=True)
        return update_h(w, h, x, eps, precision)
    if numerator_only:
        # the no-epilogue path never reads sumw_ref (static branch): ship a
        # single-element placeholder instead of a needless (K,1) VMEM stream
        sum_w = jnp.zeros((1, 1), _F32)
    else:
        sum_w = eps_clamp(jnp.sum(w, axis=0, dtype=_F32), eps).reshape(k, 1)

    bm, bn, mp, np_, mm_dtype, split3 = _plan_launch(
        m, n, k, xq, precision, block_m, block_n, w.dtype
    )
    kp = k
    wp = _pad2(w, mp, kp)
    hp = _pad2(h, kp, np_)
    xp = _pad2(xq, mp, np_)
    xsp = _scales_operand(xs, n, np_)
    n_m, n_n = mp // bm, np_ // bn

    # split3 does its own decomposition; lax_prec is then unused
    lax_prec = (
        jax.lax.Precision.DEFAULT if split3 else precision.lax_matmul_precision()
    )
    kernel = functools.partial(
        _h_kernel, eps=float(eps), mm_dtype=mm_dtype,
        lax_prec=lax_prec, n_m=n_m, epilogue=not numerator_only,
        split3=split3, quantized=quantized,
    )
    xs_spec = (
        pl.BlockSpec((1, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM)
        if quantized
        else pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.VMEM)
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_n, n_m),
        in_specs=[
            pl.BlockSpec((bm, kp), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            xs_spec,
            pl.BlockSpec(sum_w.shape, lambda j, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kp, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (kp, np_), _F32 if numerator_only else h.dtype
        ),
        scratch_shapes=[pltpu.VMEM((kp, bn), _F32)],
        cost_estimate=pl.CostEstimate(
            # 2 GEMMs; split3 runs 3 bf16 dots per GEMM (same convention
            # as tile_sparse's estimate)
            flops=(12 if split3 else 4) * mp * np_ * kp,
            bytes_accessed=(mp * kp + kp * np_ + 2 * kp * np_) * 4
            + mp * np_ * xp.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(wp, hp, xp, xsp, sum_w)
    return out[:k, :n] if (kp, np_) != (k, n) else out


# ---------------------------------------------------------------------------
# W half-update: W_new = W * ((X / clamp(W@H)) @ H^T) / sumH[None, :]
# ---------------------------------------------------------------------------


def _w_kernel(w_ref, h_ref, x_ref, xs_ref, sumh_ref, out_ref, acc_ref, *, eps, mm_dtype, lax_prec, n_n, epilogue, split3=False, quantized=False):
    j = pl.program_id(1)  # contraction step over N tiles (innermost)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w_blk = _prep_operand(w_ref[:], mm_dtype, split3)   # (bm, K)
    h_blk = _prep_operand(h_ref[:], mm_dtype, split3)   # (K, bn)
    wh = _kdot(w_blk, h_blk, (((1,), (0,)), ((), ())), lax_prec, split3)
    # Mosaic lacks a direct uint8->f32 cast; hop through int32
    xv = (
        (x_ref[:].astype(jnp.int32).astype(_F32) * xs_ref[:])
        if quantized
        else x_ref[:]
    )
    z = xv / jnp.maximum(wh, eps)              # clamp per nmf.cu:158
    # acc += z @ H_blk^T : contract over the bn cols
    acc_ref[:] += _kdot(
        _prep_operand(z, mm_dtype, split3), h_blk,
        (((1,), (1,)), ((), ())), lax_prec, split3,
    )

    @pl.when(j == n_n - 1)
    def _():
        if epilogue:
            # fused row_divide + vec_mul epilogue (nmf.cu:172-175)
            out_ref[:] = (
                w_ref[:].astype(_F32) * acc_ref[:] / sumh_ref[:]
            ).astype(out_ref.dtype)
        else:
            out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def update_w_fused(
    w: jnp.ndarray,
    h: jnp.ndarray,
    x: jnp.ndarray,
    eps: float = EPS,
    precision: Precision = Precision(),
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    interpret: bool = False,
    numerator_only: bool = False,
) -> jnp.ndarray:
    """Fused W half-update (reference semantics of nmf.cu:148-176).

    With ``numerator_only=True`` returns just ``(X/clamp(W@H)) @ H^T`` in f32
    for the sharded solver (psum across the mesh column axis, then epilogue).
    """
    m, k = w.shape
    _, n = h.shape
    xq, xs, quantized = _unpack_x(x)
    if not supported(k):
        from ..mu import matmul as _mm
        from ..mu import update_w

        x = _dense_x(x)
        if numerator_only:
            z = x / eps_clamp(_mm(w, h, precision), eps)
            return _mm(z, h, precision, transpose_b=True)
        return update_w(w, h, x, eps, precision)
    if numerator_only:
        # no-epilogue path never reads sumh_ref: single-element placeholder
        sum_h = jnp.zeros((1, 1), _F32)
    else:
        sum_h = eps_clamp(jnp.sum(h, axis=1, dtype=_F32), eps).reshape(1, k)

    bm, bn, mp, np_, mm_dtype, split3 = _plan_launch(
        m, n, k, xq, precision, block_m, block_n, w.dtype
    )
    kp = k
    wp = _pad2(w, mp, kp)
    hp = _pad2(h, kp, np_)
    xp = _pad2(xq, mp, np_)
    xsp = _scales_operand(xs, n, np_)
    n_m, n_n = mp // bm, np_ // bn

    # split3 does its own decomposition; lax_prec is then unused
    lax_prec = (
        jax.lax.Precision.DEFAULT if split3 else precision.lax_matmul_precision()
    )
    kernel = functools.partial(
        _w_kernel, eps=float(eps), mm_dtype=mm_dtype,
        lax_prec=lax_prec, n_n=n_n, epilogue=not numerator_only,
        split3=split3, quantized=quantized,
    )
    xs_spec = (
        pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM)
        if quantized
        else pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_m, n_n),
        in_specs=[
            pl.BlockSpec((bm, kp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            xs_spec,
            pl.BlockSpec(sum_h.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, kp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (mp, kp), _F32 if numerator_only else w.dtype
        ),
        scratch_shapes=[pltpu.VMEM((bm, kp), _F32)],
        cost_estimate=pl.CostEstimate(
            # 2 GEMMs; split3 runs 3 bf16 dots per GEMM
            flops=(12 if split3 else 4) * mp * np_ * kp,
            bytes_accessed=(mp * kp + kp * np_ + 2 * mp * kp) * 4
            + mp * np_ * xp.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(wp, hp, xp, xsp, sum_h)
    return out[:m, :k] if (mp, kp) != (m, k) else out


def mu_step_fused(
    w: jnp.ndarray,
    h: jnp.ndarray,
    x: jnp.ndarray,
    eps: float = EPS,
    precision: Precision = Precision(),
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One full fused MU iteration — drop-in for :func:`nmf_tpu.ops.mu.mu_step`."""
    h = update_h_fused(w, h, x, eps, precision, interpret=interpret)
    w = update_w_fused(w, h, x, eps, precision, interpret=interpret)
    return w, h


# ---------------------------------------------------------------------------
# Fused KL divergence: sum(x*(log x - log y) - x + y), y = clamp(W@H, eps)
# ---------------------------------------------------------------------------


def _kl_kernel(w_ref, h_ref, x_ref, xs_ref, out_ref, acc_ref, *, eps, mm_dtype, lax_prec, n_steps, bm, bn, m, n, quantized=False):
    i, j = pl.program_id(0), pl.program_id(1)
    step = i * pl.num_programs(1) + j

    @pl.when(step == 0)
    def _():
        acc_ref[0, 0] = jnp.float32(0.0)

    wh = jax.lax.dot_general(
        w_ref[:].astype(mm_dtype), h_ref[:].astype(mm_dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=_F32,
        precision=lax_prec,
    )
    y = jnp.maximum(wh, eps)
    xb = (
        x_ref[:].astype(jnp.int32).astype(_F32) * xs_ref[:]
        if quantized
        else x_ref[:].astype(_F32)
    )
    # matrix.cu:592 formula.  The x*log(x/y) part uses the x->0 limit (0, not
    # NaN) so genuine zero entries still contribute their '+y' mass — same as
    # the jnp path (kl_divergence_from_recon).  Zero-padded entries beyond
    # the logical (m, n) extents are excluded via an iota bounds mask (they
    # would otherwise add a spurious +y each).
    rows = jax.lax.broadcasted_iota(jnp.int32, xb.shape, 0) + i * bm
    cols = jax.lax.broadcasted_iota(jnp.int32, xb.shape, 1) + j * bn
    in_bounds = (rows < m) & (cols < n)
    xlog = jnp.where(xb > 0, xb * (jnp.log(xb) - jnp.log(y)), 0.0)
    acc_ref[0, 0] += jnp.sum(jnp.where(in_bounds, xlog - xb + y, 0.0))

    @pl.when(step == n_steps - 1)
    def _():
        out_ref[0, 0] = acc_ref[0, 0]


def kl_cost_fused(
    x: jnp.ndarray,
    w: jnp.ndarray,
    h: jnp.ndarray,
    eps: float = EPS,
    precision: Precision = Precision(),
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """KL divergence D(X || clamp(W@H)) with the reconstruction kept in VMEM.

    The jnp path (ops.divergence.kl_divergence) materialises the M x N
    reconstruction in HBM and re-reads it for the reduction; this kernel
    streams X once and reduces tile-wise — the per-check analog of the fused
    update kernels.  Cost GEMM precision follows the same policy as the
    updates.
    """
    m, k = w.shape
    _, n = h.shape
    xq, xs, quantized = _unpack_x(x)
    if not supported(k):
        from ..divergence import kl_divergence

        return kl_divergence(_dense_x(x), w, h, eps)

    bm, bn, mp, np_, mm_dtype, _ = _plan_launch(
        m, n, k, xq, precision, block_m, block_n, w.dtype
    )
    wp = _pad2(w, mp, k)
    hp = _pad2(h, k, np_)
    xp = _pad2(xq, mp, np_)
    xsp = _scales_operand(xs, n, np_)
    n_m, n_n = mp // bm, np_ // bn

    # cost GEMM precision: HIGHEST for BOTH f32 policies (float32_fast speeds
    # up the update GEMMs only; the reported divergence must not drift)
    lax_prec = (
        jax.lax.Precision.HIGHEST if mm_dtype == _F32
        else jax.lax.Precision.DEFAULT
    )
    kernel = functools.partial(
        _kl_kernel, eps=float(eps), mm_dtype=mm_dtype, lax_prec=lax_prec,
        n_steps=n_m * n_n, bm=bm, bn=bn, m=m, n=n, quantized=quantized,
    )
    xs_spec = (
        pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM)
        if quantized
        else pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_m, n_n),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            xs_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), _F32),
        scratch_shapes=[pltpu.SMEM((1, 1), _F32)],
        cost_estimate=pl.CostEstimate(
            # one GEMM; HIGHEST f32 runs a multi-pass decomposition (~3 dots)
            flops=(6 if lax_prec == jax.lax.Precision.HIGHEST else 2)
            * mp * np_ * k,
            bytes_accessed=(mp * k + k * np_) * 4
            + mp * np_ * xp.dtype.itemsize,
            transcendentals=2 * mp * np_,
        ),
        interpret=interpret,
    )(wp, hp, xp, xsp)
    return out[0, 0]
