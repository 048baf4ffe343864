"""Device-generation keyed tuning table.

The fused-kernel tile extents, VMEM block budgets, the largest rank kept
resident in VMEM, the backend-selection rule, and the roofline peaks used for
reporting were all measured on TPU v5e (the reference hardware for this
build).  This module keys every one of those numbers by
``jax.Device.device_kind`` so that other chip generations get (a) their own
peak numbers for honest fraction-of-peak reporting and (b) a clearly-marked
conservative fallback instead of silently inheriting v5e magic numbers.

Provenance of each row:
  * ``v5e`` — measured in this repo (benchmarks/results.json; the f32 entry
    is the effective throughput of XLA's HIGHEST-precision multi-pass f32
    matmul, not a datasheet number).
  * other generations — public datasheet bf16 peaks; their f32 column is
    estimated with the same ~6x HIGHEST-precision multiplier observed on
    v5e, and marked ``measured=False`` so callers can tell.
  * unknown kinds — ``GENERIC`` fallback: v5e tile/VMEM settings (the ~16
    MiB/core scoped-VMEM budget they encode is the cross-generation Mosaic
    default) and ``None`` peaks, so fraction-of-peak reporting degrades to
    "unknown" rather than wrong.

The per-shape backend rule (`fused_small_k`, `fused_single_tile_n`) is
architectural — fusion wins where the update is HBM-bound — so the v5e
thresholds serve as defaults everywhere; ``backend="autotune"`` (now with an
on-disk cache, utils/autotune.py) measures and overrides per shape on any
chip.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

__all__ = ["ChipSpec", "chip_spec", "chip_spec_for", "GENERIC"]


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    """Per-generation tuning and reporting constants."""

    family: str                      # short label ("v5e", "v5p", ...)
    measured: bool                   # True only for rows tuned in this repo
    bf16_tflops: Optional[float]     # peak MXU bf16 throughput
    f32_tflops: Optional[float]      # effective f32-HIGHEST matmul peak
    # _fit_blocks VMEM word budgets (f32 words) for the fused kernels; the
    # f32 budget is half the bf16 one because HIGHEST-precision dots use
    # multi-pass Mosaic scratch proportional to the tile product.
    vmem_words_f32: int
    vmem_words_bf16: int
    block_m: int                     # default fused-kernel tile extents
    block_n: int
    max_fused_k: int                 # largest rank kept fully VMEM-resident
    # backend rule thresholds (see utils/autotune.rule_pick)
    fused_small_k: int = 64
    fused_single_tile_n: bool = True

    def peak_tflops(self, matmul_dtype: str) -> Optional[float]:
        if matmul_dtype == "float32":
            return self.f32_tflops
        if matmul_dtype == "float32_fast":
            # 3-pass bf16 split-float: ceiling is a third of the bf16 peak
            return self.bf16_tflops / 3.0 if self.bf16_tflops else None
        return self.bf16_tflops


_V5E = ChipSpec(
    family="v5e", measured=True, bf16_tflops=197.0, f32_tflops=33.0,
    vmem_words_f32=1_500_000, vmem_words_bf16=3_000_000,
    block_m=512, block_n=1024, max_fused_k=2048,
    # SETTLED by RETUNE_r05 (2026-08-19, 3 interleaved same-window sessions
    # per backend at 4096x350 k=128 bf16): jnp pooled median 74,755 it/s
    # (per-session 73,507 / 74,755 / 75,070) vs pallas 57,110 (56,779 /
    # 57,110 / 60,002) — jnp wins 1.31x with the loser outside the winner's
    # IQR, so the old single-lane-tile-N pallas preference (a round-2
    # single-session +17% reading) was chip noise.  XLA's own fusion beats
    # the hand kernel when N fits one lane tile.
    fused_single_tile_n=False,
)

# Conservative fallback for unknown device kinds: v5e tiling (16 MiB scoped
# VMEM is the cross-generation Mosaic default), no peak claims.
GENERIC = dataclasses.replace(
    _V5E, family="generic", measured=False, bf16_tflops=None, f32_tflops=None
)

# Ordered (substring, spec) table — first match on device_kind wins.  The
# device_kind strings: "TPU v5 lite" (v5e), "TPU v5" / "TPU v5p" (v5p),
# "TPU v6 lite" (v6e/Trillium), "TPU v4", "TPU v3".
_TABLE = (
    ("v5 lite", _V5E),
    ("v5e", _V5E),
    ("v6 lite", dataclasses.replace(
        _V5E, family="v6e", measured=False,
        bf16_tflops=918.0, f32_tflops=918.0 / 6.0,
    )),
    ("v6e", dataclasses.replace(
        _V5E, family="v6e", measured=False,
        bf16_tflops=918.0, f32_tflops=918.0 / 6.0,
    )),
    ("v5p", dataclasses.replace(
        _V5E, family="v5p", measured=False,
        bf16_tflops=459.0, f32_tflops=459.0 / 6.0,
    )),
    ("v5", dataclasses.replace(          # plain "TPU v5" reports as v5p
        _V5E, family="v5p", measured=False,
        bf16_tflops=459.0, f32_tflops=459.0 / 6.0,
    )),
    ("v4", dataclasses.replace(
        _V5E, family="v4", measured=False,
        bf16_tflops=275.0, f32_tflops=275.0 / 6.0,
    )),
    ("v3", dataclasses.replace(
        _V5E, family="v3", measured=False,
        bf16_tflops=123.0, f32_tflops=123.0 / 6.0,
        # v3 MXU/VMEM are a generation older; halve the tile budget
        vmem_words_f32=750_000, vmem_words_bf16=1_500_000,
        block_m=256, block_n=512, max_fused_k=1024,
    )),
)


def chip_spec_for(device_kind: str) -> ChipSpec:
    """Resolve a device_kind string to its tuning row (GENERIC if unknown)."""
    kind = device_kind.lower()
    for needle, spec in _TABLE:
        if needle in kind:
            return spec
    return GENERIC


@functools.lru_cache(maxsize=None)
def _cached_spec(kind: str) -> ChipSpec:
    return chip_spec_for(kind)


def chip_spec(device=None) -> ChipSpec:
    """Tuning row for ``device`` (default: the first visible device)."""
    if device is None:
        import jax

        devices = jax.devices()
        if not devices:
            return GENERIC
        device = devices[0]
    return _cached_spec(getattr(device, "device_kind", "") or "")
