"""Numerical guards: NaN/Inf/negativity checks for inputs and results.

The reference avoids numerical blowups via EPS clamping alone and has no
diagnostics when they happen anyway.  JAX's functional purity excludes data
races by construction (SURVEY.md section 5, race-detection row); these guards
cover the remaining failure mode — non-finite values from pathological
inputs — with actionable errors instead of silent NaN factors.
"""

from __future__ import annotations

import numpy as np

__all__ = ["validate_input", "validate_result", "GuardError"]


class GuardError(ValueError):
    """An input or result failed a numerical sanity check."""


def _is_float_dtype(dtype) -> bool:
    # np.issubdtype rejects ml_dtypes' bfloat16 (it is not an np.floating
    # subclass), but bf16 is a first-class storage dtype in this codebase
    if np.issubdtype(dtype, np.floating):
        return True
    try:
        import ml_dtypes

        return dtype == np.dtype(ml_dtypes.bfloat16)
    except ImportError:  # pragma: no cover
        return False


def validate_input(name: str, arr) -> None:
    """Check an input matrix is finite and non-negative (host-side)."""
    a = np.asarray(arr)
    if not _is_float_dtype(a.dtype):
        raise GuardError(f"{name}: expected floating dtype, got {a.dtype}")
    if not np.issubdtype(a.dtype, np.floating):
        a = a.astype(np.float32)  # bf16: make the numpy reductions robust
    bad = ~np.isfinite(a)
    if bad.any():
        i = tuple(int(v) for v in np.argwhere(bad)[0])
        raise GuardError(
            f"{name}: {int(bad.sum())} non-finite entries (first at {i})"
        )
    if (a < 0).any():
        i = tuple(int(v) for v in np.argwhere(a < 0)[0])
        raise GuardError(
            f"{name}: {int((a < 0).sum())} negative entries (first at {i}, "
            f"value {float(a[i]):.6g}); NMF requires non-negative data"
        )


def validate_result(result) -> None:
    """Check a SolveResult's factors and cost are finite (host-side)."""
    for name, arr in (("W", result.w), ("H", result.h)):
        a = np.asarray(arr)
        bad = ~np.isfinite(a)
        if bad.any():
            i = tuple(int(v) for v in np.argwhere(bad)[0])
            raise GuardError(
                f"result {name}: {int(bad.sum())} non-finite entries "
                f"(first at {i}) after {int(result.iterations)} iterations"
            )
    cost = float(result.cost)
    if int(result.num_checks) > 0:  # untracked runs legitimately carry NaN
        if not np.isfinite(cost):
            raise GuardError(
                f"result cost is {cost} after {int(result.iterations)} iterations"
            )
