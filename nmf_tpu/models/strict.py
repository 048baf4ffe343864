"""Strict reference-replication mode: the padded-EPS numerics, exactly.

The default solver deliberately IMPROVES on the reference's numerics (exact
zero tile padding, unpadded-extent reductions — SURVEY.md section 2.4).  The
reference itself, however, computes over buffers padded to PAD_MULT=32
multiples (matrix.cuh:7) where:

  * ``set_epsilon`` clamps the PADDED buffer (matrix.cu:191), so padding
    regions become >= EPS at load (nmf.cu:211) and at every clamp site;
  * GEMMs run over padded extents, and ``sum_cols``/``sum_rows`` reduce over
    padded dims (matrix.cu:277-278, 396-397) — the padding columns of H
    evolve under the updates and contaminate ``sum_rows(H)`` by O(pad * EPS)
    amplified terms.

This module replicates that behaviour bit-faithfully in shape semantics: pad
X/W/H to 32-multiples with zeros (the reference's fresh cudaMalloc pages are
zeroed in practice; the value-ctor memsets, matrix.cu:79), apply the load
clamp over the padded buffers, run the standard jitted MU loop on the padded
shapes (every sum then covers the padded extent by construction), and
de-pad the factors at the end exactly like ``write_matrix`` (nmf.cu:227-232).

It exists for the md5-grade replication contract (test_output.sh): with
``thresh=0`` the iteration count is exact, every op is deterministic, and
the *algorithm* matches the reference including its padding artifacts.
Bit-identical output files across different hardware/compiler stacks remain
out of scope (XLA's f32 GEMM summation order differs from cuBLAS's — see
docs/PARITY.md, which also documents that the bundled goldens are
inconsistent with the bundled generator), but run-to-run determinism on a
given stack and algorithm-level equivalence are guaranteed.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..utils.config import Precision, SolveConfig

__all__ = ["PAD_MULT", "pad_to_mult", "solve_strict"]

PAD_MULT = 32  # cuda/matrix.cuh:7


def pad_to_mult(a: np.ndarray, mult: int = PAD_MULT) -> np.ndarray:
    """Zero-pad both dims up to the next multiple (reference add_padding,
    matrix.cu:42-95, with the zero-initialized-allocation behaviour)."""
    m, n = a.shape
    mp = -(-m // mult) * mult
    np_ = -(-n // mult) * mult
    if (mp, np_) == (m, n):
        return np.asarray(a, np.float32)
    out = np.zeros((mp, np_), np.float32)
    out[:m, :n] = a
    return out


def solve_strict(x, w0, h0, config: SolveConfig = SolveConfig()):
    """Factorize with the reference's exact padded-EPS numerics.

    Forces the reference-parity compute policy: true f32 GEMMs (cuBLAS-SGEMM
    equivalent precision class), the jnp/XLA step (whose op ordering mirrors
    nmf.cu:118-176 one-to-one), and padded-extent reductions via actual
    padded buffers.  Returns a SolveResult whose factors are de-padded to
    the logical shapes; the cost history (if tracked) is computed over the
    padded buffers, exactly as a reference-era ``update_div`` would have.
    """
    from .solver import SolveResult, solve

    config.validate()
    # strict mode replicates the reference's ONE algorithm: plain KL MU.
    # Anything that would change the update rule must error, not silently
    # produce output labeled as reference-grade replication.
    offending = [
        flag
        for flag, on in (
            ("accelerate=True", config.accelerate),
            (f"algorithm={config.algorithm!r}", config.algorithm != "mu"),
            (f"beta={config.beta}", config.beta != 1.0),
            ("l1/l2 penalties", config.regularized),
        )
        if on
    ]
    if offending:
        raise ValueError(
            "solve_strict replicates the reference's plain KL (beta=1) MU "
            f"update; {', '.join(offending)} would run a different "
            "algorithm under a reference-replication label"
        )
    x = np.asarray(x, np.float32)
    w0 = np.asarray(w0, np.float32)
    h0 = np.asarray(h0, np.float32)
    if x.shape != (w0.shape[0], h0.shape[1]) or w0.shape[1] != h0.shape[0]:
        raise ValueError(
            f"shape mismatch: X{x.shape} vs W{w0.shape} @ H{h0.shape}"
        )
    m, k = w0.shape
    n = h0.shape[1]
    strict_cfg = dataclasses.replace(
        config,
        backend="jnp",                      # reference op-ordering path
        precision=Precision("float32", "float32", "float32"),
    )
    res = solve(
        pad_to_mult(x), pad_to_mult(w0), pad_to_mult(h0), strict_cfg,
        clamp_inputs=True,                  # load clamp over PADDED buffers
    )
    return SolveResult(
        w=res.w[:m, :k],                    # de-pad like write_matrix
        h=res.h[:k, :n],
        iterations=res.iterations,
        cost=res.cost,
        cost_history=res.cost_history,
        num_checks=res.num_checks,
        converged=res.converged,
        momentum=res.momentum,
    )
