"""Configuration dataclasses for the framework.

The reference's entire "config system" is compile-time macros
(``ITER_CHECK 25``, ``MAX_ITER 200``, ``CONVERGE_THRESH 0`` at nmf.cu:9-11,
``PAD_MULT 32`` at matrix.cuh:7) plus hard-coded paths (nmf.cu:37-45).  Here
those become first-class runtime config, with the reference defaults kept as
the compatibility preset (:func:`reference_preset`).
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["Precision", "SolveConfig", "reference_preset", "EPS_DEFAULT"]

EPS_DEFAULT = float(np.float32(2.2204e-16))  # cuda/matrix.cu:10


@dataclasses.dataclass(frozen=True)
class Precision:
    """Mixed-precision policy for the update step.

    * ``matmul_dtype``: GEMM input precision for the update step.
        - ``"float32"``: true f32 GEMMs (reference-parity; on TPU this
          lowers to XLA's HIGHEST multi-pass path, ~6x the bf16 cost).
        - ``"float32_fast"``: f32 inputs with the 3-pass bf16 split-float
          GEMM (``lax.Precision.HIGH``): each operand is decomposed into
          bf16 high+low parts and the lo*lo term is dropped, giving
          ~1e-7-grade f32 accuracy at roughly half the HIGHEST cost — the
          middle ground between slow-exact and bf16.  Cost/convergence
          GEMMs still run HIGHEST (the divergence must not drift).
        - ``"bfloat16"``: bf16 inputs, full-rate MXU.
      Accumulation is always float32 via ``preferred_element_type`` (never
      bf16 — see SURVEY.md section 7 step 4).
    * ``state_dtype``: dtype W/H are carried in between iterations.
    * ``x_dtype``: storage dtype of the data matrix X.  ``bfloat16`` halves
      the dominant HBM stream (X is read twice per iteration) for
      bandwidth-bound shapes at a one-time ~2^-8 relative rounding of the
      data; ``int8`` quarters it — uint8 codes with per-column f32 scales,
      dequantized in-register (ops/quant.py; opt-in, lossy for entries far
      below their column's peak).  The divide and all accumulation still
      happen in float32.
    * Reductions (column/row sums, KL cost) are always float32.
    """

    matmul_dtype: str = "float32"   # "float32" | "float32_fast" | "bfloat16"
    state_dtype: str = "float32"
    x_dtype: str = "float32"        # "float32" | "bfloat16" | "int8"
    # int8-X scale granularity: 0 = one scale per column (default; the
    # spectrogram per-frame layout), N > 0 = one scale per (N-row block,
    # column) — bounds each entry's error by its BLOCK's column peak / 510
    # instead of the whole column's (ops/quant.quantize_rowblocks).  jnp
    # path; supported by the in-memory dense/masked/h-only/batched/
    # selection solvers, the mesh solvers (the R x N scale table
    # replicates its row axis over 'mr' — parallel.sharded._quant_specs),
    # and the streamed/online entries (a streamed column chunk spans all M
    # rows, so its per-chunk table IS the in-memory table for those
    # columns — models/streaming._host_prep).  backend='pallas' raises
    # (the fused kernels' scales operand is per-column) and tile-sparse X
    # ignores it (already per-TILE scales, strictly finer).
    x_quant_rows: int = 0

    def validate(self) -> None:
        if self.matmul_dtype not in ("float32", "float32_fast", "bfloat16"):
            raise ValueError(f"unsupported matmul_dtype {self.matmul_dtype!r}")
        if self.state_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unsupported state_dtype {self.state_dtype!r}")
        if self.x_dtype not in ("float32", "bfloat16", "int8"):
            raise ValueError(f"unsupported x_dtype {self.x_dtype!r}")
        if self.x_quant_rows < 0:
            raise ValueError("x_quant_rows must be >= 0")
        if self.x_quant_rows and self.x_dtype != "int8":
            raise ValueError("x_quant_rows requires x_dtype='int8'")

    @property
    def mm_input_dtype(self) -> str:
        """Array dtype GEMM inputs are cast to (f32 for both f32 variants —
        the split-float decomposition happens inside the XLA dot, not here)."""
        return "bfloat16" if self.matmul_dtype == "bfloat16" else "float32"

    def lax_matmul_precision(self):
        """The ``jax.lax.Precision`` for update-step GEMMs under this policy."""
        import jax

        return {
            "float32": jax.lax.Precision.HIGHEST,
            "float32_fast": jax.lax.Precision.HIGH,
            "bfloat16": jax.lax.Precision.DEFAULT,
        }[self.matmul_dtype]


FP32 = Precision("float32", "float32")
BF16 = Precision("bfloat16", "float32")
BF16_FULL = Precision("bfloat16", "float32", "bfloat16")  # bf16 X storage too


@dataclasses.dataclass(frozen=True)
class SolveConfig:
    """Full solver configuration.

    Reference-compat notes:
      * ``thresh == 0`` guarantees exactly ``max_iter`` iterations — the
        determinism contract the reference's md5 regression test relies on
        (nmf.cu:11, test_output.sh).
      * ``check_every`` is the reference's ``ITER_CHECK`` (nmf.cu:9): the
        KL cost and convergence predicate are evaluated on-device every
        ``check_every`` iterations, with no host synchronisation.
    """

    max_iter: int = 200                  # nmf.cu:10  MAX_ITER
    thresh: float = 0.0                  # nmf.cu:11  CONVERGE_THRESH
    check_every: int = 25                # nmf.cu:9   ITER_CHECK
    eps: float = EPS_DEFAULT             # matrix.cu:10
    precision: Precision = FP32
    backend: str = "auto"                # "auto" | "jnp" | "pallas" | "autotune"
    track_cost: bool = True              # record cost history even if thresh==0
    # stream (iter, cost, rel_change) to the host DURING the solve, once per
    # check (restores the reference-era ITER_CHECK reporting, README.md:51-54).
    # Off by default: the zero-host-sync contract stays intact; the stream
    # uses an async jax.debug.callback, sunk via utils.metrics.set_live_handler.
    live_metrics: bool = False
    beta: float = 1.0                    # divergence family; 1.0 == reference KL
    algorithm: str = "mu"                # "mu" (reference) | "hals" (beta=2 only)
    # L1/L2 penalties on the factors (0 = reference behaviour).  The MU
    # denominators gain the penalty gradients; the reported cost includes
    # the penalty terms so thresholded convergence is on the full objective.
    l1_w: float = 0.0
    l1_h: float = 0.0
    l2_w: float = 0.0
    l2_h: float = 0.0
    # Safeguarded Nesterov-extrapolated updates (models/solver.py
    # ``_run_accel_loop``): each step runs the base update from an
    # extrapolated point  Y_k = X_k + momentum * (X_k - X_{k-1}),  and every
    # ``check_every`` block is accepted only if the (already-computed) cost
    # did not increase — else the block is redone with plain updates, which
    # restores the MU monotonicity guarantee by construction.  Measured
    # 4-6x fewer iterations to plain-MU's converged cost (benchmarks/
    # RESULTS.md).  The momentum coefficient adapts: *grow on accept (capped
    # at momentum_max), *shrink on reject.  This beats the convergence
    # behaviour the reference documented and lost (README.md:40-54, dead
    # kernels matrix.cu:505-640) rather than just restoring it.
    # Defaults validated by a hardware-independent CPU sweep over
    # {momentum0 x grow x check_every} on three problem classes (random /
    # low-rank+noise / spectrogram-like): (0.5, 1.05) is the geometric-mean
    # best at check_every=25; aggressive growth (1.1) at fine check
    # granularity can stall the random class and is not the default.
    accelerate: bool = False
    accel_momentum: float = 0.5
    accel_momentum_max: float = 0.95
    accel_grow: float = 1.05
    accel_shrink: float = 0.5

    def validate(self) -> None:
        if self.max_iter < 0:
            raise ValueError("max_iter must be >= 0")
        if self.check_every <= 0:
            raise ValueError("check_every must be >= 1")
        if self.thresh < 0:
            raise ValueError("thresh must be >= 0")
        if self.backend not in ("auto", "jnp", "pallas", "autotune"):
            raise ValueError(f"unsupported backend {self.backend!r}")
        if self.algorithm not in ("mu", "hals"):
            raise ValueError(f"unsupported algorithm {self.algorithm!r}")
        if self.algorithm == "hals" and self.beta != 2.0:
            raise ValueError("HALS minimizes the Frobenius cost: use beta=2.0")
        if self.algorithm == "hals" and self.regularized:
            raise ValueError("regularization is implemented for the MU algorithm")
        if min(self.l1_w, self.l1_h, self.l2_w, self.l2_h) < 0:
            raise ValueError("regularization strengths must be >= 0")
        if self.regularized and self.beta != 1.0:
            raise ValueError("regularization is implemented for the KL (beta=1) family")
        if self.accelerate:
            if not (0.0 <= self.accel_momentum <= self.accel_momentum_max):
                raise ValueError(
                    "need 0 <= accel_momentum <= accel_momentum_max"
                )
            if self.accel_momentum_max >= 1.0:
                raise ValueError("accel_momentum_max must be < 1")
            if self.accel_grow < 1.0:
                raise ValueError("accel_grow must be >= 1")
            if not (0.0 < self.accel_shrink <= 1.0):
                raise ValueError("accel_shrink must be in (0, 1]")
        if self.live_metrics and not (self.track_cost or self.thresh > 0):
            raise ValueError(
                "live_metrics streams the per-check cost; enable track_cost "
                "(or a nonzero thresh)"
            )
        self.precision.validate()

    @property
    def regularized(self) -> bool:
        return (self.l1_w + self.l1_h + self.l2_w + self.l2_h) > 0.0

    @property
    def num_checks(self) -> int:
        """Number of cost-check points over a full-length run."""
        return -(-self.max_iter // self.check_every) if self.max_iter else 0


def reference_preset() -> SolveConfig:
    """The reference binary's exact behaviour: 200 fixed iterations, fp32.

    (nmf.cu:9-11: ITER_CHECK 25, MAX_ITER 200, CONVERGE_THRESH 0.)
    """
    return SolveConfig(
        max_iter=200,
        thresh=0.0,
        check_every=25,
        precision=FP32,
        backend="auto",
        track_cost=True,
    )
