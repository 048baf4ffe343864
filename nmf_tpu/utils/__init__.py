"""Utilities: config, logging/metrics, checkpointing, profiling, guards."""

from .config import Precision, SolveConfig, reference_preset
from .checkpoint import (
    CheckpointState,
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
    solve_with_checkpoints,
)
from .guards import GuardError, validate_input, validate_result
from .metrics import MetricsLogger, RunReport

__all__ = [
    "Precision",
    "SolveConfig",
    "reference_preset",
    "CheckpointState",
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint",
    "solve_with_checkpoints",
    "MetricsLogger",
    "RunReport",
    "GuardError",
    "validate_input",
    "validate_result",
]
