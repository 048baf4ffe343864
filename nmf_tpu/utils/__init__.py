"""Utilities: config, logging/metrics, checkpointing, profiling."""

from .config import Precision, SolveConfig, reference_preset

__all__ = ["Precision", "SolveConfig", "reference_preset"]
