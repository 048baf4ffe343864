"""Model zoo: the KL-MU solver (reference parity) and extensions."""

from .solver import SolveResult, solve

__all__ = ["solve", "SolveResult"]
