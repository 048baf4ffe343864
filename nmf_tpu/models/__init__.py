"""Model zoo: the KL-MU solver (reference parity), estimator API, extensions."""

from .init import nndsvd_init, random_init, scaled_random_init
from .masked import solve_masked_h_only
from .nmf import NMF, solve_h_only, solve_w_only
from .online import OnlineResult, solve_online
from .semi import solve_semi
from .streaming import TransformResult, solve_out_of_core, transform_out_of_core
from .strict import solve_strict
from .sparse import SparseX, solve_sparse, sparse_from_dense
from .sparse_tiled import (
    TileSparseX,
    solve_sparse_tiled,
    tiles_from_coo,
    tiles_from_dense,
)
from .selection import SelectionResult, solve_rank_sweep, solve_restarts
from .stability import StabilityResult, consensus_matrix, rank_stability
from .separation import SeparationResult, istft, separate, stft
from .solver import SolveResult, solve

__all__ = [
    "solve",
    "SolveResult",
    "NMF",
    "solve_h_only",
    "solve_w_only",
    "solve_masked_h_only",
    "solve_online",
    "solve_semi",
    "OnlineResult",
    "solve_out_of_core",
    "transform_out_of_core",
    "TransformResult",
    "solve_strict",
    "solve_sparse",
    "SparseX",
    "sparse_from_dense",
    "solve_sparse_tiled",
    "TileSparseX",
    "tiles_from_coo",
    "tiles_from_dense",
    "solve_restarts",
    "solve_rank_sweep",
    "SelectionResult",
    "rank_stability",
    "consensus_matrix",
    "StabilityResult",
    "random_init",
    "scaled_random_init",
    "nndsvd_init",
    "separate",
    "SeparationResult",
    "stft",
    "istft",
]
