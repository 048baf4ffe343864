"""nmf_tpu — a TPU-native non-negative matrix factorization framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the reference
CUDA library (``recoord/nmf-gpu``): KL-divergence Lee-Seung multiplicative
updates, byte-compatible ``.bin`` I/O, fixed-iteration determinism — plus the
things the reference lacked: convergence checking, batched (vmap) and
mesh-sharded (shard_map) execution, out-of-core and online streaming,
masked/penalized/HALS/beta-divergence/semi-adaptive model families, model
selection (restarts, rank sweeps, consensus stability), checkpoint/resume,
metrics, and a CLI.  See docs/MATRIX.md for the full family x mode map.

Quick start::

    import nmf_tpu as nt
    res = nt.solve(X, W0, H0, nt.SolveConfig(max_iter=200))
    nt.write_matrix(np.asarray(res.w), "Wout.bin")
"""

from .io.binio import read_matrix, write_matrix
from .io import fixtures
from .io.dataset import BinDataset
from .ops.elementwise import EPS, eps_clamp
from .ops.divergence import beta_divergence, euclidean_cost, itakura_saito, kl_divergence
from .ops.mu import mu_step, mu_step_beta, update_h, update_w
from .models.solver import SolveResult, solve
from .models.nmf import NMF, normalize_factors, solve_h_only, solve_w_only
from .models.online import OnlineResult, solve_online
from .models.semi import solve_semi
from .models.separation import separate
from .models.masked import solve_masked, solve_masked_h_only
from .models.streaming import TransformResult, solve_out_of_core, transform_out_of_core
from .models.strict import solve_strict
from .models.init import nndsvd_init, random_init, scaled_random_init
from .models.selection import SelectionResult, solve_rank_sweep, solve_restarts
from .models.stability import StabilityResult, consensus_matrix, rank_stability
from .models.sparse import SparseX, solve_sparse, sparse_from_dense
from .models.sparse_tiled import (
    TileSparseX,
    solve_sparse_tiled,
    solve_sparse_tiled_batched,
    tiles_from_coo,
    tiles_from_dense,
)
from .parallel import make_mesh, solve_batched, solve_sharded
from .serving import (
    ServingResult,
    ServingTransform,
    export_transform,
    load_transform,
    save_transform,
)
from .utils.config import Precision, SolveConfig, reference_preset

__version__ = "0.3.0"

__all__ = [
    "read_matrix",
    "write_matrix",
    "fixtures",
    "BinDataset",
    "EPS",
    "eps_clamp",
    "kl_divergence",
    "euclidean_cost",
    "itakura_saito",
    "beta_divergence",
    "mu_step",
    "mu_step_beta",
    "update_h",
    "update_w",
    "solve",
    "solve_h_only",
    "solve_w_only",
    "normalize_factors",
    "solve_online",
    "solve_semi",
    "OnlineResult",
    "NMF",
    "separate",
    "solve_masked",
    "solve_masked_h_only",
    "solve_out_of_core",
    "transform_out_of_core",
    "TransformResult",
    "solve_strict",
    "solve_restarts",
    "solve_rank_sweep",
    "SelectionResult",
    "rank_stability",
    "consensus_matrix",
    "StabilityResult",
    "random_init",
    "scaled_random_init",
    "nndsvd_init",
    "solve_sparse",
    "SparseX",
    "sparse_from_dense",
    "solve_sparse_tiled",
    "solve_sparse_tiled_batched",
    "TileSparseX",
    "tiles_from_coo",
    "tiles_from_dense",
    "solve_sharded",
    "solve_batched",
    "make_mesh",
    "export_transform",
    "save_transform",
    "load_transform",
    "ServingTransform",
    "ServingResult",
    "SolveResult",
    "SolveConfig",
    "Precision",
    "reference_preset",
    "__version__",
]
