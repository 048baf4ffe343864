"""Parallel execution: device meshes, sharded solve, batched solve."""

from .batched import solve_batched
from .mesh import COL_AXIS, ROW_AXIS, make_mesh, nmf_shardings, shard_problem
from .sharded import mu_step_sharded, solve_sharded

__all__ = [
    "ROW_AXIS",
    "COL_AXIS",
    "make_mesh",
    "nmf_shardings",
    "shard_problem",
    "solve_sharded",
    "solve_batched",
    "mu_step_sharded",
]
