"""Parallel execution: device meshes, sharded solve, batched solve."""
