"""Deterministic test-fixture generation, replicating the reference generator.

The reference's ``matrix_export.py:1-17`` seeds NumPy with 0 and emits
``X.bin`` (4096x350), ``W.bin`` (4096x128), ``H.bin`` (128x350) as
``struct.pack("ii", rows, cols)`` + **C-order** bytes.  The reference *reader*
then interprets that payload as column-major (nmf.cu:189), so the matrix the
CUDA program actually factorizes is the C-order byte stream reshaped in
Fortran order.  We replicate the byte stream exactly (so md5s match the
reference generator's output) and expose the *as-seen-by-the-solver* arrays
for parity testing against the bundled ``Wtest.bin``/``Htest.bin`` goldens.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, Tuple

import numpy as np

__all__ = [
    "REFERENCE_SHAPES",
    "reference_fixture_arrays",
    "write_reference_fixtures",
    "as_seen_by_solver",
    "random_nonneg",
]

# (rows, cols) as written in the file headers (matrix_export.py:5-7).
REFERENCE_SHAPES: Dict[str, Tuple[int, int]] = {
    "X": (4096, 350),
    "W": (4096, 128),
    "H": (128, 350),
}


def reference_fixture_arrays() -> Dict[str, np.ndarray]:
    """The exact arrays the reference generator creates (seed 0, C-order)."""
    rng = np.random.RandomState(0)  # legacy RandomState == np.random.seed(0)
    out = {}
    for name, (r, c) in REFERENCE_SHAPES.items():
        out[name] = rng.rand(r, c).astype(np.float32)
    return out


def as_seen_by_solver(arr: np.ndarray) -> np.ndarray:
    """Reinterpret a generator array the way the reference reader sees it.

    The generator writes C-order bytes; the reader (nmf.cu:189) treats the
    payload as column-major.  Solver-visible matrix: C-order flatten,
    Fortran-order reshape.
    """
    r, c = arr.shape
    return np.ascontiguousarray(
        arr.astype(np.float32).reshape(-1).reshape((r, c), order="F")
    )


def write_reference_fixtures(directory: str | os.PathLike) -> Dict[str, str]:
    """Write X.bin/W.bin/H.bin byte-identically to the reference generator.

    Replicates matrix_export.py:9-13: header via struct.pack("ii", *shape),
    payload via ``matrix.tobytes()`` (C order).
    """
    os.makedirs(directory, exist_ok=True)
    paths = {}
    for name, arr in reference_fixture_arrays().items():
        path = os.path.join(str(directory), f"{name}.bin")
        with open(path, "wb") as f:
            f.write(struct.pack("ii", *arr.shape))
            f.write(arr.tobytes())
        paths[name] = path
    return paths


def random_nonneg(
    shape: Tuple[int, ...],
    seed: int = 0,
    dtype: np.dtype = np.float32,
    low: float = 0.0,
    high: float = 1.0,
) -> np.ndarray:
    """Uniform non-negative random array for tests and benchmarks."""
    rng = np.random.RandomState(seed)
    return (low + (high - low) * rng.rand(*shape)).astype(dtype)
