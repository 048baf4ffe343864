"""Binary ``.bin`` matrix format, byte-compatible with the reference.

Format (reference ``cuda/nmf.cu:188-259``):

    u32 rows | u32 cols | rows*cols float32 payload, **column-major**

The reference reader (``read_matrix``, nmf.cu:189) interprets the payload as
column-major; the reference writer (``write_matrix``, nmf.cu:220-259) emits
column-major after de-padding.  We replicate both exactly so that files are
interchangeable between the CUDA reference and this framework.

Note the fixture-generator quirk (reference ``matrix_export.py:9-13``): the
bundled Python generator writes *C-order* bytes, which the column-major reader
reinterprets.  See :mod:`nmf_tpu.io.fixtures` for the faithful replication.

A native C++ fast path lives in :mod:`nmf_tpu.io.native`; this module is the
pure-NumPy reference implementation and the fallback.
"""

from __future__ import annotations

import os
import struct
from typing import BinaryIO, Tuple, Union

import numpy as np

__all__ = [
    "read_matrix",
    "write_matrix",
    "read_header",
    "pack_header",
    "MAGICLESS_HEADER_BYTES",
]

# Two little-endian uint32s: rows, cols.  (The reference uses native-endian
# fread on x86, i.e. little-endian; struct.pack("ii") in matrix_export.py
# likewise.  We pin little-endian for portability.)
_HEADER = struct.Struct("<II")
MAGICLESS_HEADER_BYTES = _HEADER.size  # 8


def pack_header(rows: int, cols: int) -> bytes:
    """The 8-byte (rows, cols) header — for streaming writers that append
    the payload themselves (serving.stream_bin); write_matrix covers the
    whole-array case."""
    return _HEADER.pack(rows, cols)


def read_header(f: BinaryIO) -> Tuple[int, int]:
    """Read the (rows, cols) header from an open binary stream."""
    raw = f.read(_HEADER.size)
    if len(raw) != _HEADER.size:
        raise ValueError("truncated .bin header")
    rows, cols = _HEADER.unpack(raw)
    return rows, cols


def _native():
    """The native C++ fast path, or None (env NMF_TPU_NO_NATIVE=1 disables)."""
    if os.environ.get("NMF_TPU_NO_NATIVE") == "1":
        return None
    from . import native

    return native if native.available() else None


def read_matrix(path: Union[str, os.PathLike]) -> np.ndarray:
    """Read a ``.bin`` matrix exactly as the reference reader does.

    Returns a ``(rows, cols)`` float32 array whose logical element ``[i, j]``
    is payload word ``i + j*rows`` (column-major), matching
    ``cuda/nmf.cu:189`` ("store in column-major order").

    The returned array is C-contiguous (we copy out of the Fortran view) so
    that downstream jnp conversion is layout-predictable.  Delegates to the
    native C++ reader (nmf_tpu.io.native) when the library is built.
    """
    if not os.path.exists(path):
        # the native reader would report this as an opaque "cannot open
        # file" ValueError; a missing path deserves the standard error
        raise FileNotFoundError(2, "no such .bin file", os.fspath(path))
    nat = _native()
    if nat is not None:
        return nat.read_matrix_native(os.fspath(path))
    with open(path, "rb") as f:
        rows, cols = read_header(f)
        count = rows * cols
        payload = np.fromfile(f, dtype="<f4", count=count)
    if payload.size != count:
        raise ValueError(
            f"truncated .bin payload in {path}: expected {count} f32 words, "
            f"got {payload.size}"
        )
    return np.ascontiguousarray(payload.reshape((rows, cols), order="F"))


def write_matrix(arr: np.ndarray, path: Union[str, os.PathLike]) -> None:
    """Write a matrix in the reference ``.bin`` format (column-major payload).

    Byte-compatible with ``write_matrix`` at ``cuda/nmf.cu:220-259``.
    """
    arr = np.asarray(arr)
    if arr.ndim != 2:
        raise ValueError(f".bin format is 2-D only, got shape {arr.shape}")
    arr = arr.astype("<f4", copy=False)
    nat = _native()
    if nat is not None:
        nat.write_matrix_native(arr, os.fspath(path))
        return
    rows, cols = arr.shape
    with open(path, "wb") as f:
        f.write(_HEADER.pack(rows, cols))
        # tobytes(order="F") does the strided transpose in ONE copy;
        # asfortranarray first would make a second full copy of the matrix
        f.write(arr.tobytes(order="F"))
