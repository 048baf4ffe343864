"""ctypes binding to the native C++ .bin I/O library (native/binio.cpp).

Mirrors the reference's C++ host I/O layer (nmf.cu:188-259) for the TPU
framework.  Loading is lazy and optional: if ``libnmfio.so`` has not been
built (``make -C native``) every entry point reports unavailable and callers
fall back to the pure-NumPy implementation in :mod:`nmf_tpu.io.binio`.

Search order for the shared library:
  1. ``NMF_TPU_NATIVE_LIB`` environment variable (full path)
  2. ``<repo>/native/libnmfio.so`` (the in-tree build location)
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional

import numpy as np

__all__ = [
    "available",
    "load",
    "read_matrix_native",
    "write_matrix_native",
    "has_read_columns",
    "read_columns_native",
]

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_ERRORS = {
    -1: "cannot open file",
    -2: "short read",
    -3: "short write",
    -4: "truncated header",
    -5: "file smaller than header claims / allocation failure",
}


def _candidate_paths():
    env = os.environ.get("NMF_TPU_NATIVE_LIB")
    if env:
        yield env
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    yield os.path.join(here, "native", "libnmfio.so")


def load() -> Optional[ctypes.CDLL]:
    """Load (once) and return the native library, or None if unavailable.

    An explicitly set ``NMF_TPU_NATIVE_LIB`` that fails to load or has the
    wrong ABI raises instead of silently falling through to another library
    — the user would otherwise benchmark a different binary than the one
    they configured.
    """
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        env = os.environ.get("NMF_TPU_NATIVE_LIB")
        for path in _candidate_paths():
            explicit = env is not None and path == env
            if not os.path.exists(path):
                if explicit:
                    # un-latch so EVERY call stays loud (a caller catching
                    # the first raise must not silently get the fallback
                    # library on the next read)
                    _tried = False
                    raise FileNotFoundError(
                        f"NMF_TPU_NATIVE_LIB={path!r} does not exist"
                    )
                continue
            try:
                lib = ctypes.CDLL(path)
                lib.nmf_native_abi_version.restype = ctypes.c_int
                if lib.nmf_native_abi_version() != 1:
                    if explicit:
                        _tried = False  # stay loud on every call
                        raise RuntimeError(
                            f"NMF_TPU_NATIVE_LIB={path!r} reports ABI "
                            f"version {lib.nmf_native_abi_version()}, "
                            f"this build needs 1 — rebuild with "
                            f"`make -C native`"
                        )
                    continue
                lib.nmf_read_header.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_uint32),
                    ctypes.POINTER(ctypes.c_uint32),
                ]
                lib.nmf_read_header.restype = ctypes.c_int
                lib.nmf_read_matrix.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_uint32,
                    ctypes.c_uint32,
                    ctypes.c_int,
                ]
                lib.nmf_read_matrix.restype = ctypes.c_int
                lib.nmf_write_matrix.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_uint32,
                    ctypes.c_uint32,
                    ctypes.c_int,
                ]
                lib.nmf_write_matrix.restype = ctypes.c_int
                # column-block reader: present in builds newer than round 1
                # (older libraries still load; callers probe has_read_columns)
                if hasattr(lib, "nmf_read_columns"):
                    lib.nmf_read_columns.argtypes = [
                        ctypes.c_char_p,
                        ctypes.POINTER(ctypes.c_float),
                        ctypes.c_uint32,
                        ctypes.c_uint32,
                        ctypes.c_uint32,
                        ctypes.c_uint32,
                        ctypes.c_int,
                    ]
                    lib.nmf_read_columns.restype = ctypes.c_int
                _lib = lib
                break
            except (OSError, AttributeError) as e:
                # AttributeError: a foreign .so without the ABI symbol must
                # fall back to the NumPy path, not crash every .bin read
                if explicit:
                    _tried = False  # stay loud on every call
                    raise RuntimeError(
                        f"NMF_TPU_NATIVE_LIB={path!r} failed to load: {e}"
                    ) from e
                continue
        return _lib


def available() -> bool:
    return load() is not None


def _check(rc: int, path: str, op: str) -> None:
    if rc != 0:
        raise ValueError(
            f"native {op} failed for {path}: {_ERRORS.get(rc, f'error {rc}')}"
        )


def read_matrix_native(path: str) -> np.ndarray:
    """Native read: returns (rows, cols) float32, C-contiguous.

    Semantically identical to :func:`nmf_tpu.io.binio.read_matrix`.
    """
    lib = load()
    if lib is None:
        raise RuntimeError("native binio library not available")
    rows = ctypes.c_uint32()
    cols = ctypes.c_uint32()
    p = os.fspath(path).encode()
    _check(lib.nmf_read_header(p, ctypes.byref(rows), ctypes.byref(cols)), path, "header read")
    out = np.empty((rows.value, cols.value), dtype=np.float32)
    _check(
        lib.nmf_read_matrix(
            p,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rows,
            cols,
            1,
        ),
        path,
        "read",
    )
    return out


def has_read_columns() -> bool:
    lib = load()
    return lib is not None and hasattr(lib, "nmf_read_columns")


def read_columns_native(
    path: str, rows: int, cols: int, j0: int, j1: int
) -> np.ndarray:
    """Native column-block read: (rows, j1-j0) float32, C-contiguous.

    One bulk pread of the contiguous column span — the out-of-core streaming
    solver's host read stage (models/streaming.py).
    """
    lib = load()
    if lib is None or not hasattr(lib, "nmf_read_columns"):
        raise RuntimeError("native column reader not available")
    out = np.empty((rows, j1 - j0), dtype=np.float32)
    _check(
        lib.nmf_read_columns(
            os.fspath(path).encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rows,
            cols,
            j0,
            j1,
            1,
        ),
        path,
        "column read",
    )
    return out


def write_matrix_native(arr: np.ndarray, path: str) -> None:
    """Native write; semantically identical to binio.write_matrix."""
    lib = load()
    if lib is None:
        raise RuntimeError("native binio library not available")
    arr = np.ascontiguousarray(np.asarray(arr, dtype=np.float32))
    if arr.ndim != 2:
        raise ValueError(f".bin format is 2-D only, got shape {arr.shape}")
    rows, cols = arr.shape
    _check(
        lib.nmf_write_matrix(
            os.fspath(path).encode(),
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rows,
            cols,
            1,
        ),
        path,
        "write",
    )
