"""Native C++ binio tests: byte-identical to the pure-NumPy implementation.

Builds native/libnmfio.so via make if a toolchain is present; skips cleanly
otherwise.
"""

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "native", "libnmfio.so")


@pytest.fixture(scope="module")
def native_mod():
    if not os.path.exists(LIB):
        if shutil.which("make") is None or shutil.which("g++") is None:
            pytest.skip("no native toolchain")
        subprocess.run(
            ["make", "-C", os.path.join(REPO, "native")], check=True,
            capture_output=True,
        )
    from nmf_tpu.io import native

    if not native.available():
        pytest.skip("native library failed to load")
    return native


def _py_write(arr, path):
    """Pure-Python writer (bypasses the native delegation in binio)."""
    rows, cols = arr.shape
    with open(path, "wb") as f:
        f.write(struct.pack("<II", rows, cols))
        f.write(np.asfortranarray(arr.astype("<f4")).tobytes(order="F"))


def test_native_read_matches_python(native_mod, tmp_path, rng):
    a = rng.rand(123, 77).astype(np.float32)
    p = str(tmp_path / "a.bin")
    _py_write(a, p)
    out = native_mod.read_matrix_native(p)
    np.testing.assert_array_equal(out, a)
    assert out.flags.c_contiguous


def test_native_write_matches_python(native_mod, tmp_path, rng):
    a = rng.rand(64, 200).astype(np.float32)
    p_nat = str(tmp_path / "n.bin")
    p_py = str(tmp_path / "p.bin")
    native_mod.write_matrix_native(a, p_nat)
    _py_write(a, p_py)
    assert open(p_nat, "rb").read() == open(p_py, "rb").read()


@pytest.mark.parametrize("shape", [(1, 7), (7, 1), (1, 1), (65, 129), (64, 64)])
def test_native_roundtrip_shapes(native_mod, tmp_path, rng, shape):
    a = rng.rand(*shape).astype(np.float32)
    p = str(tmp_path / "r.bin")
    native_mod.write_matrix_native(a, p)
    np.testing.assert_array_equal(native_mod.read_matrix_native(p), a)


def test_native_errors(native_mod, tmp_path):
    with pytest.raises(ValueError):
        native_mod.read_matrix_native(str(tmp_path / "missing.bin"))
    short = tmp_path / "short.bin"
    short.write_bytes(struct.pack("<II", 100, 100) + b"\0" * 16)
    with pytest.raises(ValueError):
        native_mod.read_matrix_native(str(short))


def test_binio_delegates_to_native(native_mod, tmp_path, rng, monkeypatch):
    """binio.read_matrix/write_matrix use the native path when available."""
    from nmf_tpu.io import binio

    a = rng.rand(33, 44).astype(np.float32)
    p = str(tmp_path / "d.bin")
    binio.write_matrix(a, p)
    np.testing.assert_array_equal(binio.read_matrix(p), a)
    # and the kill switch works
    monkeypatch.setenv("NMF_TPU_NO_NATIVE", "1")
    np.testing.assert_array_equal(binio.read_matrix(p), a)


def test_native_read_columns_matches_python(native_mod, tmp_path, rng):
    """The streaming loader's native fast path: exact column-block reads."""
    if not native_mod.has_read_columns():
        pytest.skip("library built without nmf_read_columns")
    a = rng.rand(123, 500).astype(np.float32)
    p = str(tmp_path / "cols.bin")
    _py_write(a, p)
    np.testing.assert_array_equal(
        native_mod.read_columns_native(p, 123, 500, 0, 128), a[:, :128]
    )
    np.testing.assert_array_equal(
        native_mod.read_columns_native(p, 123, 500, 437, 500), a[:, 437:500]
    )
    np.testing.assert_array_equal(
        native_mod.read_columns_native(p, 123, 500, 7, 8), a[:, 7:8]
    )
    # out-of-range block is refused
    with pytest.raises(ValueError):
        native_mod.read_columns_native(p, 123, 500, 400, 501)


def test_streaming_source_uses_native_reader(native_mod, tmp_path, rng):
    """BinColumnSource delegates to the native reader and agrees with the
    NumPy fallback bit-for-bit."""
    from nmf_tpu.models.streaming import BinColumnSource

    if not native_mod.has_read_columns():
        pytest.skip("library built without nmf_read_columns")
    a = rng.rand(96, 300).astype(np.float32)
    p = str(tmp_path / "src.bin")
    _py_write(a, p)
    src = BinColumnSource(p)
    via_native = src.columns(100, 260)
    os.environ["NMF_TPU_NO_NATIVE"] = "1"
    try:
        via_python = src.columns(100, 260)
    finally:
        del os.environ["NMF_TPU_NO_NATIVE"]
    np.testing.assert_array_equal(via_native, via_python)
    np.testing.assert_array_equal(via_native, a[:, 100:260])


def test_explicit_native_lib_env_fails_loud(tmp_path, monkeypatch):
    """A user-configured NMF_TPU_NATIVE_LIB that cannot be used must error,
    never silently fall back to a different library."""
    from nmf_tpu.io import native

    def fresh():
        monkeypatch.setattr(native, "_tried", False)
        monkeypatch.setattr(native, "_lib", None)

    fresh()
    monkeypatch.setenv("NMF_TPU_NATIVE_LIB", str(tmp_path / "nope.so"))
    with pytest.raises(FileNotFoundError, match="NMF_TPU_NATIVE_LIB"):
        native.load()
    # a file that is not a loadable library with the ABI symbol
    bogus = tmp_path / "bogus.so"
    bogus.write_bytes(b"not a library")
    fresh()
    monkeypatch.setenv("NMF_TPU_NATIVE_LIB", str(bogus))
    with pytest.raises(RuntimeError, match="failed to load"):
        native.load()
    # unset env: the failure path must leave the NumPy fallback working
    fresh()
    monkeypatch.delenv("NMF_TPU_NATIVE_LIB")
    native.load()  # whatever it returns, it must not raise
    fresh()


def test_explicit_native_lib_stays_loud(tmp_path, monkeypatch):
    """The explicit-env failure must fire on EVERY call — a caller catching
    the first raise must not silently get the fallback on the next read."""
    from nmf_tpu.io import native

    monkeypatch.setattr(native, "_tried", False)
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setenv("NMF_TPU_NATIVE_LIB", str(tmp_path / "gone.so"))
    for _ in range(2):
        with pytest.raises(FileNotFoundError):
            native.load()
    monkeypatch.setattr(native, "_tried", False)
