"""I/O tests: .bin byte compatibility, roundtrips, fixture replication."""

import hashlib
import os
import struct

import numpy as np
import pytest

from nmf_tpu.io import binio, fixtures

from conftest import requires_reference

REFERENCE_DIR = "/root/reference"


def test_roundtrip_bitexact(tmp_path, rng):
    a = rng.rand(37, 53).astype(np.float32)
    p = tmp_path / "a.bin"
    binio.write_matrix(a, p)
    b = binio.read_matrix(p)
    assert b.shape == a.shape
    np.testing.assert_array_equal(a, b)
    # write(read(f)) == f bitwise (SURVEY.md section 7 step 1 property)
    p2 = tmp_path / "a2.bin"
    binio.write_matrix(b, p2)
    assert p.read_bytes() == p2.read_bytes()


def test_header_layout(tmp_path):
    a = np.arange(6, dtype=np.float32).reshape(2, 3)
    p = tmp_path / "h.bin"
    binio.write_matrix(a, p)
    raw = p.read_bytes()
    rows, cols = struct.unpack("<II", raw[:8])
    assert (rows, cols) == (2, 3)
    # column-major payload: a[:,0], a[:,1], a[:,2]
    payload = np.frombuffer(raw[8:], dtype="<f4")
    np.testing.assert_array_equal(payload, [0.0, 3.0, 1.0, 4.0, 2.0, 5.0])


@requires_reference
def test_reads_reference_goldens():
    """Golden Wtest/Htest files parse to the documented shapes (SURVEY.md 0)."""
    w = binio.read_matrix(os.path.join(REFERENCE_DIR, "Wtest.bin"))
    h = binio.read_matrix(os.path.join(REFERENCE_DIR, "Htest.bin"))
    assert w.shape == (4096, 128)
    assert h.shape == (128, 350)
    assert np.all(np.isfinite(w)) and np.all(np.isfinite(h))
    assert float(w.min()) >= 0.0 and float(h.min()) >= 0.0


def test_fixture_bytes_match_reference_generator(tmp_path):
    """Our generator reproduces matrix_export.py's byte stream exactly."""
    paths = fixtures.write_reference_fixtures(tmp_path)
    # Independently re-derive the reference generator's bytes.
    np.random.seed(0)
    expect = {
        "X": np.random.rand(4096, 350).astype(np.float32),
        "W": np.random.rand(4096, 128).astype(np.float32),
        "H": np.random.rand(128, 350).astype(np.float32),
    }
    for name, arr in expect.items():
        raw = struct.pack("ii", *arr.shape) + arr.tobytes()
        ours = open(paths[name], "rb").read()
        assert hashlib.md5(ours).hexdigest() == hashlib.md5(raw).hexdigest()


def test_as_seen_by_solver_matches_cuda_reader(tmp_path):
    """read_matrix(generator file) == as_seen_by_solver(generator array)."""
    paths = fixtures.write_reference_fixtures(tmp_path)
    arrays = fixtures.reference_fixture_arrays()
    for name in ("X", "W", "H"):
        via_reader = binio.read_matrix(paths[name])
        via_helper = fixtures.as_seen_by_solver(arrays[name])
        np.testing.assert_array_equal(via_reader, via_helper)


def test_write_rejects_non_2d(tmp_path):
    with pytest.raises(ValueError):
        binio.write_matrix(np.zeros((2, 2, 2), np.float32), tmp_path / "x.bin")


def test_truncated_file_raises(tmp_path):
    p = tmp_path / "t.bin"
    p.write_bytes(struct.pack("<II", 4, 4) + b"\x00" * 8)  # too short
    with pytest.raises(ValueError):
        binio.read_matrix(p)


# ---------------------------------------------------------------------------
# BinDataset (parallel batch loading)
# ---------------------------------------------------------------------------


def test_dataset_load_batch(tmp_path, rng):
    from nmf_tpu.io.dataset import BinDataset

    mats = [rng.rand(33, 45).astype(np.float32) for _ in range(7)]
    for i, m in enumerate(mats):
        binio.write_matrix(m, tmp_path / f"spec_{i:03d}.bin")
    ds = BinDataset(tmp_path)
    assert len(ds) == 7 and ds.shape == (33, 45)
    batch = ds.load_batch()
    assert batch.shape == (7, 33, 45)
    for i, m in enumerate(mats):
        np.testing.assert_array_equal(batch[i], m)
    sub = ds.load_batch([5, 1])
    np.testing.assert_array_equal(sub[0], mats[5])
    np.testing.assert_array_equal(sub[1], mats[1])


def test_dataset_iter_batches(tmp_path, rng):
    from nmf_tpu.io.dataset import BinDataset

    for i in range(5):
        binio.write_matrix(rng.rand(8, 8).astype(np.float32), tmp_path / f"{i}.bin")
    ds = BinDataset(tmp_path)
    sizes = [b.shape[0] for b in ds.iter_batches(2)]
    assert sizes == [2, 2, 1]
    sizes = [b.shape[0] for b in ds.iter_batches(2, drop_remainder=True)]
    assert sizes == [2, 2]


def test_dataset_shape_mismatch(tmp_path, rng):
    from nmf_tpu.io.dataset import BinDataset

    binio.write_matrix(rng.rand(8, 8).astype(np.float32), tmp_path / "a.bin")
    binio.write_matrix(rng.rand(9, 8).astype(np.float32), tmp_path / "b.bin")
    ds = BinDataset(tmp_path)
    with pytest.raises(ValueError, match="shape"):
        ds.load_batch()


def test_dataset_empty_dir(tmp_path):
    from nmf_tpu.io.dataset import BinDataset

    with pytest.raises(ValueError, match="no .bin files"):
        BinDataset(tmp_path)
