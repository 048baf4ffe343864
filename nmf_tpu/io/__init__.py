"""I/O: reference-compatible .bin format, fixtures, native fast path."""

from .binio import read_matrix, write_matrix

__all__ = ["read_matrix", "write_matrix"]
