"""Pallas TPU kernels: the fused, HBM-round-trip-free hot path."""
