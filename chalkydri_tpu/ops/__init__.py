"""Compute ops: Pallas TPU kernels and supporting numerics."""
