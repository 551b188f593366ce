"""Compute ops: NumPy golden oracle, XLA backend, and Pallas TPU kernels."""
