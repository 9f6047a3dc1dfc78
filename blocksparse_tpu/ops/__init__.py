"""Compute paths: XLA reference engine and Pallas TPU kernels."""
