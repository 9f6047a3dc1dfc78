"""Pallas TPU kernels for the hot block-sparse paths."""
