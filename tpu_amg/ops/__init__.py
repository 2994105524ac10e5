"""Compute kernels: Pallas TPU kernels and native (C++) host kernels."""
