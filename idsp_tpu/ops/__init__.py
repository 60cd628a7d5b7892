"""Elementwise/LUT scalar kernels (reference L2), vectorized for the VPU."""
