"""Pallas TPU kernels for the hot FHE ops (NTT, fused pointwise)."""
