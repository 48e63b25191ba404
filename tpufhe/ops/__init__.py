"""Compute kernels: uint32-limb modular arithmetic, NTT, RNS scaling."""
