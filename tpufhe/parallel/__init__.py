"""Mesh sharding for BFV workloads (batch + RNS-limb axes).

The reference is single-threaded (SURVEY.md section 2.9); parallelism here is
a TPU-native addition constrained only by bit-exactness. Two natural axes:

- `batch`: independent ciphertexts — pure data parallelism, no collectives;
- `limb`: the RNS limb axis — element-wise limb ops and per-limb NTTs are
  local; base extension / key-switch inner products reduce across limbs,
  for which GSPMD inserts all-gathers/psums from the sharding annotations.
"""

from tpufhe.parallel.sharding import (
    batch_limb_mesh,
    ct_sharding,
    shard_ciphertext,
    make_sharded_mul_relin,
)

__all__ = [
    "batch_limb_mesh",
    "ct_sharding",
    "shard_ciphertext",
    "make_sharded_mul_relin",
]
