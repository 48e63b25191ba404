"""tpufhe — a TPU-native RNS-BFV homomorphic encryption framework.

Built from scratch in JAX/XLA/Pallas with the capability surface of the
fhe.rs reference library: leveled HPS RNS-BFV (encrypt/decrypt, homomorphic
add/mul, relinearization, Galois key-switching, SIMD batching, RGSW external
products) plus the multiparty BFV protocols of Mouchet et al.

All modular arithmetic runs on 32-bit integer lanes (uint32 limb pairs) —
the natural word size of the TPU vector unit — with batch-of-ciphertexts as
the primary vectorization axis and RNS limbs / batches sharded over device
meshes via jax.sharding.
"""

__version__ = "0.1.0"
