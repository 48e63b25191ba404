"""Multiparty (threshold) BFV, after Mouchet et al. eprint 2020/304.

Behavioral parity with fhe/src/mbfv/: share types for the EncKeyGen,
RelinKeyGen (2 rounds), KeySwitch, Decryption and PubKeySwitch protocols,
aggregated by summation. On a device mesh, aggregation maps onto `psum`
over a parties axis (see tpufhe.parallel).
"""

from tpufhe.mbfv.protocols import (
    CommonRandomPoly,
    DecryptionShare,
    PublicKeyShare,
    PublicKeySwitchShare,
    RelinKeyGenerator,
    RelinKeyShare,
    SecretKeySwitchShare,
    aggregate,
)

__all__ = [
    "CommonRandomPoly",
    "PublicKeyShare",
    "RelinKeyGenerator",
    "RelinKeyShare",
    "SecretKeySwitchShare",
    "DecryptionShare",
    "PublicKeySwitchShare",
    "aggregate",
]
