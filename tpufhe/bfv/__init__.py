"""The BFV scheme: parameters, plaintexts, ciphertexts, keys, operations."""

from tpufhe.bfv.parameters import (
    BfvParameters,
    BfvParametersBuilder,
    PlaintextModulus,
)
from tpufhe.bfv.encoding import Encoding
from tpufhe.bfv.plaintext import Plaintext, PlaintextVec
from tpufhe.bfv.ciphertext import Ciphertext
from tpufhe.bfv.keys import (
    EvaluationKey,
    EvaluationKeyBuilder,
    GaloisKey,
    KeySwitchingKey,
    PublicKey,
    RelinearizationKey,
    SecretKey,
)
from tpufhe.bfv.ops import (
    Multiplicator,
    ct_add,
    ct_add_pt,
    ct_mul,
    ct_mul_pt,
    ct_square,
    ct_neg,
    ct_sub,
    ct_sub_pt,
    dot_product_scalar,
)
from tpufhe.bfv.rgsw import RGSWCiphertext

__all__ = [
    "BfvParameters",
    "BfvParametersBuilder",
    "PlaintextModulus",
    "Encoding",
    "Plaintext",
    "PlaintextVec",
    "Ciphertext",
    "SecretKey",
    "PublicKey",
    "KeySwitchingKey",
    "RelinearizationKey",
    "GaloisKey",
    "EvaluationKey",
    "EvaluationKeyBuilder",
    "Multiplicator",
    "RGSWCiphertext",
    "ct_add",
    "ct_sub",
    "ct_neg",
    "ct_add_pt",
    "ct_sub_pt",
    "ct_mul",
    "ct_mul_pt",
    "ct_square",
    "dot_product_scalar",
]
