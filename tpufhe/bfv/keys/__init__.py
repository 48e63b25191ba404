from tpufhe.bfv.keys.secret_key import SecretKey
from tpufhe.bfv.keys.public_key import PublicKey
from tpufhe.bfv.keys.key_switching_key import KeySwitchingKey
from tpufhe.bfv.keys.relinearization_key import RelinearizationKey
from tpufhe.bfv.keys.galois_key import GaloisKey
from tpufhe.bfv.keys.evaluation_key import EvaluationKey, EvaluationKeyBuilder

__all__ = [
    "SecretKey",
    "PublicKey",
    "KeySwitchingKey",
    "RelinearizationKey",
    "GaloisKey",
    "EvaluationKey",
    "EvaluationKeyBuilder",
]
