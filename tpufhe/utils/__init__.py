"""Host-side utilities: primality, prime generation, transcoding, RNGs."""

from tpufhe.utils.primes import is_prime, generate_prime, supports_opt
from tpufhe.utils.transcode import (
    transcode_to_bytes,
    transcode_from_bytes,
    transcode_bidirectional,
)
from tpufhe.utils.sampling import sample_vec_cbd
from tpufhe.utils.misc import inverse, variance

__all__ = [
    "is_prime",
    "generate_prime",
    "supports_opt",
    "transcode_to_bytes",
    "transcode_from_bytes",
    "transcode_bidirectional",
    "sample_vec_cbd",
    "inverse",
    "variance",
]
