"""Literal byte fixtures for the coefficient bit-packing (VERDICT r2 item 6).

tests/test_wire_compat.py proves the proto3 ENVELOPE against the official
protobuf runtime, but both directions of that test share the repo's own
transcode for the `bytes` payloads — a self-consistently wrong packing
would pass. These fixtures pin the packing itself with constants derived
INDEPENDENTLY of tpufhe.utils.transcode, from the algorithm's spec
(/root/reference/crates/fhe-util/src/lib.rs:60-134: values are packed
LSB-first, nbits each, bytes emitted from the low end — i.e. the byte
stream is the little-endian expansion of V = sum_i (c_i << (nbits*i))):

  >>> V = sum(i << (13*i) for i in range(16)); list(V.to_bytes(26, "little"))

The modulus-level serialize_vec/serialization_length wrappers follow
zq/mod.rs:773-793 (nbits = bit length of p-1).
"""

import numpy as np

from tpufhe.ops.zq import Modulus
from tpufhe.utils.transcode import transcode_from_bytes, transcode_to_bytes

# degree 16, nbits=13, coefficients 0..15
FIX_13_ASC = bytes([
    0, 32, 0, 8, 128, 1, 64, 0, 10, 128, 1, 56, 0,
    8, 32, 1, 40, 128, 5, 192, 0, 26, 128, 3, 120, 0,
])
# degree 16, nbits=13, coefficients 4096+i (top bit of every value set)
FIX_13_HI = bytes([
    0, 48, 0, 10, 192, 1, 72, 0, 11, 160, 1, 60, 128,
    8, 48, 1, 42, 192, 5, 200, 0, 27, 160, 3, 124, 128,
])
# degree 8, nbits=30, coefficients 2^29+i (crosses every byte boundary class)
FIX_30_HI = bytes([
    0, 0, 0, 96, 0, 0, 0, 40, 0, 0, 0, 14, 0, 0, 128,
    4, 0, 0, 96, 1, 0, 0, 104, 0, 0, 0, 30, 0, 0, 128,
])


def test_transcode_13bit_ascending():
    assert transcode_to_bytes(list(range(16)), 13) == FIX_13_ASC
    np.testing.assert_array_equal(
        transcode_from_bytes(FIX_13_ASC, 13), np.arange(16, dtype=np.uint64)
    )


def test_transcode_13bit_high_bit():
    vals = [4096 + i for i in range(16)]
    assert transcode_to_bytes(vals, 13) == FIX_13_HI
    np.testing.assert_array_equal(
        transcode_from_bytes(FIX_13_HI, 13),
        np.array(vals, dtype=np.uint64),
    )


def test_transcode_30bit_high_bit():
    vals = [(1 << 29) + i for i in range(8)]
    assert transcode_to_bytes(vals, 30) == FIX_30_HI
    np.testing.assert_array_equal(
        transcode_from_bytes(FIX_30_HI, 30),
        np.array(vals, dtype=np.uint64),
    )


def test_modulus_serialize_vec_uses_p_minus_1_bits():
    # p = 8161 (13-bit prime, = 1 mod 32): serialization_length must use
    # bitlen(p-1) = 13 and serialize_vec must emit exactly FIX_13_ASC.
    q = Modulus(8161)
    assert q.serialization_length(16) == 26
    assert bytes(q.serialize_vec(np.arange(16, dtype=np.uint64))) == FIX_13_ASC
    np.testing.assert_array_equal(
        q.deserialize_vec(FIX_13_ASC), np.arange(16, dtype=np.uint64)
    )
