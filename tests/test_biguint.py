"""Large plaintext modulus (BigUint t) end-to-end, mirroring
/root/reference/crates/fhe/tests/biguint.rs:11-206."""

import numpy as np
import pytest

from tpufhe.bfv import (
    BfvParametersBuilder,
    Encoding,
    Plaintext,
    RelinearizationKey,
    SecretKey,
    ct_add,
    ct_mul,
)
from tpufhe.utils.rngs import ChaCha8Rng, seed_from_u64

M127 = (1 << 127) - 1  # Mersenne prime, the reference's big-t choice


def parameters():
    return (
        BfvParametersBuilder()
        .set_degree(16)
        .set_plaintext_modulus(M127)
        .set_moduli_sizes([60] * 5)
        .build()
    )


def rng():
    return ChaCha8Rng(seed_from_u64(99))


def test_biguint_plaintext_encryption_decryption():
    par = parameters()
    r = rng()
    sk = SecretKey.random(par, r)

    values = [0] * par.degree()
    values[0] = 123456789
    values[1] = M127 - 1  # -1
    values[2] = M127 // 2

    pt = Plaintext.try_encode(values, Encoding.poly(), par)
    ct = sk.try_encrypt(pt, r)
    got = sk.try_decrypt(ct).try_decode(Encoding.poly())
    assert [int(v) for v in got] == values


def test_biguint_homomorphic_addition():
    par = parameters()
    r = rng()
    sk = SecretKey.random(par, r)

    vec1 = [0] * par.degree()
    vec1[0] = 10
    vec2 = [0] * par.degree()
    vec2[0] = M127 - 50  # -50

    ct1 = sk.try_encrypt(Plaintext.try_encode(vec1, Encoding.poly(), par), r)
    ct2 = sk.try_encrypt(Plaintext.try_encode(vec2, Encoding.poly(), par), r)
    got = sk.try_decrypt(ct_add(ct1, ct2)).try_decode(Encoding.poly())
    assert int(got[0]) == M127 - 40  # 10 + (-50) = -40


def test_biguint_multiplication_without_relin():
    par = parameters()
    r = rng()
    sk = SecretKey.random(par, r)

    vec1 = [0] * par.degree()
    vec1[0] = 10
    vec2 = [0] * par.degree()
    vec2[0] = M127 - 20  # -20

    ct1 = sk.try_encrypt(Plaintext.try_encode(vec1, Encoding.poly(), par), r)
    ct2 = sk.try_encrypt(Plaintext.try_encode(vec2, Encoding.poly(), par), r)
    prod = ct_mul(ct1, ct2)
    assert len(prod) == 3
    got = sk.try_decrypt(prod).try_decode(Encoding.poly())
    assert int(got[0]) == M127 - 200  # 10 * (-20) = -200


def test_small_modulus_with_biguint_input():
    par = (
        BfvParametersBuilder()
        .set_degree(16)
        .set_plaintext_modulus(1153)
        .set_moduli_sizes([62])
        .build()
    )
    r = rng()
    sk = SecretKey.random(par, r)
    values = [0] * par.degree()
    values[0] = 1153 + 5  # reduces to 5
    pt = Plaintext.try_encode_i64(values, Encoding.poly(), par)
    ct = sk.try_encrypt(pt, r)
    got = np.asarray(sk.try_decrypt(ct).try_decode(Encoding.poly()))
    assert int(got[0]) == 5
