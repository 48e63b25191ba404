"""Round-trip serialization tests for all objects (wire-format layer)."""

import numpy as np
import pytest

from tpufhe.bfv import (
    BfvParameters,
    Encoding,
    EvaluationKeyBuilder,
    Plaintext,
    PublicKey,
    RGSWCiphertext,
    RelinearizationKey,
    SecretKey,
)
from tpufhe.ops.rq import NTT, POWER_BASIS, Poly
from tpufhe.serialize import (
    deserialize_ciphertext,
    deserialize_evaluation_key,
    deserialize_parameters,
    deserialize_poly,
    deserialize_public_key,
    deserialize_relinearization_key,
    deserialize_rgsw,
    deserialize_secret_key,
    serialize_ciphertext,
    serialize_evaluation_key,
    serialize_parameters,
    serialize_poly,
    serialize_public_key,
    serialize_relinearization_key,
    serialize_rgsw,
    serialize_secret_key,
)
from tpufhe.utils.rngs import ChaCha8Rng, seed_from_u64

RNG = np.random.default_rng(31337)


def rng():
    return ChaCha8Rng(seed_from_u64(int(RNG.integers(0, 1 << 63))))


@pytest.fixture(scope="module")
def par():
    return BfvParameters.default(2, 16)


def test_poly_roundtrip(par):
    ctx = par.context_at_level(0)
    r = rng()
    for rep in (POWER_BASIS, NTT):
        p = Poly.random(ctx, r, rep)
        data = serialize_poly(p)
        q = deserialize_poly(data, ctx, rep)
        np.testing.assert_array_equal(p.to_u64_matrix(), q.to_u64_matrix())
    # wrong representation rejected
    p = Poly.random(ctx, r, NTT)
    with pytest.raises(ValueError):
        deserialize_poly(serialize_poly(p), ctx, POWER_BASIS)
    # corrupted payload rejected
    with pytest.raises(Exception):
        deserialize_poly(serialize_poly(p)[:-3], ctx, NTT)


def test_ciphertext_roundtrip_with_seed(par):
    r = rng()
    sk = SecretKey.random(par, r)
    t = par.plaintext.value
    vals = RNG.integers(0, t, size=par.degree(), dtype=np.uint64)
    pt = Plaintext.try_encode(vals, Encoding.poly(), par)
    ct = sk.try_encrypt(pt, r)
    assert ct.seed is not None  # fresh ciphertexts carry seeds
    data = serialize_ciphertext(ct)
    ct2 = deserialize_ciphertext(data, par)
    for a, b in zip(ct.c, ct2.c):
        np.testing.assert_array_equal(a.to_u64_matrix(), b.to_u64_matrix())
    pt2 = sk.try_decrypt(ct2)
    np.testing.assert_array_equal(np.asarray(pt2.try_decode(Encoding.poly())), vals)

    # seed compression halves the ciphertext size
    ct.seed = None
    data_noseed = serialize_ciphertext(ct)
    assert len(data) < 0.6 * len(data_noseed)


def test_keys_roundtrip(par):
    r = rng()
    sk = SecretKey.random(par, r)

    sk2 = deserialize_secret_key(serialize_secret_key(sk), par)
    np.testing.assert_array_equal(sk.coeffs, sk2.coeffs)

    pk = PublicKey.new(sk, r)
    pk2 = deserialize_public_key(serialize_public_key(pk), par)
    for a, b in zip(pk.c.c, pk2.c.c):
        np.testing.assert_array_equal(a.to_u64_matrix(), b.to_u64_matrix())

    rk = RelinearizationKey.new(sk, r)
    rk2 = deserialize_relinearization_key(
        serialize_relinearization_key(rk), par
    )
    assert rk2.ksk.seed == rk.ksk.seed
    for a, b in zip(rk.ksk.c0, rk2.ksk.c0):
        np.testing.assert_array_equal(a.to_u64_matrix(), b.to_u64_matrix())
    for a, b in zip(rk.ksk.c1, rk2.ksk.c1):
        np.testing.assert_array_equal(a.to_u64_matrix(), b.to_u64_matrix())


def test_evaluation_key_roundtrip(par):
    r = rng()
    sk = SecretKey.random(par, r)
    ek = EvaluationKeyBuilder(sk).enable_row_rotation().build(r)
    ek2 = deserialize_evaluation_key(serialize_evaluation_key(ek), par)
    assert set(ek.gk) == set(ek2.gk)
    assert ek2.supports_row_rotation()


def test_rgsw_roundtrip(par):
    r = rng()
    sk = SecretKey.random(par, r)
    t = par.plaintext.value
    vals = RNG.integers(0, t, size=par.degree(), dtype=np.uint64)
    pt = Plaintext.try_encode(vals, Encoding.poly(), par)
    rgsw = RGSWCiphertext.encrypt(sk, pt, r)
    rgsw2 = deserialize_rgsw(serialize_rgsw(rgsw), par)
    for a, b in zip(rgsw.ksk0.c0, rgsw2.ksk0.c0):
        np.testing.assert_array_equal(a.to_u64_matrix(), b.to_u64_matrix())


def test_parameters_roundtrip(par):
    data = serialize_parameters(par)
    par2 = deserialize_parameters(data)
    assert par2 == par
