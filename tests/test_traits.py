"""The trait layer is real: concrete classes register as virtual subclasses
of the ABCs (fhe-traits/src/lib.rs:11-171) and carry the trait methods
(to_bytes/from_bytes, try_encrypt/try_decrypt, try_encode/try_decode)."""

import numpy as np

from tpufhe import traits
from tpufhe.bfv import (
    BfvParametersBuilder,
    Ciphertext,
    Encoding,
    EvaluationKeyBuilder,
    GaloisKey,
    Plaintext,
    PublicKey,
    RelinearizationKey,
    SecretKey,
)
from tpufhe.bfv.parameters import BfvParameters
from tpufhe.utils.rngs import ChaCha8Rng, seed_from_u64


def params():
    return BfvParameters.default(2, 16)


def rng():
    return ChaCha8Rng(seed_from_u64(7))


def test_isinstance_registrations():
    par = params()
    r = rng()
    sk = SecretKey.random(par, r)
    pk = PublicKey.new(sk, r)
    pt = Plaintext.try_encode([1, 2, 3], Encoding.poly(), par)
    ct = sk.try_encrypt(pt, r)

    assert isinstance(par, traits.FheParameters)
    assert isinstance(par, traits.Serialize)
    assert isinstance(pt, traits.FhePlaintext)
    assert isinstance(pt, traits.FheDecoder)
    assert isinstance(ct, traits.FheCiphertext)
    assert isinstance(ct, traits.Serialize)
    assert isinstance(ct, traits.DeserializeParametrized)
    assert isinstance(sk, traits.FheEncrypter)
    assert isinstance(sk, traits.FheDecrypter)
    assert isinstance(pk, traits.FheEncrypter)


def test_trait_method_roundtrips():
    par = params()
    r = rng()
    sk = SecretKey.random(par, r)
    pt = Plaintext.try_encode([5, 6], Encoding.poly(), par)
    ct = sk.try_encrypt(pt, r)

    par2 = BfvParameters.try_deserialize(par.to_bytes())
    assert par2 == par

    ct2 = Ciphertext.from_bytes(ct.to_bytes(), par)
    got = sk.try_decrypt(ct2).try_decode(Encoding.poly())
    np.testing.assert_array_equal(np.asarray(got)[:2], [5, 6])

    sk2 = SecretKey.from_bytes(sk.to_bytes(), par)
    assert np.array_equal(sk2.coeffs, sk.coeffs)

    rk = RelinearizationKey.new(sk, r)
    rk2 = RelinearizationKey.from_bytes(rk.to_bytes(), par)
    assert isinstance(rk2, RelinearizationKey)

    gk = GaloisKey.new(sk, 3, 0, 0, r)
    gk2 = GaloisKey.from_bytes(gk.to_bytes(), par)
    assert isinstance(gk2, GaloisKey)

    ek = EvaluationKeyBuilder(sk).enable_inner_sum().build(r)
    ek2 = type(ek).from_bytes(ek.to_bytes(), par)
    assert isinstance(ek2, type(ek))

    p = pt.to_poly()
    from tpufhe.ops.rq import Poly

    p2 = Poly.from_bytes(p.to_bytes(), p.ctx)
    assert np.array_equal(np.asarray(p2.coeffs), np.asarray(p.coeffs))
