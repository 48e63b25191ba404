"""Batched/fused mbfv programs: bit-exact parity with the per-party
object API given the same RNG stream, plus psum-over-parties aggregation
on the 8-device CPU mesh (VERDICT r1 item 9, SURVEY 5.8)."""

import jax
import numpy as np

from tpufhe.bfv import BfvParameters, Encoding, Plaintext, SecretKey
from tpufhe.mbfv import CommonRandomPoly, DecryptionShare, PublicKeyShare, aggregate
from tpufhe.mbfv.batched import (
    batched_decryption,
    batched_public_key,
    make_sharded_pk_aggregation,
)
from tpufhe.utils.rngs import ChaCha8Rng, seed_from_u64

NUM_PARTIES = 5
RNG = np.random.default_rng(20260819)


def setup(seed=1234, num_moduli=2, degree=16):
    par = BfvParameters.default(num_moduli, degree)
    r = ChaCha8Rng(seed_from_u64(seed))
    parties = [SecretKey.random(par, r) for _ in range(NUM_PARTIES)]
    crp = CommonRandomPoly.new(par, r)
    return par, r, parties, crp


def test_batched_public_key_matches_object_api():
    par, _, parties, crp = setup()
    # identical post-setup RNG streams for both paths
    r1 = ChaCha8Rng(seed_from_u64(777))
    pk_obj = aggregate([PublicKeyShare.new(sk, crp, r1) for sk in parties])
    r2 = ChaCha8Rng(seed_from_u64(777))
    pk_fused = batched_public_key(parties, crp, r2)
    np.testing.assert_array_equal(
        np.asarray(pk_obj.c[0].coeffs), np.asarray(pk_fused.c[0].coeffs)
    )
    np.testing.assert_array_equal(
        np.asarray(pk_obj.c[1].coeffs), np.asarray(pk_fused.c[1].coeffs)
    )


def test_batched_decryption_matches_object_api():
    par, r, parties, crp = setup()
    pk = batched_public_key(parties, crp, r)
    t = par.plaintext.value
    vals = np.arange(par.degree(), dtype=np.uint64) % t
    pt = Plaintext.try_encode(vals, Encoding.poly(), par)
    ct = pk.try_encrypt(pt, r)

    r1 = ChaCha8Rng(seed_from_u64(888))
    pt_obj = aggregate([DecryptionShare.new(sk, ct, r1) for sk in parties])
    r2 = ChaCha8Rng(seed_from_u64(888))
    pt_fused = batched_decryption(parties, ct, r2)

    np.testing.assert_array_equal(
        np.asarray(pt_obj.try_decode(Encoding.poly())),
        np.asarray(pt_fused.try_decode(Encoding.poly())),
    )
    np.testing.assert_array_equal(
        np.asarray(pt_fused.try_decode(Encoding.poly())), vals
    )


def test_batched_relin_keygen_matches_object_api():
    """Fused 2-round RelinKeyGen == per-party object protocol, bit-exact,
    and the resulting key relinearizes a real product correctly."""
    from tpufhe.mbfv import RelinKeyGenerator
    from tpufhe.mbfv.batched import batched_relin_keygen

    par, r, parties, _ = setup()
    crp_vec = CommonRandomPoly.new_vec(par, r)

    r1 = ChaCha8Rng(seed_from_u64(999))
    gens = [RelinKeyGenerator(sk, crp_vec, r1) for sk in parties]
    shares1 = [g.round_1(r1) for g in gens]
    agg1 = aggregate(shares1)
    shares2 = [g.round_2(agg1, r1) for g in gens]
    rk_obj = aggregate(shares2)

    r2 = ChaCha8Rng(seed_from_u64(999))
    rk_fused = batched_relin_keygen(parties, crp_vec, r2)

    for a, b in zip(rk_obj.ksk.c0, rk_fused.ksk.c0):
        np.testing.assert_array_equal(np.asarray(a.coeffs),
                                      np.asarray(b.coeffs))
    for a, b in zip(rk_obj.ksk.c1, rk_fused.ksk.c1):
        np.testing.assert_array_equal(np.asarray(a.coeffs),
                                      np.asarray(b.coeffs))

    # end-to-end: the fused key relinearizes a product of encryptions
    # under the joint key (sum of shares)
    pk = batched_public_key(parties, CommonRandomPoly.new(par, r), r)
    t = par.plaintext.value
    va = RNG.integers(0, t, size=par.degree(), dtype=np.uint64)
    vb = RNG.integers(0, t, size=par.degree(), dtype=np.uint64)
    ca = pk.try_encrypt(Plaintext.try_encode(va, Encoding.simd(), par), r)
    cb = pk.try_encrypt(Plaintext.try_encode(vb, Encoding.simd(), par), r)
    from tpufhe.bfv.ops import ct_mul

    prod = ct_mul(ca, cb)
    rk_fused.relinearizes(prod)
    pt = batched_decryption(parties, prod, r)
    want = ((va.astype(object) * vb.astype(object)) % t).astype(np.uint64)
    np.testing.assert_array_equal(
        np.asarray(pt.try_decode(Encoding.simd())), want
    )


def test_psum_aggregation_matches_sum():
    """Aggregation as a psum over a parties mesh axis is exact."""
    par, r, parties, crp = setup(num_moduli=2, degree=16)
    ctx = par.context_at_level(0)
    assert len(jax.devices()) >= NUM_PARTIES

    shares = [PublicKeyShare.new(sk, crp, r) for sk in parties]
    stacked = np.stack([np.asarray(s.p0_share.coeffs) for s in shares])

    # pad the parties axis to the mesh size with zero shares
    n_dev = 8
    pad = np.zeros((n_dev - NUM_PARTIES,) + stacked.shape[1:], stacked.dtype)
    stacked8 = np.concatenate([stacked, pad])

    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:n_dev]), ("parties",))
    agg = make_sharded_pk_aggregation(par, mesh)
    got = np.asarray(agg(stacked8))

    want = aggregate(shares)
    np.testing.assert_array_equal(got, np.asarray(want.c[0].coeffs))
