"""Multiparty BFV protocol tests: all parties in one process
(mirrors mbfv test strategy, SURVEY.md section 4.8)."""

import numpy as np

from tpufhe.bfv import BfvParameters, Encoding, Multiplicator, Plaintext, SecretKey
from tpufhe.bfv.ops import ct_add
from tpufhe.mbfv import (
    CommonRandomPoly,
    DecryptionShare,
    PublicKeyShare,
    PublicKeySwitchShare,
    RelinKeyGenerator,
    SecretKeySwitchShare,
    aggregate,
)
from tpufhe.utils.rngs import ChaCha8Rng, seed_from_u64

RNG = np.random.default_rng(77)
NUM_PARTIES = 5


def rng():
    return ChaCha8Rng(seed_from_u64(int(RNG.integers(0, 1 << 63))))


def setup(num_moduli=2, degree=16):
    par = BfvParameters.default(num_moduli, degree)
    r = rng()
    parties = [SecretKey.random(par, r) for _ in range(NUM_PARTIES)]
    crp = CommonRandomPoly.new(par, r)
    pk_shares = [PublicKeyShare.new(sk, crp, r) for sk in parties]
    pk = aggregate(pk_shares)
    return par, r, parties, pk


def collective_decrypt(parties, ct, r):
    shares = [DecryptionShare.new(sk, ct, r) for sk in parties]
    return aggregate(shares)


def test_multiparty_encrypt_decrypt():
    par, r, parties, pk = setup()
    t = par.plaintext.value
    vals = RNG.integers(0, t, size=par.degree(), dtype=np.uint64)
    pt = Plaintext.try_encode(vals, Encoding.poly(), par)
    ct = pk.try_encrypt(pt, r)
    pt2 = collective_decrypt(parties, ct, r)
    np.testing.assert_array_equal(np.asarray(pt2.try_decode(Encoding.poly())), vals)


def test_multiparty_voting_sum():
    """Homomorphic tally: sum of encrypted votes (examples/voting.rs)."""
    par, r, parties, pk = setup()
    t = par.plaintext.value
    votes = [int(RNG.integers(0, 2)) for _ in range(8)]
    tally = None
    for v in votes:
        pt = Plaintext.try_encode([v], Encoding.poly(), par)
        ct = pk.try_encrypt(pt, r)
        tally = ct if tally is None else ct_add(tally, ct)
    pt = collective_decrypt(parties, tally, r)
    got = np.asarray(pt.try_decode(Encoding.poly()))
    assert int(got[0]) == sum(votes) % t


def test_multiparty_relin_keygen_and_mul():
    par, r, parties, pk = setup(num_moduli=3)
    t = par.plaintext.value
    crp_vec = CommonRandomPoly.new_vec(par, r)
    generators = [RelinKeyGenerator(sk, crp_vec, r) for sk in parties]
    r1_shares = [g.round_1(r) for g in generators]
    r1_agg = aggregate(r1_shares)
    r2_shares = [g.round_2(r1_agg, r) for g in generators]
    rk = aggregate(r2_shares)

    va = RNG.integers(0, t, size=par.degree(), dtype=np.uint64)
    vb = RNG.integers(0, t, size=par.degree(), dtype=np.uint64)
    pa = Plaintext.try_encode(va, Encoding.simd(), par)
    pb = Plaintext.try_encode(vb, Encoding.simd(), par)
    ca = pk.try_encrypt(pa, r)
    cb = pk.try_encrypt(pb, r)

    mult = Multiplicator.default(rk)
    prod = mult.multiply(ca, cb)
    pt = collective_decrypt(parties, prod, r)
    got = np.asarray(pt.try_decode(Encoding.simd()))
    want = ((va.astype(object) * vb.astype(object)) % t).astype(np.uint64)
    np.testing.assert_array_equal(got, want)


def test_secret_key_switch():
    par, r, parties, pk = setup()
    t = par.plaintext.value
    # output key shares
    out_parties = [SecretKey.random(par, r) for _ in range(NUM_PARTIES)]
    vals = RNG.integers(0, t, size=par.degree(), dtype=np.uint64)
    pt = Plaintext.try_encode(vals, Encoding.poly(), par)
    ct = pk.try_encrypt(pt, r)
    shares = [
        SecretKeySwitchShare.new(si, so, ct, r)
        for si, so in zip(parties, out_parties)
    ]
    ct2 = aggregate(shares)
    pt2 = collective_decrypt(out_parties, ct2, r)
    np.testing.assert_array_equal(np.asarray(pt2.try_decode(Encoding.poly())), vals)


def test_public_key_switch():
    par, r, parties, pk = setup()
    t = par.plaintext.value
    # a second multiparty key
    out_parties = [SecretKey.random(par, r) for _ in range(NUM_PARTIES)]
    crp2 = CommonRandomPoly.new(par, r)
    pk2 = aggregate([PublicKeyShare.new(sk, crp2, r) for sk in out_parties])

    vals = RNG.integers(0, t, size=par.degree(), dtype=np.uint64)
    pt = Plaintext.try_encode(vals, Encoding.poly(), par)
    ct = pk.try_encrypt(pt, r)
    shares = [PublicKeySwitchShare.new(sk, pk2, ct, r) for sk in parties]
    ct2 = aggregate(shares)
    pt2 = collective_decrypt(out_parties, ct2, r)
    np.testing.assert_array_equal(np.asarray(pt2.try_decode(Encoding.poly())), vals)
