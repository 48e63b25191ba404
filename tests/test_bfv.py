"""End-to-end BFV tests: encrypt/decrypt, homomorphic ops, keys, RGSW.

Mirrors the reference's test strategy (SURVEY.md section 4): random inputs at
tiny degrees, exact plaintext equality after decryption, noise-budget sanity.
"""

import numpy as np
import pytest

from tpufhe.bfv import (
    BfvParameters,
    BfvParametersBuilder,
    Ciphertext,
    Encoding,
    EvaluationKeyBuilder,
    Multiplicator,
    Plaintext,
    PublicKey,
    RGSWCiphertext,
    RelinearizationKey,
    SecretKey,
    ct_add,
    ct_mul,
    ct_mul_pt,
    ct_neg,
    ct_sub,
    dot_product_scalar,
)
from tpufhe.utils.rngs import ChaCha8Rng, seed_from_u64

RNG = np.random.default_rng(2024)


def rng():
    return ChaCha8Rng(seed_from_u64(int(RNG.integers(0, 1 << 63))))


def params(num_moduli=1, degree=16):
    return BfvParameters.default(num_moduli, degree)


def random_pt(par, encoding=None, level=0):
    encoding = encoding or Encoding.poly(level)
    t = par.plaintext.value
    vals = RNG.integers(0, t, size=par.degree(), dtype=np.uint64)
    return Plaintext.try_encode(vals, encoding, par), vals


def test_encode_decode_roundtrip():
    par = params(1, 16)
    for enc in [Encoding.poly(), Encoding.simd()]:
        pt, vals = random_pt(par, enc)
        np.testing.assert_array_equal(np.asarray(pt.try_decode(enc)), vals)
    # i64 roundtrip
    vals = RNG.integers(-500, 500, size=16, dtype=np.int64)
    pt = Plaintext.try_encode_i64(vals, Encoding.poly(), par)
    got = pt.try_decode_i64(Encoding.poly())
    np.testing.assert_array_equal(got, vals)


@pytest.mark.parametrize("num_moduli", [1, 2, 4])
def test_encrypt_decrypt_sk(num_moduli):
    par = params(num_moduli, 16)
    r = rng()
    sk = SecretKey.random(par, r)
    for level in range(par.max_level() + 1):
        pt, vals = random_pt(par, Encoding.poly(level), level)
        ct = sk.try_encrypt(pt, r)
        pt2 = sk.try_decrypt(ct)
        np.testing.assert_array_equal(
            np.asarray(pt2.try_decode(Encoding.poly(level))), vals
        )
        assert sk.measure_noise(ct) <= 55


def test_encrypt_decrypt_pk():
    par = params(2, 16)
    r = rng()
    sk = SecretKey.random(par, r)
    pk = PublicKey.new(sk, r)
    pt, vals = random_pt(par)
    ct = pk.try_encrypt(pt, r)
    pt2 = sk.try_decrypt(ct)
    np.testing.assert_array_equal(np.asarray(pt2.try_decode(Encoding.poly())), vals)


def test_homomorphic_add_sub_neg():
    par = params(1, 16)
    t = par.plaintext.value
    r = rng()
    sk = SecretKey.random(par, r)
    pa, va = random_pt(par)
    pb, vb = random_pt(par)
    ca = sk.try_encrypt(pa, r)
    cb = sk.try_encrypt(pb, r)

    got = np.asarray(sk.try_decrypt(ct_add(ca, cb)).try_decode(Encoding.poly()))
    np.testing.assert_array_equal(got, (va + vb) % t)
    got = np.asarray(sk.try_decrypt(ct_sub(ca, cb)).try_decode(Encoding.poly()))
    np.testing.assert_array_equal(
        got, ((va.astype(object) - vb.astype(object)) % t).astype(np.uint64)
    )
    got = np.asarray(sk.try_decrypt(ct_neg(ca)).try_decode(Encoding.poly()))
    np.testing.assert_array_equal(got, (-va.astype(np.int64)) % t)


def test_plaintext_mul_simd():
    par = params(2, 16)
    t = par.plaintext.value
    r = rng()
    sk = SecretKey.random(par, r)
    pa, va = random_pt(par, Encoding.simd())
    pb, vb = random_pt(par, Encoding.simd())
    ca = sk.try_encrypt(pa, r)
    prod = ct_mul_pt(ca, pb)
    got = np.asarray(sk.try_decrypt(prod).try_decode(Encoding.simd()))
    want = (va.astype(object) * vb.astype(object)) % t
    np.testing.assert_array_equal(got, want.astype(np.uint64))


def test_ct_mul_and_relinearize():
    par = params(4, 16)
    t = par.plaintext.value
    r = rng()
    sk = SecretKey.random(par, r)
    pa, va = random_pt(par, Encoding.simd())
    pb, vb = random_pt(par, Encoding.simd())
    ca = sk.try_encrypt(pa, r)
    cb = sk.try_encrypt(pb, r)

    prod = ct_mul(ca, cb)
    assert len(prod) == 3
    want = ((va.astype(object) * vb.astype(object)) % t).astype(np.uint64)
    got = np.asarray(sk.try_decrypt(prod).try_decode(Encoding.simd()))
    np.testing.assert_array_equal(got, want)

    rk = RelinearizationKey.new(sk, r)
    prod2 = ct_mul(ca, cb)
    noise_before = sk.measure_noise(prod2)
    rk.relinearizes(prod2)
    assert len(prod2) == 2
    # noise-budget bound (key_switching_key.rs:476-504 pattern): the
    # key-switch may add at most ~70 bits over the tensored ciphertext,
    # so a regression that still decrypts at toy params is caught
    assert sk.measure_noise(prod2) <= noise_before + 70
    got = np.asarray(sk.try_decrypt(prod2).try_decode(Encoding.simd()))
    np.testing.assert_array_equal(got, want)

    # square fast path: identity, value equality (clone), and ct_square
    # must all take it and agree (ops/mod.rs:259-341 squares on value)
    from tpufhe.bfv import ct_square
    from tpufhe.bfv.ops import _ct_value_equal

    assert _ct_value_equal(ca, ca.clone())
    assert not _ct_value_equal(ca, cb)
    want_sq = ((va.astype(object) ** 2) % t).astype(np.uint64)
    for sq in (ct_mul(ca, ca), ct_mul(ca, ca.clone()), ct_square(ca)):
        got = np.asarray(sk.try_decrypt(sq).try_decode(Encoding.simd()))
        np.testing.assert_array_equal(got, want_sq)


def test_multiplicator_default_and_mod_switch():
    par = params(4, 16)
    t = par.plaintext.value
    r = rng()
    sk = SecretKey.random(par, r)
    rk = RelinearizationKey.new(sk, r)
    m = Multiplicator.default(rk)
    m.enable_mod_switching()
    pa, va = random_pt(par, Encoding.simd())
    pb, vb = random_pt(par, Encoding.simd())
    ca = sk.try_encrypt(pa, r)
    cb = sk.try_encrypt(pb, r)
    prod = m.multiply(ca, cb)
    assert prod.level == 1
    got = np.asarray(sk.try_decrypt(prod).try_decode(Encoding.simd(1)))
    want = ((va.astype(object) * vb.astype(object)) % t).astype(np.uint64)
    np.testing.assert_array_equal(got, want)


def test_multiplicator_second_strategy():
    """The second multiplication strategy of eprint 2021/204
    (ops/mul.rs:353-402): rhs scaled up by r/q into the extended basis,
    post-scale by t/r."""
    from tpufhe.ops.rns import RnsContext, ScalingFactor
    from tpufhe.utils.primes import generate_prime

    par = params(3, 16)
    t = par.plaintext.value
    r = rng()
    ctx0 = par.context_at_level(0)

    extended_basis = list(par.moduli)
    for _ in range(3):
        prev = extended_basis[-1]
        extended_basis.append(generate_prime(62, 2 * par.degree(), prev))
    rns = RnsContext(extended_basis[3:])

    sk = SecretKey.random(par, r)
    pa, va = random_pt(par, Encoding.simd())
    ca = sk.try_encrypt(pa, r)
    cb = sk.try_encrypt(pa, r)
    want = ((va.astype(object) * va.astype(object)) % t).astype(np.uint64)

    m = Multiplicator(
        ScalingFactor.one(),
        ScalingFactor(rns.product, ctx0.modulus()),
        extended_basis,
        ScalingFactor(t, rns.product),
        par,
    )
    prod = m.multiply(ca, cb)
    got = np.asarray(sk.try_decrypt(prod).try_decode(Encoding.simd()))
    np.testing.assert_array_equal(got, want)

    m.enable_mod_switching()
    prod = m.multiply(ca, cb)
    assert prod.level == 1
    got = np.asarray(sk.try_decrypt(prod).try_decode(Encoding.simd(1)))
    np.testing.assert_array_equal(got, want)


def test_secret_key_zeroize():
    """Zeroize scrubs the host key material in place (secret_key.rs:29-40)."""
    par = params(2, 16)
    r = rng()
    sk = SecretKey.random(par, r)
    buf = sk.coeffs
    assert np.any(buf != 0)
    sk.zeroize()
    assert not np.any(buf != 0)


def test_switch_down_ciphertext():
    par = params(3, 16)
    r = rng()
    sk = SecretKey.random(par, r)
    pt, vals = random_pt(par)
    ct = sk.try_encrypt(pt, r)
    ct.switch_to_level(2)
    assert ct.level == 2
    got = np.asarray(sk.try_decrypt(ct).try_decode(Encoding.poly(2)))
    np.testing.assert_array_equal(got, vals)


def test_rotations_and_inner_sum():
    par = params(4, 16)
    t = par.plaintext.value
    n = par.degree()
    r = rng()
    sk = SecretKey.random(par, r)
    ek = (
        EvaluationKeyBuilder(sk)
        .enable_inner_sum()
        .enable_row_rotation()
        .enable_column_rotation(1)
        .build(r)
    )
    pt, vals = random_pt(par, Encoding.simd())
    ct = sk.try_encrypt(pt, r)
    noise_fresh = sk.measure_noise(ct)

    # row rotation: swap the two rows
    rot = ek.rotates_rows(ct)
    # Galois key switch adds at most ~70 bits of noise
    # (key_switching_key.rs:476-504 pattern)
    assert sk.measure_noise(rot) <= noise_fresh + 70
    got = np.asarray(sk.try_decrypt(rot).try_decode(Encoding.simd()))
    want = np.concatenate([vals[n // 2 :], vals[: n // 2]])
    np.testing.assert_array_equal(got, want)

    # column rotation by 1: each row rotates left by 1
    rot = ek.rotates_columns_by(ct, 1)
    assert sk.measure_noise(rot) <= noise_fresh + 70
    got = np.asarray(sk.try_decrypt(rot).try_decode(Encoding.simd()))
    want = np.concatenate(
        [np.roll(vals[: n // 2], -1), np.roll(vals[n // 2 :], -1)]
    )
    np.testing.assert_array_equal(got, want)

    # inner sum: every slot holds the total sum
    s = ek.computes_inner_sum(ct)
    got = np.asarray(sk.try_decrypt(s).try_decode(Encoding.simd()))
    np.testing.assert_array_equal(
        got, np.full(n, int(vals.astype(object).sum()) % t, dtype=np.uint64)
    )


def test_expansion():
    par = params(4, 16)
    t = par.plaintext.value
    n = par.degree()
    r = rng()
    sk = SecretKey.random(par, r)
    level = 2  # expand to 4
    ek = EvaluationKeyBuilder(sk).enable_expansion(level).build(r)
    vals = np.zeros(n, dtype=np.uint64)
    vals[0] = 7
    vals[1] = 4
    vals[3] = 5
    pt = Plaintext.try_encode(vals, Encoding.poly(), par)
    ct = sk.try_encrypt(pt, r)
    expanded = ek.expands(ct, 1 << level)
    assert len(expanded) == 1 << level
    for i, cti in enumerate(expanded):
        got = np.asarray(sk.try_decrypt(cti).try_decode(Encoding.poly()))
        # expansion scales each coefficient by 2^level
        want = np.zeros(n, dtype=np.uint64)
        want[0] = (int(vals[i]) * (1 << level)) % t
        np.testing.assert_array_equal(got, want)


def test_dot_product_scalar():
    par = params(2, 16)
    t = par.plaintext.value
    r = rng()
    sk = SecretKey.random(par, r)
    cts, pts, vas, vbs = [], [], [], []
    for _ in range(4):
        pa, va = random_pt(par, Encoding.simd())
        pb, vb = random_pt(par, Encoding.simd())
        cts.append(sk.try_encrypt(pa, r))
        pts.append(pb)
        vas.append(va)
        vbs.append(vb)
    out = dot_product_scalar(cts, pts)
    got = np.asarray(sk.try_decrypt(out).try_decode(Encoding.simd()))
    want = sum(
        a.astype(object) * b.astype(object) for a, b in zip(vas, vbs)
    ) % t
    np.testing.assert_array_equal(got, want.astype(np.uint64))


def test_rgsw_external_product():
    par = params(2, 16)
    t = par.plaintext.value
    r = rng()
    sk = SecretKey.random(par, r)
    pa, va = random_pt(par, Encoding.simd())
    pb, vb = random_pt(par, Encoding.simd())
    ct = sk.try_encrypt(pa, r)
    rgsw = RGSWCiphertext.encrypt(sk, pb, r)
    prod = rgsw.external_product(ct)
    got = np.asarray(sk.try_decrypt(prod).try_decode(Encoding.simd()))
    want = ((va.astype(object) * vb.astype(object)) % t).astype(np.uint64)
    np.testing.assert_array_equal(got, want)


def test_default_parameters_128():
    ps = BfvParameters.default_parameters_128(20)
    assert len(ps) >= 1
    degrees = [p.degree() for p in ps]
    assert degrees == sorted(degrees)
