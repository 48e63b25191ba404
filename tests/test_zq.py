"""Bit-exact tests of Z_q device ops against exact Python-int arithmetic."""

import jax
import numpy as np
import pytest

from tpufhe.ops import u64, zq
from tpufhe.ops.zq import Modulus
from tpufhe.utils.primes import generate_prime

RNG = np.random.default_rng(42)

MODULI = [
    1153,  # small prime
    4611686018326724609,  # NFLlib 62-bit prime
    4611686018309947393,
    (1 << 61) + 21,  # not necessarily prime; Modulus allows any p < 2^62
]


def rand_below(p, n):
    return (RNG.integers(0, 1 << 63, size=n, dtype=np.uint64) % np.uint64(p)).astype(
        np.uint64
    )


def nfl_62bit_primes_kat():
    """NFLlib prime sequence KAT (zq/primes.rs:68-102)."""
    generated = []
    upper = (1 << 64) - 1 >> 2
    while len(generated) != 20:
        p = generate_prime(62, 2 * 1048576, upper)
        assert p is not None
        upper = p
        generated.append(p)
    assert generated == [
        4611686018326724609,
        4611686018309947393,
        4611686018282684417,
        4611686018257518593,
        4611686018232352769,
        4611686018171535361,
        4611686018106523649,
        4611686018058289153,
        4611686018051997697,
        4611686017974403073,
        4611686017812922369,
        4611686017781465089,
        4611686017773076481,
        4611686017678704641,
        4611686017666121729,
        4611686017647247361,
        4611686017590624257,
        4611686017554972673,
        4611686017529806849,
        4611686017517223937,
    ]


def test_nfl_primes_kat():
    nfl_62bit_primes_kat()


@pytest.mark.parametrize("p", MODULI)
def test_add_sub_neg(p):
    m = Modulus(p)
    n = 128
    a = rand_below(p, n)
    b = rand_below(p, n)
    pa, pb = u64.to_pair(a), u64.to_pair(b)
    pp = u64.to_pair(np.uint64(p))

    got = u64.from_pair_np(zq.add_mod(pa, pb, pp))
    np.testing.assert_array_equal(got, (a.astype(object) + b.astype(object)) % p)
    got = u64.from_pair_np(zq.sub_mod(pa, pb, pp))
    np.testing.assert_array_equal(
        got, np.array([(int(x) - int(y)) % p for x, y in zip(a, b)], dtype=np.uint64)
    )
    got = u64.from_pair_np(zq.neg_mod(pa, pp))
    np.testing.assert_array_equal(
        got, np.array([(-int(x)) % p for x in a], dtype=np.uint64)
    )


@pytest.mark.parametrize("p", MODULI)
def test_mul_barrett(p):
    m = Modulus(p)
    n = 128
    a = rand_below(p, n)
    b = rand_below(p, n)
    pa, pb = u64.to_pair(a), u64.to_pair(b)
    pp = u64.to_pair(np.uint64(p))
    bl = u64.to_pair(np.uint64(m.barrett_lo))
    bh = u64.to_pair(np.uint64(m.barrett_hi))

    got = u64.from_pair_np(zq.mul_mod(pa, pb, bl, bh, pp))
    want = np.array([(int(x) * int(y)) % p for x, y in zip(a, b)], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p", MODULI)
def test_lazy_reduce_u128(p):
    m = Modulus(p)
    n = 128
    # random 128-bit values
    vals = [int.from_bytes(RNG.bytes(16), "little") for _ in range(n)]
    limbs = tuple(
        np.array([(v >> (32 * i)) & 0xFFFFFFFF for v in vals], dtype=np.uint32)
        for i in range(4)
    )
    pp = u64.to_pair(np.uint64(p))
    bl = u64.to_pair(np.uint64(m.barrett_lo))
    bh = u64.to_pair(np.uint64(m.barrett_hi))

    lazy = zq.lazy_reduce_u128(limbs, bl, bh, pp)
    lazy_np = u64.from_pair_np(lazy)
    for g, v in zip(lazy_np, vals):
        assert int(g) < 2 * p
        assert int(g) % p == v % p
    full = u64.from_pair_np(zq.reduce_u128(limbs, bl, bh, pp))
    np.testing.assert_array_equal(
        full, np.array([v % p for v in vals], dtype=np.uint64)
    )


@pytest.mark.parametrize("p", MODULI)
def test_shoup_mul(p):
    m = Modulus(p)
    n = 128
    a = RNG.integers(0, 1 << 64, size=n, dtype=np.uint64)  # any u64
    b = rand_below(p, n)
    b_shoup = np.array([m.shoup(int(x)) for x in b], dtype=np.uint64)
    pa = u64.to_pair(a)
    pb = u64.to_pair(b)
    pbs = u64.to_pair(b_shoup)
    pp = u64.to_pair(np.uint64(p))

    lazy = u64.from_pair_np(zq.lazy_mul_shoup(pa, pb, pbs, pp))
    for g, x, y in zip(lazy, a, b):
        assert int(g) < 2 * p
        assert int(g) % p == (int(x) * int(y)) % p
    full = u64.from_pair_np(zq.mul_shoup(pa, pb, pbs, pp))
    np.testing.assert_array_equal(
        full,
        np.array([(int(x) * int(y)) % p for x, y in zip(a, b)], dtype=np.uint64),
    )


@pytest.mark.parametrize("p", MODULI)
def test_reduce_i64_and_center(p):
    m = Modulus(p)
    n = 128
    a = RNG.integers(-(1 << 62), 1 << 62, size=n, dtype=np.int64)
    a_u = a.astype(np.uint64)
    lo = (a_u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (a_u >> np.uint64(32)).astype(np.uint32)
    pp = u64.to_pair(np.uint64(p))
    bl = u64.to_pair(np.uint64(m.barrett_lo))
    bh = u64.to_pair(np.uint64(m.barrett_hi))

    import jax.numpy as jnp

    got = u64.from_pair_np(
        zq.reduce_i64(jnp.asarray(lo), jnp.asarray(hi), bl, bh, pp)
    )
    want = np.array([int(x) % p for x in a], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)

    # center: matches the reference's threshold convention (a >= p>>1 -> a-p)
    v = rand_below(p, n)
    c = zq.center(u64.to_pair(v), pp)
    c_np = u64.from_pair_np(c).astype(np.int64)
    want_c = np.array(
        [int(x) - p if int(x) >= (p >> 1) else int(x) for x in v], dtype=np.int64
    )
    np.testing.assert_array_equal(c_np, want_c)


def test_lazy_reduce_opt_parity():
    """NFLlib-optimized reductions (zq/mod.rs:730-751): exact vs Python
    ints for generated supports_opt primes of several widths."""
    import jax.numpy as jnp

    from tpufhe.ops import zq
    from tpufhe.utils.primes import generate_prime

    rng = np.random.default_rng(7)
    for bits in (62, 55, 50):
        p = generate_prime(bits, 2 * 8192, 1 << bits)
        m = zq.Modulus(p)
        assert m.supports_opt
        lz = m.leading_zeros
        pp = (jnp.uint32(p & 0xFFFFFFFF), jnp.uint32(p >> 32))
        bl = (jnp.uint32(m.barrett_lo & 0xFFFFFFFF),
              jnp.uint32(m.barrett_lo >> 32))

        vals = [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 61))
                % (p * p) for _ in range(64)]
        limbs = tuple(
            jnp.asarray(np.array([(v >> (32 * i)) & 0xFFFFFFFF
                                  for v in vals], np.uint32))
            for i in range(4))
        r = zq.lazy_reduce_opt_u128(limbs, bl, lz, pp)
        got = (np.asarray(r[0]).astype(np.uint64)
               | (np.asarray(r[1]).astype(np.uint64) << np.uint64(32)))
        for g, v in zip(got, vals):
            assert int(g) < 2 * p and int(g) % p == v % p

        v64 = [int(x) for x in rng.integers(0, 1 << 63, 64, dtype=np.uint64)]
        a = (jnp.asarray(np.array([v & 0xFFFFFFFF for v in v64], np.uint32)),
             jnp.asarray(np.array([v >> 32 for v in v64], np.uint32)))
        r = zq.lazy_reduce_opt(a, lz, pp)
        got = (np.asarray(r[0]).astype(np.uint64)
               | (np.asarray(r[1]).astype(np.uint64) << np.uint64(32)))
        for g, v in zip(got, v64):
            assert int(g) < 2 * p and int(g) % p == v % p
