"""Bit-exact tests of the uint32-limb arithmetic against Python integers."""

import numpy as np
import pytest

from tpufhe.ops import u64


RNG = np.random.default_rng(1234)


def rand_u64(n, bits=64):
    bound = 1 << bits
    return RNG.integers(0, bound, size=n, dtype=np.uint64)


def as_int(x):
    return [int(v) for v in np.asarray(x, dtype=np.uint64)]


def test_mul32():
    a = RNG.integers(0, 1 << 32, size=256, dtype=np.uint64).astype(np.uint32)
    b = RNG.integers(0, 1 << 32, size=256, dtype=np.uint64).astype(np.uint32)
    lo, hi = u64.mul32(a, b)
    prod = a.astype(object) * b.astype(object)
    np.testing.assert_array_equal(
        np.asarray(lo), np.array([p & 0xFFFFFFFF for p in prod], dtype=np.uint32)
    )
    np.testing.assert_array_equal(
        np.asarray(hi), np.array([p >> 32 for p in prod], dtype=np.uint32)
    )


@pytest.mark.parametrize("op,pyop", [
    (u64.add64, lambda a, b: (a + b) % (1 << 64)),
    (u64.sub64, lambda a, b: (a - b) % (1 << 64)),
    (u64.mul64_lo, lambda a, b: (a * b) % (1 << 64)),
])
def test_binary64(op, pyop):
    a = rand_u64(512)
    b = rand_u64(512)
    got = u64.from_pair_np(op(u64.to_pair(a), u64.to_pair(b)))
    want = np.array(
        [pyop(int(x), int(y)) for x, y in zip(a, b)], dtype=np.uint64
    )
    np.testing.assert_array_equal(got, want)


def test_mul64_wide():
    a = rand_u64(256)
    b = rand_u64(256)
    limbs = u64.mul64_wide(u64.to_pair(a), u64.to_pair(b))
    got = sum(
        np.asarray(l, dtype=object).astype(object) * (1 << (32 * i))
        for i, l in enumerate(limbs)
    )
    want = a.astype(object) * b.astype(object)
    assert all(int(g) == int(w) for g, w in zip(got, want))


def test_mulhi64():
    a = rand_u64(256)
    b = rand_u64(256)
    got = u64.from_pair_np(u64.mulhi64(u64.to_pair(a), u64.to_pair(b)))
    want = np.array(
        [(int(x) * int(y)) >> 64 for x, y in zip(a, b)], dtype=np.uint64
    )
    np.testing.assert_array_equal(got, want)


def test_compare_and_shift():
    a = rand_u64(256)
    b = rand_u64(256)
    pa, pb = u64.to_pair(a), u64.to_pair(b)
    np.testing.assert_array_equal(np.asarray(u64.lt64(pa, pb)), a < b)
    np.testing.assert_array_equal(np.asarray(u64.ge64(pa, pb)), a >= b)
    for k in [0, 1, 7, 31, 32, 33, 63]:
        np.testing.assert_array_equal(
            u64.from_pair_np(u64.shr64(pa, k)),
            np.array([int(x) >> k for x in a], dtype=np.uint64),
        )
        np.testing.assert_array_equal(
            u64.from_pair_np(u64.shl64(pa, k)),
            np.array([(int(x) << k) % (1 << 64) for x in a], dtype=np.uint64),
        )


def mp_to_int(limbs):
    vals = [np.asarray(l, dtype=object) for l in limbs]
    out = vals[0] * 0
    for i, v in enumerate(vals):
        out = out + v.astype(object) * (1 << (32 * i))
    return out


def test_mp_mul_pair_accumulate():
    n = 128
    n_limbs = 7  # 224-bit accumulator
    acc = tuple(np.zeros(n, dtype=np.uint32) for _ in range(n_limbs))
    want = np.zeros(n, dtype=object)
    for _ in range(10):
        a = rand_u64(n, bits=62)
        b = rand_u64(n)
        acc = u64.mp_mul_pair(acc, u64.to_pair(a), u64.to_pair(b))
        want = want + a.astype(object) * b.astype(object)
    got = mp_to_int(acc)
    assert all(int(g) == int(w) for g, w in zip(got, want))


def test_mp_add_sub_shr():
    n = 64
    n_limbs = 8
    a_ints = [
        int.from_bytes(RNG.bytes(31), "little") for _ in range(n)
    ]
    b_ints = [
        int.from_bytes(RNG.bytes(31), "little") for _ in range(n)
    ]

    def to_mp(ints):
        return tuple(
            np.array([(v >> (32 * i)) & 0xFFFFFFFF for v in ints], dtype=np.uint32)
            for i in range(n_limbs)
        )

    a, b = to_mp(a_ints), to_mp(b_ints)
    mod = 1 << (32 * n_limbs)
    got = mp_to_int(u64.mp_add(a, b))
    assert all(int(g) == (x + y) % mod for g, x, y in zip(got, a_ints, b_ints))
    got = mp_to_int(u64.mp_sub(a, b))
    assert all(int(g) == (x - y) % mod for g, x, y in zip(got, a_ints, b_ints))
    for k in [1, 17, 32, 65, 127]:
        got = mp_to_int(u64.mp_shr(a, k))
        assert all(int(g) == (x >> k) for g, x in zip(got, a_ints))
