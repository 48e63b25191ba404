"""64-bit and multi-word unsigned integer arithmetic emulated with uint32 limbs.

TPU vector units operate on 32-bit lanes; JAX on TPU has no native 64-bit
integer multiply-high. Every 62-bit RNS residue is therefore represented as a
pair of uint32 arrays ``(lo, hi)`` and all modular arithmetic (Barrett, Shoup,
lazy reductions) is expressed with 32x32->64 partial products built from
16-bit splits. These helpers are plain jnp functions, so they trace both in
regular XLA programs and inside Pallas TPU kernels.

Semantics mirror the scalar u64/u128 arithmetic of the reference Rust
implementation (fhe-math/src/zq/mod.rs:103-762) but are an original
vectorized design for 32-bit lanes.

A "u64 pair" is a tuple ``(lo, hi)`` of same-shaped uint32 arrays.
A "multiword" value is a tuple of uint32 limbs, little-endian.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32

__all__ = [
    "u32",
    "to_pair",
    "from_pair_np",
    "split64",
    "mul32",
    "mulhi32",
    "add64",
    "add64_carry",
    "sub64",
    "neg64",
    "lt64",
    "ge64",
    "eq64",
    "shl64",
    "shr64",
    "mul64_lo",
    "mul64_wide",
    "mulhi64",
    "mp_add",
    "mp_sub",
    "mp_shr",
    "mp_mul_pair",
    "mp_from_u64_pairs",
]


def u32(x):
    """Cast to uint32 (wrapping)."""
    return jnp.asarray(x, dtype=U32)


def split64(x: int):
    """Split a Python int < 2**64 into (lo32, hi32) numpy scalars."""
    x = int(x)
    assert 0 <= x < (1 << 64)
    return np.uint32(x & 0xFFFFFFFF), np.uint32(x >> 32)


def to_pair(x) -> tuple:
    """Convert numpy uint64 array / python ints to a (lo, hi) uint32 pair."""
    arr = np.asarray(x, dtype=np.uint64)
    return (
        jnp.asarray(arr & np.uint64(0xFFFFFFFF), dtype=U32),
        jnp.asarray(arr >> np.uint64(32), dtype=U32),
    )


def from_pair_np(pair) -> np.ndarray:
    """Convert a (lo, hi) uint32 pair back to a numpy uint64 array."""
    lo, hi = pair
    lo = np.asarray(lo, dtype=np.uint64)
    hi = np.asarray(hi, dtype=np.uint64)
    return lo | (hi << np.uint64(32))


# ---------------------------------------------------------------------------
# 32-bit primitives
# ---------------------------------------------------------------------------


def mul32(a, b):
    """Full 32x32 -> 64 multiply via 16-bit split. Returns (lo32, hi32)."""
    a = u32(a)
    b = u32(b)
    a0 = a & U32(0xFFFF)
    a1 = a >> U32(16)
    b0 = b & U32(0xFFFF)
    b1 = b >> U32(16)
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    # mid < 2^16 + 2*(2^16-1) < 2^18: no overflow.
    mid = (p00 >> U32(16)) + (p01 & U32(0xFFFF)) + (p10 & U32(0xFFFF))
    lo = (p00 & U32(0xFFFF)) | (mid << U32(16))
    hi = p11 + (p01 >> U32(16)) + (p10 >> U32(16)) + (mid >> U32(16))
    return lo, hi


def mulhi32(a, b):
    """High 32 bits of a 32x32 product."""
    return mul32(a, b)[1]


# ---------------------------------------------------------------------------
# 64-bit pair arithmetic
# ---------------------------------------------------------------------------


def add64(a, b):
    """(a + b) mod 2^64 on u64 pairs."""
    lo = a[0] + b[0]
    carry = (lo < a[0]).astype(U32)
    hi = a[1] + b[1] + carry
    return lo, hi


def add64_carry(a, b):
    """(a + b) mod 2^64 and the carry-out bit as uint32."""
    lo = a[0] + b[0]
    c0 = (lo < a[0]).astype(U32)
    hi1 = a[1] + b[1]
    c1 = (hi1 < a[1]).astype(U32)
    hi = hi1 + c0
    c2 = (hi < hi1).astype(U32)
    return (lo, hi), c1 + c2


def sub64(a, b):
    """(a - b) mod 2^64 on u64 pairs."""
    lo = a[0] - b[0]
    borrow = (a[0] < b[0]).astype(U32)
    hi = a[1] - b[1] - borrow
    return lo, hi


def neg64(a):
    """(-a) mod 2^64."""
    zero = jnp.zeros_like(a[0])
    return sub64((zero, zero), a)


def lt64(a, b):
    """a < b on u64 pairs, returns bool array."""
    return (a[1] < b[1]) | ((a[1] == b[1]) & (a[0] < b[0]))


def ge64(a, b):
    """a >= b on u64 pairs."""
    return ~lt64(a, b)


def eq64(a, b):
    """a == b on u64 pairs."""
    return (a[0] == b[0]) & (a[1] == b[1])


def shl64(a, k: int):
    """(a << k) mod 2^64 for a static shift 0 <= k < 64."""
    assert 0 <= k < 64
    if k == 0:
        return a
    if k >= 32:
        return jnp.zeros_like(a[0]), a[0] << U32(k - 32)
    return a[0] << U32(k), (a[1] << U32(k)) | (a[0] >> U32(32 - k))


def shr64(a, k: int):
    """a >> k for a static shift 0 <= k < 64."""
    assert 0 <= k < 64
    if k == 0:
        return a
    if k >= 32:
        return a[1] >> U32(k - 32), jnp.zeros_like(a[1])
    return (a[0] >> U32(k)) | (a[1] << U32(32 - k)), a[1] >> U32(k)


def mul64_lo(a, b):
    """Low 64 bits of a 64x64 product of u64 pairs."""
    lo, c = mul32(a[0], b[0])
    hi = c + a[0] * b[1] + a[1] * b[0]
    return lo, hi


def mul64_wide(a, b):
    """Full 64x64 -> 128 product as 4 uint32 limbs (little-endian)."""
    l0, l1 = mul32(a[0], b[0])
    m0, m1 = mul32(a[0], b[1])
    n0, n1 = mul32(a[1], b[0])
    h0, h1 = mul32(a[1], b[1])

    # limb 1: l1 + m0 + n0 (carries into limb 2)
    r1 = l1 + m0
    c2 = (r1 < l1).astype(U32)
    r1b = r1 + n0
    c2 = c2 + (r1b < r1).astype(U32)

    # limb 2: h0 + m1 + n1 + c2 (carries into limb 3)
    r2 = h0 + m1
    c3 = (r2 < h0).astype(U32)
    r2b = r2 + n1
    c3 = c3 + (r2b < r2).astype(U32)
    r2c = r2b + c2
    c3 = c3 + (r2c < r2b).astype(U32)

    r3 = h1 + c3
    return l0, r1b, r2c, r3


def mulhi64(a, b):
    """High 64 bits of a 64x64 product, as a u64 pair."""
    w = mul64_wide(a, b)
    return w[2], w[3]


# ---------------------------------------------------------------------------
# Generic little-endian multiword arithmetic on uint32 limb tuples
# ---------------------------------------------------------------------------


def mp_add(a, b):
    """Multiword add (same length), wrapping at the top limb."""
    assert len(a) == len(b)
    out = []
    carry = jnp.zeros_like(a[0])
    for ai, bi in zip(a, b):
        s1 = ai + bi
        c1 = (s1 < ai).astype(U32)
        s2 = s1 + carry
        c2 = (s2 < s1).astype(U32)
        out.append(s2)
        carry = c1 + c2
    return tuple(out)


def mp_sub(a, b):
    """Multiword subtract (same length), wrapping at the top limb."""
    assert len(a) == len(b)
    out = []
    borrow = jnp.zeros_like(a[0])
    for ai, bi in zip(a, b):
        d1 = ai - bi
        b1 = (ai < bi).astype(U32)
        d2 = d1 - borrow
        b2 = (d1 < borrow).astype(U32)
        out.append(d2)
        borrow = b1 + b2
    return tuple(out)


def mp_shr(a, k: int):
    """Multiword right shift by a static amount, same length output."""
    n = len(a)
    limb = k // 32
    bit = k % 32
    zero = jnp.zeros_like(a[0])
    shifted = [a[i + limb] if i + limb < n else zero for i in range(n)]
    if bit == 0:
        return tuple(shifted)
    out = []
    for i in range(n):
        lo = shifted[i] >> U32(bit)
        hi = shifted[i + 1] << U32(32 - bit) if i + 1 < n else zero
        out.append(lo | hi)
    return tuple(out)


def mp_from_u64_pairs(pairs, n_limbs: int):
    """Assemble a multiword value from consecutive u64 pairs."""
    limbs = []
    for lo, hi in pairs:
        limbs.extend([lo, hi])
    zero = jnp.zeros_like(limbs[0])
    while len(limbs) < n_limbs:
        limbs.append(zero)
    return tuple(limbs[:n_limbs])


def digits16(pair):
    """u64 pair -> 4 uint32 arrays holding its 16-bit digits (LE)."""
    lo, hi = pair
    m = U32(0xFFFF)
    return [lo & m, lo >> U32(16), hi & m, hi >> U32(16)]


def col_accumulate(cols: list, rdigits, cdigits):
    """cols[a+b] += low/high halves of rdigits[a] * cdigits[b].

    Carry-free multiword multiply-accumulate: rdigits are uint32 arrays
    holding 16-bit values, cdigits are Python ints < 2^16 (compile-time
    constants; zero digits are skipped). Each 16x16 product is one lane
    multiply; its halves accumulate into 16-bit column sums that stay far
    below 2^32, so no carry chains run until `cols_to_limbs`. Mutates cols.
    """
    m = U32(0xFFFF)
    for a, rd in enumerate(rdigits):
        for b, cd in enumerate(cdigits):
            if cd == 0:
                continue
            p = rd * U32(cd)
            cols[a + b] = cols[a + b] + (p & m)
            cols[a + b + 1] = cols[a + b + 1] + (p >> U32(16))
    return cols


def cols_to_limbs(cols, n_limbs: int):
    """Carry-fix 16-bit column sums into n_limbs uint32 limbs (mod 2^32n).

    cols[i] holds the (< 2^32) sum of 16-bit contributions at weight
    2^(16 i); one sequential carry pass produces the canonical limbs.
    """
    zero = jnp.zeros_like(cols[0])
    digs = []
    carry = zero
    for i in range(2 * n_limbs):
        v = (cols[i] if i < len(cols) else zero) + carry
        digs.append(v & U32(0xFFFF))
        carry = v >> U32(16)
    return tuple(
        digs[2 * j] | (digs[2 * j + 1] << U32(16)) for j in range(n_limbs)
    )


def _add_at(acc: list, k: int, v):
    """acc[k] += v, propagating carries upward. Mutates the list."""
    cur = v
    while k < len(acc):
        s = acc[k] + cur
        carry = (s < cur).astype(U32)
        acc[k] = s
        k += 1
        # carry is 0/1; if always zero we could stop, but shapes are static.
        cur = carry
    return acc


def mp_mul_pair(acc, a, b, n_limbs: int | None = None):
    """acc += a * b where a, b are u64 pairs and acc is a multiword tuple.

    The product is the exact 128-bit value; carries propagate through the
    full accumulator. Returns a new tuple.
    """
    acc = list(acc)
    if n_limbs is None:
        n_limbs = len(acc)
    w = mul64_wide(a, b)
    for i, wi in enumerate(w):
        _add_at(acc, i, wi)
    return tuple(acc)
