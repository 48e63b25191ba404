"""Z_q modular arithmetic for moduli up to 62 bits, on uint32 limb pairs.

This is the innermost kernel layer — behavioral parity with
fhe-math/src/zq/mod.rs:

- Barrett reduction with the 128-bit constant floor(2^128/p) split hi/lo
  (zq/mod.rs:87-97, 693-723).
- Shoup multiplication ``lazy_mul_shoup`` with output in [0, 2p)
  (zq/mod.rs:224-234).
- Lazy reductions to [0, 2p) and the final conditional subtraction
  ``reduce1`` (zq/mod.rs:659-668).

Host-side scalar methods use exact Python ints (used for precomputation and
as the golden reference in tests); device methods are vectorized jnp on
(lo, hi) uint32 pairs with arbitrary leading batch dimensions.

Unlike the reference there is no constant-time/variable-time split: XLA
integer programs are data-oblivious by construction, so every device op is
constant-time. The `_vt` API surface therefore collapses into the single
implementation.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from tpufhe.ops import u64
from tpufhe.ops.u64 import (
    U32,
    add64,
    ge64,
    lt64,
    mul32,
    mul64_lo,
    mul64_wide,
    mulhi64,
    sub64,
    to_pair,
)
from tpufhe.utils.primes import is_prime, supports_opt
from tpufhe.utils.rngs import uniform_u64_below
from tpufhe.utils.transcode import transcode_from_bytes, transcode_to_bytes
from tpufhe.errors import InvalidModulus


def _pair_const(x: int, like=None):
    """Broadcastable u64-pair constant from a Python int."""
    lo, hi = u64.split64(x)
    return jnp.asarray(lo), jnp.asarray(hi)


@dataclass(frozen=True)
class Modulus:
    """A modulus p < 2^62 with precomputed Barrett/Shoup constants.

    Mirrors fhe-math/src/zq/mod.rs:32-98. Hashable/immutable so contexts
    built on it can key jit caches.
    """

    p: int
    barrett_hi: int = field(init=False)
    barrett_lo: int = field(init=False)
    leading_zeros: int = field(init=False)
    supports_opt: bool = field(init=False)

    def __post_init__(self):
        p = int(self.p)
        if p < 2 or (p >> 62) != 0:
            raise InvalidModulus(p)
        barrett = (1 << 128) // p
        object.__setattr__(self, "p", p)
        object.__setattr__(self, "barrett_hi", barrett >> 64)
        object.__setattr__(self, "barrett_lo", barrett & ((1 << 64) - 1))
        object.__setattr__(self, "leading_zeros", 64 - p.bit_length())
        object.__setattr__(self, "supports_opt", supports_opt(p))

    # ----- exact host-side scalar arithmetic (Python ints) -----

    def add(self, a: int, b: int) -> int:
        return (a + b) % self.p

    def sub(self, a: int, b: int) -> int:
        return (a - b) % self.p

    def mul(self, a: int, b: int) -> int:
        return (a * b) % self.p

    def neg(self, a: int) -> int:
        return (-a) % self.p

    def shoup(self, a: int) -> int:
        """floor(a * 2^64 / p), the Shoup precomputation (zq/mod.rs:195-199)."""
        assert 0 <= a < self.p
        return (a << 64) // self.p

    def shoup32(self, a: int) -> int:
        """floor(a * 2^32 / p) — the single-lane (w30) Shoup constant."""
        assert 0 <= a < self.p < (1 << 30)
        return (a << 32) // self.p

    @property
    def mu64(self) -> int:
        """floor(2^64 / p) — the w30 Barrett constant (< 2^35 for p >= 2^29)."""
        return (1 << 64) // self.p

    def pow(self, a: int, n: int) -> int:
        return pow(a, n, self.p)

    def inv(self, a: int) -> int | None:
        if not is_prime(self.p) or a == 0:
            return None
        return pow(a, self.p - 2, self.p)

    def reduce(self, a: int) -> int:
        return int(a) % self.p

    def center(self, a: int) -> int:
        a = int(a) % self.p
        return a - self.p if a >= (self.p + 1) // 2 else a

    # ----- randomness (host, reference-compatible) -----

    def random_vec(self, size: int, rng) -> np.ndarray:
        """Uniform values in [0, p) with rand-0.9 Uniform semantics."""
        return uniform_u64_below(rng, self.p, size)

    # ----- serialization helpers -----

    @property
    def nbits(self) -> int:
        return (self.p - 1).bit_length()

    def serialization_length(self, size: int) -> int:
        assert size % 8 == 0
        return self.nbits * size // 8

    def serialize_vec(self, a) -> bytes:
        return transcode_to_bytes(a, self.nbits)

    def deserialize_vec(self, b: bytes) -> np.ndarray:
        return transcode_from_bytes(b, self.nbits)

    # ----- device constants -----

    @property
    def p_pair(self):
        return _pair_const(self.p)

    @property
    def p2_pair(self):
        return _pair_const(2 * self.p)

    @property
    def barrett_lo_pair(self):
        return _pair_const(self.barrett_lo)

    @property
    def barrett_hi_pair(self):
        return _pair_const(self.barrett_hi)


# ---------------------------------------------------------------------------
# Device ops. All take/return u64 pairs. `p`, `p2`, etc. are u64 pairs that
# broadcast against the data (scalars or per-limb (k, 1) arrays).
# ---------------------------------------------------------------------------


def reduce1(x, p):
    """x mod p for x < 2p (one conditional subtraction, zq/mod.rs:659-668)."""
    m = lt64(x, p)
    sub = sub64(x, p)
    return (
        jnp.where(m, x[0], sub[0]),
        jnp.where(m, x[1], sub[1]),
    )


def add_mod(a, b, p):
    """(a + b) mod p for a, b < p."""
    return reduce1(add64(a, b), p)


def sub_mod(a, b, p):
    """(a - b) mod p for a, b < p."""
    return reduce1(add64(a, sub64(p, b)), p)


def neg_mod(a, p):
    """(-a) mod p for a < p."""
    return reduce1(sub64(p, a), p)


def lazy_mul_shoup(a, b, b_shoup, p):
    """a * b mod p in [0, 2p), with b < p and b_shoup = floor(b*2^64/p).

    Mirrors zq/mod.rs:224-234; `a` may be any u64 value.
    """
    q = mulhi64(a, b_shoup)
    return sub64(mul64_lo(a, b), mul64_lo(q, p))


def mul_shoup(a, b, b_shoup, p):
    """a * b mod p via Shoup's trick (full reduction)."""
    return reduce1(lazy_mul_shoup(a, b, b_shoup, p), p)


def _sum128_3(x128a, x128b, y64):
    """(a + b + c) where a, b are 128-bit (4-limb) and c is 64-bit (pair).

    Returns 5 uint32 limbs (exact: the sum is < 2^130).
    """
    zero = jnp.zeros_like(y64[0])
    a = (*x128a, zero)
    b = (*x128b, zero)
    c = (y64[0], y64[1], zero, zero, zero)
    return u64.mp_add(u64.mp_add(a, b), c)


def lazy_reduce_u128(a128, barrett_lo, barrett_hi, p):
    """Barrett-reduce a 128-bit value (4 uint32 limbs) into [0, 2p).

    Mirrors zq/mod.rs:693-707:
        q = ((a_lo*b_hi + a_hi*b_lo + mulhi(a_lo, b_lo)) >> 64) + a_hi*b_hi
        r = (a - q*p) mod 2^64
    Only q mod 2^64 is needed since r < 2p < 2^63.
    """
    a_lo = (a128[0], a128[1])
    a_hi = (a128[2], a128[3])
    p_lo_lo = mulhi64(a_lo, barrett_lo)
    p_hi_lo = mul64_wide(a_hi, barrett_lo)
    p_lo_hi = mul64_wide(a_lo, barrett_hi)
    s = _sum128_3(p_hi_lo, p_lo_hi, p_lo_lo)
    q = add64((s[2], s[3]), mul64_lo(a_hi, barrett_hi))
    r = sub64(a_lo, mul64_lo(q, p))
    return r


def reduce_u128(a128, barrett_lo, barrett_hi, p):
    """Full reduction of a 128-bit value mod p."""
    return reduce1(lazy_reduce_u128(a128, barrett_lo, barrett_hi, p), p)


def lazy_reduce_opt_u128(a128, barrett_lo, lz: int, p):
    """NFLlib-optimized lazy Barrett for a < p^2 (zq/mod.rs:730-741):

        q = ((barrett_lo * (a >> 64)) + (a << lz)) >> 64
        r = (a - q*p) mod 2^64              in [0, 2p)

    Valid ONLY for supports_opt moduli (primes.rs:10-24 Eq. (1)) and
    inputs < p^2; `lz` is the modulus' leading_zeros (static, 1..31 —
    all generated 62-bit primes have lz = 2). One wide multiply instead
    of the generic path's three: the fold-reduce VPU cost nearly halves.
    The lazy representative may differ from the generic path's, but both
    are < 2p and congruent, so canonical (reduce1'd) results and any
    Shoup-consuming downstream ops are unchanged.
    """
    assert 0 < lz < 32
    v0, v1, v2, v3 = a128
    t = mul64_wide((v2, v3), barrett_lo)  # barrett_lo * (a >> 64), 4 limbs
    s0 = v0 << U32(lz)
    s1 = (v1 << U32(lz)) | (v0 >> U32(32 - lz))
    s2 = (v2 << U32(lz)) | (v1 >> U32(32 - lz))
    s3 = (v3 << U32(lz)) | (v2 >> U32(32 - lz))
    s = u64.mp_add(t, (s0, s1, s2, s3))  # < 2^127: no overflow
    q = (s[2], s[3])
    return sub64((v0, v1), mul64_lo(q, p))


def lazy_reduce_opt(a, lz: int, p):
    """NFLlib-optimized lazy reduction of a u64 value (zq/mod.rs:744-751):
    q = a >> (64 - lz); r = a - q*p. Output in [0, 2p). supports_opt
    moduli only; lz static in 1..31."""
    assert 0 < lz < 32
    q = (a[1] >> U32(32 - lz), jnp.zeros_like(a[1]))
    return sub64(a, mul64_lo(q, p))


def lazy_reduce(a, barrett_lo, barrett_hi, p):
    """Barrett-reduce a u64 value into [0, 2p) (zq/mod.rs:712-723)."""
    p_lo_lo = mulhi64(a, barrett_lo)
    p_lo_hi = mul64_wide(a, barrett_hi)
    zero = jnp.zeros_like(a[0])
    s = u64.mp_add((*p_lo_hi, zero), (p_lo_lo[0], p_lo_lo[1], zero, zero, zero))
    q = (s[2], s[3])
    return sub64(a, mul64_lo(q, p))


def reduce_u64(a, barrett_lo, barrett_hi, p):
    """Full reduction of an arbitrary u64 value mod p."""
    return reduce1(lazy_reduce(a, barrett_lo, barrett_hi, p), p)


def mul_mod(a, b, barrett_lo, barrett_hi, p):
    """(a * b) mod p for a, b < p, via 128-bit Barrett (zq/mod.rs:131-134)."""
    prod = mul64_wide(a, b)
    return reduce_u128(prod, barrett_lo, barrett_hi, p)


def lazy_mul_opt(a, b, barrett_lo, lz: int, p):
    """(a * b) mod p in [0, 2p) for a, b < p via the NFLlib-optimized
    Barrett (supports_opt moduli only): a*b < p^2 satisfies the
    lazy_reduce_opt_u128 precondition. Two wide multiplies total vs the
    generic path's four."""
    prod = mul64_wide(a, b)
    return lazy_reduce_opt_u128(prod, barrett_lo, lz, p)


def mul_mod_opt(a, b, barrett_lo, lz: int, p):
    """(a * b) mod p for a, b < p via the NFLlib-optimized Barrett."""
    return reduce1(lazy_mul_opt(a, b, barrett_lo, lz, p), p)


def reduce_i64(a_lo, a_hi, barrett_lo, barrett_hi, p):
    """Reduce a signed 64-bit value (as u64 pair two's complement) mod p.

    Mirrors zq/mod.rs:479-481: computes (p << 64) + a as a u128 then reduces,
    which is exact for |a| < p << 63.
    """
    sign = (a_hi >> U32(31)).astype(U32)  # 1 if negative
    # (p << 64) + a = (p + sign_extension) * 2^64 + a_u64... do it in 128-bit:
    # limbs = [a_lo, a_hi, p_lo + (-1 if neg), p_hi ...] -- equivalently
    # high 64 bits = p + (a >> 64) where a >> 64 is -1 for negatives.
    p_lo, p_hi = p
    hi = sub64((jnp.broadcast_to(p_lo, a_lo.shape), jnp.broadcast_to(p_hi, a_lo.shape)),
               (sign, jnp.zeros_like(sign)))
    a128 = (a_lo, a_hi, hi[0], hi[1])
    return reduce_u128(a128, barrett_lo, barrett_hi, p)


def center(a, p):
    """Center a < p into (-p/2, p/2] as an i64 pair (two's complement)."""
    threshold = shr_pair_1(p)
    m = ge64(a, threshold)  # a >= p>>1 => negative branch per reference: a >= threshold
    neg = sub64(a, p)
    return (
        jnp.where(m, neg[0], a[0]),
        jnp.where(m, neg[1], a[1]),
    )


def shr_pair_1(p):
    """p >> 1 on a pair."""
    return u64.shr64(p, 1)
