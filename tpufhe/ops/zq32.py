"""Single-lane Z_q arithmetic for narrow moduli p < 2^30.

The reference supports moduli of 10..62 bits (zq/primes.rs:30-59). For
parameter sets built from sub-2^30 primes, a residue fits ONE uint32 lane,
so every Barrett/Shoup primitive collapses from 16-30 lane multiplies (the
u64-pair emulation in tpufhe/ops/zq.py) to 2-8 — the TPU-native parameter
regime. Same exact-integer semantics, same lazy bounds:

- Shoup constants are scaled by 2^32 (floor(b * 2^32 / p)); lazy Shoup
  products land in [0, 2p) for ANY u32 input (Harvey's bound needs 4p <
  2^32, hence p < 2^30).
- Barrett reduction of u64 products uses mu = floor(2^64 / p) (< 2^35,
  kept as (mu0, mu1=mu>>32 < 2^3) lanes); the quotient estimate is off by
  at most 2, fixed with two conditional subtractions.

All functions are plain jnp on uint32 arrays and trace inside Pallas
kernels. Host-side constants come from zq.Modulus (shoup32/barrett64_*).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpufhe.ops.u64 import U32, mul32, mulhi32

__all__ = [
    "reduce1_32",
    "add_mod32",
    "sub_mod32",
    "neg_mod32",
    "lazy_mul_shoup32",
    "mul_shoup32",
    "lazy_reduce_u64_32",
    "reduce_u64_32",
    "mul_mod32",
]


def reduce1_32(x, p):
    """x mod p for x < 2p."""
    return jnp.where(x < p, x, x - p)


def add_mod32(a, b, p):
    return reduce1_32(a + b, p)


def sub_mod32(a, b, p):
    return reduce1_32(a + p - b, p)


def neg_mod32(a, p):
    return reduce1_32(p - a, p)


def lazy_mul_shoup32(a, b, b_shoup, p):
    """a*b mod p in [0, 2p); b < p, b_shoup = floor(b*2^32/p), any u32 a."""
    q = mulhi32(a, b_shoup)
    return a * b - q * p


def mul_shoup32(a, b, b_shoup, p):
    return reduce1_32(lazy_mul_shoup32(a, b, b_shoup, p), p)


def lazy_reduce_u64_32(lo, hi, mu0, mu1, p):
    """(hi*2^32 + lo) reduced into [0, 4p), for values < 2^60.

    Uses the quotient estimate
        q = hi*mu1 + floor((hi*mu0 + lo*mu1 + floor(lo*mu0/2^32)) / 2^32)
    with mu = floor(2^64/p) = mu1*2^32 + mu0, which undershoots the true
    floor(x/p) by at most 3; the result is exact mod p and < 4p < 2^32.
    """
    # floor(x*mu/2^64) where x = hi*2^32 + lo:
    #   = hi*mu1 + floor((hi*mu0 + lo*mu1 + floor(lo*mu0/2^32)) / 2^32)
    t = mulhi32(lo, mu0)
    mid_lo, mid_hi = mul32(hi, mu0)
    lm_lo, lm_hi = mul32(lo, mu1)
    s0 = t + mid_lo
    c0 = (s0 < t).astype(U32)
    s1 = s0 + lm_lo
    c1 = (s1 < s0).astype(U32)
    q = hi * mu1 + mid_hi + lm_hi + c0 + c1
    return lo - q * p


def reduce_u64_32(lo, hi, mu0, mu1, p):
    """(hi*2^32 + lo) mod p exactly (x < 2^60)."""
    r = lazy_reduce_u64_32(lo, hi, mu0, mu1, p)
    r = jnp.where(r >= 2 * p, r - 2 * p, r)  # < 4p -> < 2p
    return reduce1_32(r, p)


def mul_mod32(a, b, mu0, mu1, p):
    """(a*b) mod p for a, b < p < 2^30."""
    lo, hi = mul32(a, b)
    return reduce_u64_32(lo, hi, mu0, mu1, p)
