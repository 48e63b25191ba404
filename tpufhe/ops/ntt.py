"""Negacyclic NTT over Z_p with Harvey lazy butterflies and Shoup twiddles.

Behavioral parity with fhe-math/src/ntt/native.rs:
- twiddle tables in bit-reversed order, found from a seeded-ChaCha8 primitive
  root search (native.rs:320-348) so tables match the reference bit-exactly;
- forward: Cooley-Tukey DIT with lazy butterflies, inputs < 4p, outputs fully
  reduced (< p) except in the `lazy` variant which leaves values < 4p
  (native.rs:77-102, 142-175);
- backward: Gentleman-Sande with lazy butterflies, final n^{-1} Shoup fold
  (native.rs:106-132).

TPU-first design: instead of the reference's scalar in-place loops, each
stage is a static reshape to (..., m, 2, l) with one vectorized butterfly
over the whole array; all log2(n) stages unroll at trace time into one XLA
program. Polynomials carry a leading limb axis; twiddle tables and constants
carry a matching one and are broadcast against the data at every stage.

Conventions:
- data: (..., k, 2, n) uint32, axis -2 = (lo, hi) planes;
- twiddles: (k, 2, n) uint32;
- per-limb scalar constants (p, 2p, n^{-1}): pairs of (k,) uint32 arrays.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from tpufhe.ops import u64, zq
from tpufhe.ops.zq import Modulus
from tpufhe.utils.primes import is_prime
from tpufhe.utils.rngs import ChaChaRng, random_range_u64, seed_from_u64


def supports_ntt(p: int, n: int) -> bool:
    """p prime, p == 1 mod 2n, n >= 8 power of two (ntt/mod.rs:19-23)."""
    if n < 8 or (n & (n - 1)) != 0:
        return False
    return p % (2 * n) == 1 and is_prime(p)


def bitrev_indices(n: int) -> np.ndarray:
    """Bit-reversal permutation of 0..n-1."""
    nbits = n.bit_length() - 1
    out = np.empty(n, dtype=np.int32)
    for i in range(n):
        out[i] = int(f"{i:0{nbits}b}"[::-1], 2)
    return out


def primitive_root(n: int, q: Modulus) -> int:
    """2n-th primitive root of unity modulo q.p.

    Reproduces the reference's seeded search (native.rs:320-336):
    ChaCha8Rng::seed_from_u64(0), candidates drawn with random_range(0..p),
    raised to (p-1)/2n, first value passing the primitive-root check wins.
    """
    p = q.p
    lam = (p - 1) // (2 * n)
    rng = ChaChaRng(seed_from_u64(0), rounds=8)
    for _ in range(100):
        root = random_range_u64(rng, p)
        root = pow(root, lam, p)
        if is_primitive_root(root, 2 * n, p):
            return root
    raise RuntimeError("Couldn't find primitive root")


def is_primitive_root(a: int, n: int, p: int) -> bool:
    """x^n == 1 and x^(n/2) != 1 (native.rs:341-348; n a power of two)."""
    return pow(a, n, p) == 1 and pow(a, n // 2, p) != 1


@dataclass(frozen=True)
class NttOperator:
    """Precomputed NTT tables for one (modulus, size) pair (host, uint64)."""

    q: Modulus
    size: int
    omegas: np.ndarray  # (n,) u64, bit-reversed forward twiddles
    omegas_shoup: np.ndarray
    zetas_inv: np.ndarray  # (n,) u64, bit-reversed inverse twiddles
    zetas_inv_shoup: np.ndarray
    size_inv: int
    size_inv_shoup: int

    @staticmethod
    def new(q: Modulus, size: int) -> "NttOperator | None":
        if not supports_ntt(q.p, size):
            return None
        size_inv = q.inv(size)
        if size_inv is None:
            return None
        omega = primitive_root(size, q)
        omega_inv = q.inv(omega)

        powers = np.empty(size, dtype=np.uint64)
        powers_inv = np.empty(size, dtype=np.uint64)
        acc, acc_inv = 1, omega_inv
        for i in range(size):
            powers[i] = acc
            powers_inv[i] = acc_inv
            acc = (acc * omega) % q.p
            acc_inv = (acc_inv * omega_inv) % q.p

        rev = bitrev_indices(size)
        omegas = powers[rev]
        zetas_inv = powers_inv[rev]

        def shoup(v):
            return np.array([q.shoup(int(x)) for x in v], dtype=np.uint64)

        return NttOperator(
            q=q,
            size=size,
            omegas=omegas,
            omegas_shoup=shoup(omegas),
            zetas_inv=zetas_inv,
            zetas_inv_shoup=shoup(zetas_inv),
            size_inv=size_inv,
            size_inv_shoup=q.shoup(size_inv),
        )

    # Host-side exact transforms (golden reference for tests).
    def forward_host(self, a) -> np.ndarray:
        a = [int(x) for x in a]
        p = self.q.p
        n = self.size
        l, k = n >> 1, 1
        while l > 0:
            for start in range(0, n, 2 * l):
                w = int(self.omegas[k])
                k += 1
                for j in range(start, start + l):
                    x, y = a[j], a[j + l]
                    a[j] = (x + w * y) % p
                    a[j + l] = (x - w * y) % p
            l >>= 1
        return np.array(a, dtype=np.uint64)

    def backward_host(self, a) -> np.ndarray:
        a = [int(x) for x in a]
        p = self.q.p
        n = self.size
        l, k = 1, 0
        while l < n:
            for start in range(0, n, 2 * l):
                z = int(self.zetas_inv[k])
                k += 1
                for j in range(start, start + l):
                    x, y = a[j], a[j + l]
                    a[j] = (x + y) % p
                    a[j + l] = ((x - y) * z) % p
            l <<= 1
        return np.array([(x * self.size_inv) % p for x in a], dtype=np.uint64)


# ---------------------------------------------------------------------------
# Device transforms
# ---------------------------------------------------------------------------


def _split_planes(x):
    """(..., 2, n) -> pair of (..., n)."""
    return x[..., 0, :], x[..., 1, :]


def _merge_planes(lo, hi):
    return jnp.stack([lo, hi], axis=-2)


def _expand(c, extra: int):
    """Append `extra` singleton dims to each element of a constant pair."""
    idx = (...,) + (None,) * extra
    return c[0][idx], c[1][idx]


def forward(a, omegas, omegas_shoup, p_pair, p2_pair, lazy: bool = False):
    """Forward negacyclic NTT on (..., k, 2, n) data.

    Inputs must be < 4p (typically < p). Outputs < p, or < 4p if `lazy`
    (the key-switch decomposition path, native.rs:142-175).
    """
    n = a.shape[-1]
    x_lo, x_hi = _split_planes(a)
    w_lo, w_hi = _split_planes(omegas)
    ws_lo, ws_hi = _split_planes(omegas_shoup)
    lead = x_lo.shape[:-1]
    p3 = _expand(p_pair, 2)
    p2_3 = _expand(p2_pair, 2)

    l = n >> 1
    m = 1
    while l > 0:
        shape = lead + (m, 2, l)
        x_lo = x_lo.reshape(shape)
        x_hi = x_hi.reshape(shape)
        xl = (x_lo[..., :, 0, :], x_hi[..., :, 0, :])
        xr = (x_lo[..., :, 1, :], x_hi[..., :, 1, :])
        tw = (w_lo[..., m : 2 * m, None], w_hi[..., m : 2 * m, None])
        tws = (ws_lo[..., m : 2 * m, None], ws_hi[..., m : 2 * m, None])
        # Harvey butterfly (native.rs:256-269):
        #   x = reduce1(x, 2p); t = lazy_mul_shoup(y, w); y = x + 2p - t; x += t
        xl = zq.reduce1(xl, p2_3)
        t = zq.lazy_mul_shoup(xr, tw, tws, p3)
        new_r = u64.sub64(u64.add64(xl, p2_3), t)
        new_l = u64.add64(xl, t)
        x_lo = jnp.stack([new_l[0], new_r[0]], axis=-2).reshape(lead + (n,))
        x_hi = jnp.stack([new_l[1], new_r[1]], axis=-2).reshape(lead + (n,))
        l >>= 1
        m <<= 1

    out = (x_lo, x_hi)
    if not lazy:
        # reduce3: 4p -> 2p -> p (native.rs:238-243)
        p1 = _expand(p_pair, 1)
        p2 = _expand(p2_pair, 1)
        out = zq.reduce1(zq.reduce1(out, p2), p1)
    return _merge_planes(*out)


def backward(a, zetas_inv, zetas_inv_shoup, ninv_pair, ninv_shoup_pair, p_pair, p2_pair):
    """Inverse negacyclic NTT with final n^{-1} fold. Input < p, output < p.

    ninv_pair / ninv_shoup_pair: per-limb (k,) pairs for n^{-1} mod p.
    """
    n = a.shape[-1]
    x_lo, x_hi = _split_planes(a)
    z_lo, z_hi = _split_planes(zetas_inv)
    zs_lo, zs_hi = _split_planes(zetas_inv_shoup)
    lead = x_lo.shape[:-1]
    p3 = _expand(p_pair, 2)
    p2_3 = _expand(p2_pair, 2)

    l = 1
    k = 0
    while l < n:
        m = n // (2 * l)
        shape = lead + (m, 2, l)
        x_lo = x_lo.reshape(shape)
        x_hi = x_hi.reshape(shape)
        xl = (x_lo[..., :, 0, :], x_hi[..., :, 0, :])
        xr = (x_lo[..., :, 1, :], x_hi[..., :, 1, :])
        tz = (z_lo[..., k : k + m, None], z_hi[..., k : k + m, None])
        tzs = (zs_lo[..., k : k + m, None], zs_hi[..., k : k + m, None])
        # inv butterfly (native.rs:288-300):
        #   t = x; x = reduce1(y + t, 2p); y = lazy_mul_shoup(2p + t - y, z)
        t = xl
        new_l = zq.reduce1(u64.add64(xr, t), p2_3)
        diff = u64.sub64(u64.add64(t, p2_3), xr)
        new_r = zq.lazy_mul_shoup(diff, tz, tzs, p3)
        x_lo = jnp.stack([new_l[0], new_r[0]], axis=-2).reshape(lead + (n,))
        x_hi = jnp.stack([new_l[1], new_r[1]], axis=-2).reshape(lead + (n,))
        k += m
        l <<= 1

    p1 = _expand(p_pair, 1)
    ninv = _expand(ninv_pair, 1)
    ninv_s = _expand(ninv_shoup_pair, 1)
    out = zq.mul_shoup((x_lo, x_hi), ninv, ninv_s, p1)
    return _merge_planes(*out)


# ---------------------------------------------------------------------------
# Single-lane (w30) transforms for narrow moduli p < 2^30: one residue per
# uint32 lane, Shoup constants scaled by 2^32 (ops/zq32.py). Same stage
# structure and lazy bounds as above, 3-4x fewer lane operations.
# ---------------------------------------------------------------------------


def forward32(a, omegas, omegas_shoup32, p, p2, lazy: bool = False):
    """Forward negacyclic NTT on (..., k, n) uint32 data, moduli < 2^30.

    p / p2: (k,) uint32 arrays. Outputs < p, or < 4p if lazy.
    """
    from tpufhe.ops import zq32

    n = a.shape[-1]
    x = a
    lead = x.shape[:-1]
    p3 = p[..., None, None]
    p2_3 = p2[..., None, None]

    l = n >> 1
    m = 1
    while l > 0:
        shape = lead + (m, 2, l)
        x = x.reshape(shape)
        xl = x[..., :, 0, :]
        xr = x[..., :, 1, :]
        tw = omegas[..., m: 2 * m, None]
        tws = omegas_shoup32[..., m: 2 * m, None]
        xl = zq32.reduce1_32(xl, p2_3)
        t = zq32.lazy_mul_shoup32(xr, tw, tws, p3)
        new_r = xl + p2_3 - t
        new_l = xl + t
        x = jnp.stack([new_l, new_r], axis=-2).reshape(lead + (n,))
        l >>= 1
        m <<= 1

    if not lazy:
        p1 = p[..., None]
        x = zq32.reduce1_32(zq32.reduce1_32(x, p2[..., None]), p1)
    return x


def backward32(a, zetas_inv, zetas_inv_shoup32, ninv, ninv_shoup32, p, p2):
    """Inverse negacyclic NTT with n^{-1} fold, moduli < 2^30."""
    from tpufhe.ops import zq32

    n = a.shape[-1]
    x = a
    lead = x.shape[:-1]
    p3 = p[..., None, None]
    p2_3 = p2[..., None, None]

    l = 1
    k = 0
    while l < n:
        m = n // (2 * l)
        shape = lead + (m, 2, l)
        x = x.reshape(shape)
        xl = x[..., :, 0, :]
        xr = x[..., :, 1, :]
        tz = zetas_inv[..., k: k + m, None]
        tzs = zetas_inv_shoup32[..., k: k + m, None]
        new_l = zq32.reduce1_32(xr + xl, p2_3)
        new_r = zq32.lazy_mul_shoup32(xl + p2_3 - xr, tz, tzs, p3)
        x = jnp.stack([new_l, new_r], axis=-2).reshape(lead + (n,))
        k += m
        l <<= 1

    p1 = p[..., None]
    return zq32.mul_shoup32(x, ninv[..., None], ninv_shoup32[..., None], p1)
