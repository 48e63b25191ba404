"""Key-switching keys (fhe/src/bfv/keys/key_switching_key.rs).

Two decomposition modes, exactly as the reference:
- RNS-garner decomposition: c0_i = e_i - a_i*s + garner_i*from over the ksk
  context (key_switching_key.rs:126-169);
- single-modulus digit decomposition with log_base = ceil(log q0)/2
  (key_switching_key.rs:70-88, 172-211).

key_switch lifts each decomposition row into a lazy-NTT constant polynomial
(values < 4p) and accumulates (sum d_i*c0_i, sum d_i*c1_i) with Shoup
multiplications (key_switching_key.rs:214-289).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from tpufhe.bfv.parameters import BfvParameters
from tpufhe.ops.rns import RnsContext
from tpufhe.ops.rq import (
    NTT,
    NTT_SHOUP,
    POWER_BASIS,
    Poly,
    _lazy_const_ntt_fn,
    _scalar_mul_fn,
    pack_u64,
)
from tpufhe.utils.rngs import ChaCha8Rng, expand_seed
from tpufhe.utils.sampling import sample_vec_cbd
from tpufhe.errors import InvalidContext, TooFewValues


def _unstack(p: Poly, size: int) -> list:
    """Split a row-batched poly (size, k, planes, S, L) into row polys."""
    return [
        Poly(p.ctx, p.representation, p.coeffs[i],
             None if p.coeffs_shoup is None else p.coeffs_shoup[i])
        for i in range(size)
    ]


class KeySwitchingKey:
    def __init__(self, par, seed, c0, c1, ciphertext_level, ctx_ciphertext,
                 ksk_level, ctx_ksk, log_base=0):
        self.par = par
        self.seed = seed
        self.c0 = c0  # list[Poly NTT_SHOUP]
        self.c1 = c1  # list[Poly NTT_SHOUP]
        self.ciphertext_level = ciphertext_level
        self.ctx_ciphertext = ctx_ciphertext
        self.ksk_level = ksk_level
        self.ctx_ksk = ctx_ksk
        self.log_base = log_base

    @staticmethod
    def new(sk, from_poly: Poly, ciphertext_level: int, ksk_level: int, rng
            ) -> "KeySwitchingKey":
        par = sk.par
        ctx_ksk = par.context_at_level(ksk_level)
        ctx_ciphertext = par.context_at_level(ciphertext_level)
        if from_poly.ctx is not ctx_ksk:
            raise InvalidContext("Incorrect context for polynomial from")
        seed = rng.fill_bytes(32)

        if ctx_ksk.k == 1:
            modulus = ctx_ksk.moduli[0]
            log_modulus = _next_pow2_ilog2(modulus)
            log_base = log_modulus // 2
            size = -((-log_modulus) // log_base)
            c1 = KeySwitchingKey._generate_c1(ctx_ksk, seed, size)
            c0 = KeySwitchingKey._generate_c0_decomposition(
                sk, from_poly, c1, rng, log_base
            )
            return KeySwitchingKey(
                par, seed, c0, c1, ciphertext_level, ctx_ciphertext,
                ksk_level, ctx_ksk, log_base,
            )
        c1 = KeySwitchingKey._generate_c1(ctx_ksk, seed, ctx_ciphertext.k)
        c0 = KeySwitchingKey._generate_c0(sk, from_poly, c1, rng)
        return KeySwitchingKey(
            par, seed, c0, c1, ciphertext_level, ctx_ciphertext,
            ksk_level, ctx_ksk, 0,
        )

    @staticmethod
    def _generate_c1(ctx, seed: bytes, size: int) -> list:
        """Seed-chained uniform polys (key_switching_key.rs:108-123).

        All rows share ONE batched device program (sampling stays host-side
        and draws in exactly the per-row order of the reference)."""
        rng = ChaCha8Rng(seed)
        mats = []
        for _ in range(size):
            prng = expand_seed(rng.fill_bytes(32))
            mats.append(
                np.stack([q.random_vec(ctx.degree, prng) for q in ctx.q])
            )
        batched = Poly.from_u64_matrix(np.stack(mats), ctx, NTT_SHOUP)
        return _unstack(batched, size)

    @staticmethod
    def _generate_c0_scaled(sk, from_poly: Poly, c1: list, rng,
                            row_scalars: list) -> list:
        """b_i = e_i - a_i*s + row_scalars[i]*from, all rows in one batched
        program per op (error draws keep the reference's row order)."""
        size = len(c1)
        ctx = c1[0].ctx
        s = Poly.from_i64_coeffs(sk.coeffs, ctx).into_ntt()
        a = Poly(ctx, NTT, jnp.stack([p.coeffs for p in c1]))  # (size, ...)
        a_s = (a * s).into_power_basis()

        e_rows = [
            sample_vec_cbd(ctx.degree, sk.par.variance, rng)
            for _ in range(size)
        ]
        e = Poly(ctx, POWER_BASIS, jnp.stack([
            Poly.from_i64_coeffs(r, ctx).coeffs for r in e_rows
        ]))
        b = e - a_s

        # per-row scalar projected through the RNS: (size, k) constants
        sm = np.array(
            [[int(g) % m for m in ctx.moduli] for g in row_scalars],
            dtype=np.uint64,
        )
        if ctx.narrow:
            term = _scalar_mul_fn(ctx)(
                from_poly.coeffs,
                sm.astype(np.uint32),
                np.array([[q.shoup32(int(v)) for q, v in zip(ctx.q, row)]
                          for row in sm], dtype=np.uint32),
            )
        else:
            shoup = np.array(
                [[q.shoup(int(v)) for q, v in zip(ctx.q, row)] for row in sm],
                dtype=object,
            )

            def pairs(arr):
                a64 = np.array(
                    [[int(v) & 0xFFFFFFFFFFFFFFFF for v in row]
                     for row in arr], dtype=np.uint64)
                return ((a64 & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                        (a64 >> np.uint64(32)).astype(np.uint32))

            term = _scalar_mul_fn(ctx)(from_poly.coeffs, pairs(sm),
                                       pairs(shoup))
        b = b + Poly(ctx, POWER_BASIS, term)
        return _unstack(b.into_ntt_shoup(), size)

    @staticmethod
    def _generate_c0(sk, from_poly: Poly, c1: list, rng) -> list:
        if not c1:
            raise TooFewValues(0, 1)
        rns = RnsContext(list(sk.par.moduli[: len(c1)]))
        return KeySwitchingKey._generate_c0_scaled(
            sk, from_poly, c1, rng,
            [rns.get_garner(i) for i in range(len(c1))],
        )

    @staticmethod
    def _generate_c0_decomposition(sk, from_poly: Poly, c1: list, rng,
                                   log_base: int) -> list:
        if not c1:
            raise TooFewValues(0, 1)
        return KeySwitchingKey._generate_c0_scaled(
            sk, from_poly, c1, rng,
            [1 << (i * log_base) for i in range(len(c1))],
        )

    def key_switch(self, p: Poly) -> tuple:
        """(c0, c1) = sum_i decomp_i(p) * (ksk.c0_i, ksk.c1_i)."""
        if self.log_base != 0:
            return self._key_switch_decomposition(p)
        if p.ctx is not self.ctx_ciphertext:
            raise InvalidContext("The input polynomial does not have the correct context")
        assert p.representation == POWER_BASIS
        lift = _lazy_const_ntt_fn(self.ctx_ksk)
        c0 = Poly.zero(self.ctx_ksk, NTT)
        c1 = Poly.zero(self.ctx_ksk, NTT)
        for i in range(p.ctx.k):
            digits = p.coeffs[..., i, :, :, :]
            c2i = Poly(self.ctx_ksk, NTT, lift(digits), lazy=True)
            c0 = c0 + (c2i * self.c0[i])
            c1 = c1 + (c2i * self.c1[i])
        return c0, c1

    def _key_switch_decomposition(self, p: Poly) -> tuple:
        if p.ctx is not self.ctx_ciphertext:
            raise InvalidContext("The input polynomial does not have the correct context")
        log_modulus = _next_pow2_ilog2(p.ctx.moduli[0])
        ndigits = -((-log_modulus) // self.log_base)
        coeffs = p.to_u64_matrix()[..., 0, :]  # single limb
        mask = np.uint64((1 << self.log_base) - 1)
        lift = _lazy_const_ntt_fn(self.ctx_ksk)
        c0 = Poly.zero(self.ctx_ksk, NTT)
        c1 = Poly.zero(self.ctx_ksk, NTT)
        cur = coeffs.copy()
        for i in range(ndigits):
            digit = cur & mask
            cur = cur >> np.uint64(self.log_base)
            c2i = Poly(self.ctx_ksk, NTT, lift(pack_u64(digit)), lazy=True)
            c0 = c0 + (c2i * self.c0[i])
            c1 = c1 + (c2i * self.c1[i])
        return c0, c1

    # Serialize / DeserializeParametrized trait surface
    # (fhe-traits/src/lib.rs:128-154)
    def to_bytes(self) -> bytes:
        from tpufhe.serialize.codecs import serialize_ksk

        return serialize_ksk(self)

    @classmethod
    def from_bytes(cls, data: bytes, par) -> "KeySwitchingKey":
        from tpufhe.serialize.codecs import deserialize_ksk

        return deserialize_ksk(data, par)


def _next_pow2_ilog2(x: int) -> int:
    """ilog2 of next_power_of_two(x) (matches u64::next_power_of_two().ilog2())."""
    if x <= 1:
        return 0
    return (x - 1).bit_length()
