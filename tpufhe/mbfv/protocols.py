"""Multiparty BFV protocol shares (fhe/src/mbfv/*.rs).

Every share type carries the party's contribution as polynomials; `aggregate`
sums shares (mbfv/aggregate.rs:4-48). Protocols:

- PublicKeyShare      (Protocol 1 EncKeyGen,  public_key_gen.rs:16-79)
- RelinKeyGenerator   (Protocol 2 RelinKeyGen, 2 rounds, relin_key_gen.rs)
- SecretKeySwitchShare(Protocol 3 KeySwitch,  secret_key_switch.rs:24-110)
- DecryptionShare     (KeySwitch to the zero key, secret_key_switch.rs:118-193)
- PublicKeySwitchShare(Protocol 4 PubKeySwitch, public_key_switch.rs:18-109)
"""

from __future__ import annotations

import numpy as np

from tpufhe.bfv.ciphertext import Ciphertext
from tpufhe.bfv.keys.key_switching_key import KeySwitchingKey
from tpufhe.bfv.keys.relinearization_key import RelinearizationKey
from tpufhe.bfv.parameters import BfvParameters
from tpufhe.bfv.plaintext import Plaintext
from tpufhe.ops.rns import RnsContext
from tpufhe.ops.rq import NTT, Poly
from tpufhe.errors import (
    ContextMismatch,
    DimensionMismatch,
    InvalidCiphertext,
    TooFewValues,
    UnexpectedError,
    UnsupportedOperation,
)


def aggregate(shares: list):
    """Sum shares into the aggregate object (mbfv/aggregate.rs)."""
    shares = list(shares)
    if not shares:
        raise TooFewValues(0, 1)
    return shares[0]._aggregate(shares)


class CommonRandomPoly:
    """A uniform common reference polynomial (mbfv/crp.rs)."""

    def __init__(self, poly: Poly):
        self.poly = poly

    @staticmethod
    def new(par: BfvParameters, rng, level: int = 0) -> "CommonRandomPoly":
        ctx = par.context_at_level(level)
        return CommonRandomPoly(Poly.random(ctx, rng, NTT))

    @staticmethod
    def new_vec(par: BfvParameters, rng) -> list:
        return [CommonRandomPoly.new(par, rng) for _ in range(len(par.moduli))]


class PublicKeyShare:
    """p0_i = -a*s_i + e_i (public_key_gen.rs:33-57)."""

    def __init__(self, par, crp: CommonRandomPoly, p0_share: Poly):
        self.par = par
        self.crp = crp
        self.p0_share = p0_share

    @staticmethod
    def new(sk_share, crp: CommonRandomPoly, rng) -> "PublicKeyShare":
        par = sk_share.par
        ctx = par.context_at_level(0)
        s = Poly.from_i64_coeffs(sk_share.coeffs, ctx).into_ntt()
        e = Poly.small(ctx, par.variance, rng, NTT)
        p0 = ((-crp.poly) * s) + e
        return PublicKeyShare(par, crp, p0)

    def _aggregate(self, shares):
        from tpufhe.bfv.keys.public_key import PublicKey

        p0 = shares[0].p0_share
        for sh in shares[1:]:
            p0 = p0 + sh.p0_share
        ct = Ciphertext.new([p0, shares[0].crp.poly], shares[0].par)
        return PublicKey(shares[0].par, ct)


class SecretKeySwitchShare:
    """h_i = (s_in,i - s_out,i) * c1 + e (secret_key_switch.rs:39-88)."""

    def __init__(self, par, ct: Ciphertext, h_share: Poly):
        self.par = par
        self.ct = ct
        self.h_share = h_share

    @staticmethod
    def new(sk_input_share, sk_output_share, ct: Ciphertext, rng
            ) -> "SecretKeySwitchShare":
        if sk_input_share.par != sk_output_share.par or sk_output_share.par != ct.par:
            raise ContextMismatch("Incompatible BFV parameters")
        if len(ct) != 2:
            raise InvalidCiphertext("M-BFV only supports ciphertexts of length 2")
        par = sk_input_share.par
        ctx = ct[0].ctx
        s_in = Poly.from_i64_coeffs(sk_input_share.coeffs, ctx).into_ntt()
        s_out = Poly.from_i64_coeffs(sk_output_share.coeffs, ctx).into_ntt()
        e = Poly.small(ctx, par.variance, rng, NTT)
        h = ((s_in - s_out) * ct[1]) + e
        return SecretKeySwitchShare(par, ct, h)

    def _aggregate(self, shares):
        h = shares[0].h_share
        for sh in shares[1:]:
            h = h + sh.h_share
        c0 = shares[0].ct[0] + h
        c1 = shares[0].ct[1]
        return Ciphertext.new([c0, c1], shares[0].par)


class DecryptionShare:
    """KeySwitch to the zero key (secret_key_switch.rs:118-193)."""

    def __init__(self, sks_share: SecretKeySwitchShare):
        self.sks_share = sks_share

    @staticmethod
    def new(sk_input_share, ct: Ciphertext, rng) -> "DecryptionShare":
        from tpufhe.bfv.keys.secret_key import SecretKey

        par = sk_input_share.par
        zero = SecretKey(np.zeros(par.degree(), dtype=np.int64), par)
        return DecryptionShare(
            SecretKeySwitchShare.new(sk_input_share, zero, ct, rng)
        )

    def _aggregate(self, shares):
        ct = aggregate([s.sks_share for s in shares])
        par = ct.par
        # c1*s has already been folded into c0; only the t/q scale remains.
        c = ct[0].into_power_basis()
        ctx_lvl = par.context_level_at(ct.level)
        d = ctx_lvl.cipher_plain_context.scaler.scale(c)
        t = par.plaintext.value
        if par.plaintext.is_small:
            q0 = par.moduli[0]
            row0 = d.to_u64_matrix()[0]
            value = np.array(
                [((int(v) + t) % q0) % t for v in row0], dtype=np.uint64
            )
            poly = Poly.from_u64_coeffs(value, ct[0].ctx).into_ntt()
        else:
            q_plain = d.ctx.modulus()
            value = [((v + t) % q_plain) % t for v in d.lift_bigints()]
            poly = Poly.from_bigint_coeffs(value, ct[0].ctx).into_ntt()
        return Plaintext(par, value, None, poly, ct.level)


class PublicKeySwitchShare:
    """h0_i = u_i*pk0 + s_i*c1 + e0, h1_i = u_i*pk1 + e1
    (public_key_switch.rs:33-87)."""

    def __init__(self, par, c0: Poly, h0_share: Poly, h1_share: Poly):
        self.par = par
        self.c0 = c0
        self.h0_share = h0_share
        self.h1_share = h1_share

    @staticmethod
    def new(sk_share, public_key, ct: Ciphertext, rng) -> "PublicKeySwitchShare":
        if sk_share.par != public_key.par or public_key.par != ct.par:
            raise ContextMismatch("Incompatible BFV parameters")
        par = sk_share.par
        pk_ct = public_key.c
        if pk_ct.level != ct.level:
            pk_ct = pk_ct.clone()
            while pk_ct.level != ct.level:
                pk_ct.switch_down()
        ctx = par.context_at_level(ct.level)
        s = Poly.from_i64_coeffs(sk_share.coeffs, ctx).into_ntt()
        u = Poly.small(ctx, par.variance, rng, NTT)
        e0 = Poly.small(ctx, par.variance, rng, NTT)
        e1 = Poly.small(ctx, par.variance, rng, NTT)
        h0 = (pk_ct[0] * u) + (s * ct[1]) + e0
        h1 = (pk_ct[1] * u) + e1
        return PublicKeySwitchShare(par, ct[0], h0, h1)

    def _aggregate(self, shares):
        h0 = shares[0].h0_share
        h1 = shares[0].h1_share
        for sh in shares[1:]:
            h0 = h0 + sh.h0_share
            h1 = h1 + sh.h1_share
        c0 = shares[0].c0 + h0
        return Ciphertext.new([c0, h1], shares[0].par)


class RelinKeyShare:
    """Round shares of the 2-round RelinKeyGen (relin_key_gen.rs:19-358)."""

    def __init__(self, par, h0: list, h1: list, last_round=None, round_tag="r1"):
        self.par = par
        self.h0 = h0
        self.h1 = h1
        self.last_round = last_round
        self.round_tag = round_tag

    def _aggregate(self, shares):
        if self.round_tag == "r1":
            h0 = list(shares[0].h0)
            h1 = list(shares[0].h1)
            for sh in shares[1:]:
                h0 = [a + b for a, b in zip(h0, sh.h0)]
                h1 = [a + b for a, b in zip(h1, sh.h1)]
            return RelinKeyShare(shares[0].par, h0, h1, None, "r1_aggregated")
        # round 2 -> RelinearizationKey (relin_key_gen.rs:302-358)
        par = shares[0].par
        ctx = par.context_at_level(0)
        r1 = shares[0].last_round
        if r1 is None:
            raise UnexpectedError("Round-2 shares must carry the round-1 aggregation")
        h0 = list(shares[0].h0)
        h1 = list(shares[0].h1)
        for sh in shares[1:]:
            h0 = [a + b for a, b in zip(h0, sh.h0)]
            h1 = [a + b for a, b in zip(h1, sh.h1)]
        c0 = [(a + b).into_ntt_shoup() for a, b in zip(h0, h1)]
        c1 = [h.into_ntt_shoup() for h in r1.h1]
        ksk = KeySwitchingKey(
            par, None, c0, c1, 0, ctx, 0, ctx, log_base=0
        )
        return RelinearizationKey(ksk)


class RelinKeyGenerator:
    """Per-party generator for the 2-round protocol (relin_key_gen.rs:66-112)."""

    def __init__(self, sk_share, crp: list, rng):
        par = sk_share.par
        ctx = par.context_at_level(0)
        if ctx.k == 1:
            raise UnsupportedOperation("These parameters do not support key switching")
        if len(crp) != ctx.k:
            raise DimensionMismatch("CRP vector size must equal the number of moduli")
        self.sk_share = sk_share
        self.crp = crp
        ("u is sampled once and reused across rounds")
        self.u = Poly.small(ctx, par.variance, rng, NTT)

    def round_1(self, rng) -> RelinKeyShare:
        """h0_i = -a_j*u + garner_j*s + e;  h1_i = a_j*s + e
        (relin_key_gen.rs:141-197)."""
        par = self.sk_share.par
        ctx = par.context_at_level(0)
        s = Poly.from_i64_coeffs(self.sk_share.coeffs, ctx).into_ntt()
        rns = RnsContext(list(par.moduli[: len(self.crp)]))
        h0 = []
        for i, a in enumerate(self.crp):
            w = rns.get_garner(i)
            w_s = s.scalar_mul(w)
            e = Poly.small(ctx, par.variance, rng, NTT)
            h0.append(((-a.poly) * self.u) + w_s + e)
        h1 = []
        for a in self.crp:
            e = Poly.small(ctx, par.variance, rng, NTT)
            h1.append((a.poly * s) + e)
        return RelinKeyShare(par, h0, h1, None, "r1")

    def round_2(self, r1_aggregated: RelinKeyShare, rng) -> RelinKeyShare:
        """h0'_i = h0*s + e;  h1'_i = h1*(u - s) + e
        (relin_key_gen.rs:227-300)."""
        par = self.sk_share.par
        ctx = par.context_at_level(0)
        s = Poly.from_i64_coeffs(self.sk_share.coeffs, ctx).into_ntt()
        u_s = self.u - s
        h0 = []
        for h in r1_aggregated.h0:
            e = Poly.small(ctx, par.variance, rng, NTT)
            h0.append((h * s) + e)
        h1 = []
        for h in r1_aggregated.h1:
            e = Poly.small(ctx, par.variance, rng, NTT)
            h1.append((h * u_s) + e)
        return RelinKeyShare(par, h0, h1, r1_aggregated, "r2")
