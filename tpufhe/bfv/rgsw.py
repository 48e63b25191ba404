"""RGSW ciphertexts and the external product (fhe/src/bfv/rgsw_ciphertext.rs).

An RGSW ciphertext is a pair of key-switching keys (of m and m*s); the
external product ct (x) RGSW is two key-switch applications — a
noise-additive multiplication.
"""

from __future__ import annotations

from tpufhe.bfv.ciphertext import Ciphertext
from tpufhe.bfv.keys.key_switching_key import KeySwitchingKey
from tpufhe.bfv.plaintext import Plaintext
from tpufhe.ops.rq import Poly


class RGSWCiphertext:
    def __init__(self, ksk0: KeySwitchingKey, ksk1: KeySwitchingKey):
        self.ksk0 = ksk0
        self.ksk1 = ksk1

    @staticmethod
    def encrypt(sk, pt: Plaintext, rng) -> "RGSWCiphertext":
        """rgsw_ciphertext.rs:96-121."""
        level = pt.level
        ctx = sk.par.context_at_level(level)
        m = pt.poly_ntt.into_power_basis()
        s = Poly.from_i64_coeffs(sk.coeffs, ctx).into_ntt()
        m_s = (s * pt.poly_ntt).into_power_basis()
        ksk0 = KeySwitchingKey.new(sk, m, level, level, rng)
        ksk1 = KeySwitchingKey.new(sk, m_s, level, level, rng)
        return RGSWCiphertext(ksk0, ksk1)

    def external_product(self, ct: Ciphertext) -> Ciphertext:
        """ct (x) RGSW (rgsw_ciphertext.rs:123-157)."""
        assert ct.par == self.ksk0.par
        assert ct.level == self.ksk0.ciphertext_level
        assert len(ct) == 2
        ct0 = ct[0].into_power_basis()
        ct1 = ct[1].into_power_basis()
        c0, c1 = self.ksk0.key_switch(ct0)
        c0p, c1p = self.ksk1.key_switch(ct1)
        return Ciphertext(ct.par, [c0 + c0p, c1 + c1p], ct.level)

    # Serialize / DeserializeParametrized trait surface
    # (fhe-traits/src/lib.rs:128-154)
    def to_bytes(self) -> bytes:
        from tpufhe.serialize.codecs import serialize_rgsw

        return serialize_rgsw(self)

    @classmethod
    def from_bytes(cls, data: bytes, par) -> "RGSWCiphertext":
        from tpufhe.serialize.codecs import deserialize_rgsw

        return deserialize_rgsw(data, par)


