"""Galois keys: key-switch s(x^i) -> s(x) (fhe/src/bfv/keys/galois_key.rs)."""

from __future__ import annotations

from tpufhe.bfv.ciphertext import Ciphertext
from tpufhe.bfv.keys.key_switching_key import KeySwitchingKey
from tpufhe.ops.rq import Poly, SubstitutionExponent, Switcher


class GaloisKey:
    def __init__(self, element: SubstitutionExponent, ksk: KeySwitchingKey):
        self.element = element
        self.ksk = ksk

    @staticmethod
    def new(sk, exponent: int, ciphertext_level: int, galois_key_level: int,
            rng) -> "GaloisKey":
        ctx_gk = sk.par.context_at_level(galois_key_level)
        ctx_ct = sk.par.context_at_level(ciphertext_level)
        element = SubstitutionExponent(ctx_ct, exponent)
        switcher_up = Switcher(ctx_ct, ctx_gk)
        s = Poly.from_i64_coeffs(sk.coeffs, ctx_ct)
        s_sub = s.substitute(element)
        s_sub_up = switcher_up.switch(s_sub)
        ksk = KeySwitchingKey.new(
            sk, s_sub_up, ciphertext_level, galois_key_level, rng
        )
        return GaloisKey(element, ksk)

    def relinearize(self, ct: Ciphertext) -> Ciphertext:
        """Apply x -> x^i homomorphically (galois_key.rs:62-87)."""
        assert len(ct) == 2
        c2 = ct[1].substitute(self.element).into_power_basis()
        c0, c1 = self.ksk.key_switch(c2)
        if c0.ctx is not ct[0].ctx:
            c0 = c0.into_power_basis().switch_down_to(ct[0].ctx).into_ntt()
            c1 = c1.into_power_basis().switch_down_to(ct[1].ctx).into_ntt()
        c0 = c0 + ct[0].substitute(self.element)
        return Ciphertext(ct.par, [c0, c1], self.ksk.ciphertext_level)

    # Serialize / DeserializeParametrized trait surface
    # (fhe-traits/src/lib.rs:128-154)
    def to_bytes(self) -> bytes:
        from tpufhe.serialize.codecs import serialize_galois_key

        return serialize_galois_key(self)

    @classmethod
    def from_bytes(cls, data: bytes, par) -> "GaloisKey":
        from tpufhe.serialize.codecs import deserialize_galois_key

        return deserialize_galois_key(data, par)


