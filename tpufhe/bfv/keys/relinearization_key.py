"""Relinearization keys: key-switch s^2 -> s
(fhe/src/bfv/keys/relinearization_key.rs)."""

from __future__ import annotations

from tpufhe.bfv.ciphertext import Ciphertext
from tpufhe.bfv.keys.key_switching_key import KeySwitchingKey
from tpufhe.ops.rq import Poly, Switcher
from tpufhe.errors import InvalidCiphertext, InvalidLevel, UnsupportedOperation


class RelinearizationKey:
    def __init__(self, ksk: KeySwitchingKey):
        self.ksk = ksk

    @staticmethod
    def new(sk, rng, ciphertext_level: int = 0, key_level: int = 0
            ) -> "RelinearizationKey":
        ctx_relin = sk.par.context_at_level(key_level)
        ctx_ct = sk.par.context_at_level(ciphertext_level)
        if ctx_relin.k == 1:
            raise UnsupportedOperation("These parameters do not support key switching")
        s = Poly.from_i64_coeffs(sk.coeffs, ctx_ct).into_ntt()
        s2 = (s * s).into_power_basis()
        switcher_up = Switcher(ctx_ct, ctx_relin)
        s2_up = switcher_up.switch(s2)
        ksk = KeySwitchingKey.new(sk, s2_up, ciphertext_level, key_level, rng)
        return RelinearizationKey(ksk)

    def relinearizes(self, ct: Ciphertext):
        """In place: (c0, c1, c2) -> (c0 + ks0, c1 + ks1)
        (relinearization_key.rs:71-98)."""
        if len(ct) != 3:
            raise InvalidCiphertext("Only size-3 ciphertexts can be relinearized")
        if ct.level != self.ksk.ciphertext_level:
            raise InvalidLevel(ct.level)
        c2 = ct[2].into_power_basis()
        c0, c1 = self.relinearizes_poly(c2)
        if c0.ctx is not ct[0].ctx:
            c0 = c0.into_power_basis().switch_down_to(ct[0].ctx).into_ntt()
            c1 = c1.into_power_basis().switch_down_to(ct[1].ctx).into_ntt()
        ct[0] = ct[0] + c0
        ct[1] = ct[1] + c1
        ct.truncate(2)

    def relinearizes_poly(self, c2: Poly):
        return self.ksk.key_switch(c2)

    # Serialize / DeserializeParametrized trait surface
    # (fhe-traits/src/lib.rs:128-154)
    def to_bytes(self) -> bytes:
        from tpufhe.serialize.codecs import serialize_relinearization_key

        return serialize_relinearization_key(self)

    @classmethod
    def from_bytes(cls, data: bytes, par) -> "RelinearizationKey":
        from tpufhe.serialize.codecs import deserialize_relinearization_key

        return deserialize_relinearization_key(data, par)


