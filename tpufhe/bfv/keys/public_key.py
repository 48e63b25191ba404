"""Public keys (fhe/src/bfv/keys/public_key.rs): pk = Enc_sk(0);
encrypt: c0 = u*pk0 + e1 + Delta*m, c1 = u*pk1 + e2."""

from __future__ import annotations

from tpufhe.bfv.ciphertext import Ciphertext
from tpufhe.bfv.encoding import Encoding
from tpufhe.bfv.parameters import BfvParameters
from tpufhe.bfv.plaintext import Plaintext
from tpufhe.ops.rq import NTT, Poly


class PublicKey:
    def __init__(self, par: BfvParameters, c: Ciphertext):
        self.par = par
        self.c = c

    @staticmethod
    def new(sk, rng) -> "PublicKey":
        zero = Plaintext.zero(Encoding.poly(), sk.par)
        c = sk.try_encrypt(zero, rng)
        return PublicKey(sk.par, c)

    def _encrypt_fn(self, level: int):
        if not hasattr(self, "_enc_fns"):
            self._enc_fns = {}
        if level not in self._enc_fns:
            from tpufhe.pipeline import make_pk_encrypt

            self._enc_fns[level] = make_pk_encrypt(self.par, level)
        return self._enc_fns[level]

    def try_encrypt(self, pt: Plaintext, rng) -> Ciphertext:
        ct = self.c
        if ct.level != pt.level:
            ct = ct.clone()
            while ct.level != pt.level:
                ct.switch_down()
        ctx = self.par.context_at_level(ct.level)
        # CBD draws in the reference's order (u, e1, e2), then ONE program
        from tpufhe.utils.sampling import sample_vec_cbd

        var = self.par.variance
        u = Poly.from_i64_coeffs(sample_vec_cbd(ctx.degree, var, rng), ctx)
        e1 = Poly.from_i64_coeffs(sample_vec_cbd(ctx.degree, var, rng), ctx)
        e2 = Poly.from_i64_coeffs(sample_vec_cbd(ctx.degree, var, rng), ctx)
        m = pt.to_poly()
        c0, c1 = self._encrypt_fn(ct.level)(
            u.coeffs, e1.coeffs, e2.coeffs, m.coeffs,
            ct[0].coeffs, ct[1].coeffs,
        )
        return Ciphertext(
            self.par,
            [Poly(ctx, NTT, c0), Poly(ctx, NTT, c1)],
            ct.level,
        )

    # Serialize / DeserializeParametrized trait surface
    # (fhe-traits/src/lib.rs:128-154)
    def to_bytes(self) -> bytes:
        from tpufhe.serialize.codecs import serialize_public_key

        return serialize_public_key(self)

    @classmethod
    def from_bytes(cls, data: bytes, par) -> "PublicKey":
        from tpufhe.serialize.codecs import deserialize_public_key

        return deserialize_public_key(data, par)


