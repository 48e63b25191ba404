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

    def try_encrypt(self, pt: Plaintext, rng) -> Ciphertext:
        ct = self.c
        if ct.level != pt.level:
            ct = ct.clone()
            while ct.level != pt.level:
                ct.switch_down()
        ctx = self.par.context_at_level(ct.level)
        u = Poly.small(ctx, self.par.variance, rng, NTT)
        e1 = Poly.small(ctx, self.par.variance, rng, NTT)
        e2 = Poly.small(ctx, self.par.variance, rng, NTT)
        m = pt.to_poly()
        c0 = (u * ct[0]) + e1 + m
        c1 = (u * ct[1]) + e2
        return Ciphertext(self.par, [c0, c1], ct.level)
