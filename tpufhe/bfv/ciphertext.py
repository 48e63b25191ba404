"""BFV ciphertexts (fhe/src/bfv/ciphertext.rs).

A ciphertext is a list of NTT-representation polynomials (>= 2 parts; grows
under tensoring) plus a level and an optional 32-byte seed that regenerates
the last polynomial (fresh-ciphertext compression, ciphertext.rs:22-29).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from tpufhe.bfv.parameters import BfvParameters
from tpufhe.ops.rq import NTT, Poly
from tpufhe.errors import InvalidCiphertext, InvalidLevel, TooFewValues


@dataclass
class Ciphertext:
    par: BfvParameters
    c: list  # list[Poly] in NTT representation
    level: int
    seed: bytes | None = None

    @staticmethod
    def new(c: list, par: BfvParameters) -> "Ciphertext":
        if len(c) < 2:
            raise TooFewValues(len(c), 2)
        ctx = c[0].ctx
        level = par.level_of_context(ctx)
        for ci in c:
            if ci.ctx is not ctx:
                raise InvalidCiphertext("inconsistent contexts")
        return Ciphertext(par, list(c), level)

    @staticmethod
    def zero(par: BfvParameters) -> "Ciphertext":
        return Ciphertext(par, [], 0)

    def __len__(self):
        return len(self.c)

    def __getitem__(self, i):
        return self.c[i]

    def __setitem__(self, i, v):
        self.c[i] = v
        self.seed = None

    def truncate(self, n: int):
        self.c = self.c[:n]

    # operator parity with the reference (ops/mod.rs impl Add/Sub/Neg/Mul
    # for Ciphertext); lazy imports avoid the ciphertext <-> ops cycle
    def __add__(self, other):
        from tpufhe.bfv import ops

        if isinstance(other, Ciphertext):
            return ops.ct_add(self, other)
        return ops.ct_add_pt(self, other)

    def __sub__(self, other):
        from tpufhe.bfv import ops

        if isinstance(other, Ciphertext):
            return ops.ct_sub(self, other)
        return ops.ct_sub_pt(self, other)

    def __neg__(self):
        from tpufhe.bfv import ops

        return ops.ct_neg(self)

    def __mul__(self, other):
        from tpufhe.bfv import ops

        if isinstance(other, Ciphertext):
            return ops.ct_mul(self, other)
        return ops.ct_mul_pt(self, other)

    def max_switchable_level(self) -> int:
        return self.par.max_level()

    def switch_down(self):
        """Divide+round every part by the last modulus (ciphertext.rs:86-97)."""
        if self.level < self.max_switchable_level():
            self.seed = None
            self.c = [
                ci.into_power_basis().switch_down().into_ntt() for ci in self.c
            ]
            self.level += 1

    def switch_to_level(self, target: int):
        if target < self.level or target > self.max_switchable_level():
            raise InvalidLevel(target, self.level, self.max_switchable_level())
        while self.level < target:
            self.switch_down()

    def clone(self) -> "Ciphertext":
        return Ciphertext(self.par, list(self.c), self.level, self.seed)

    # Serialize / DeserializeParametrized trait surface
    # (fhe-traits/src/lib.rs:128-154)
    def to_bytes(self) -> bytes:
        from tpufhe.serialize.codecs import serialize_ciphertext

        return serialize_ciphertext(self)

    @classmethod
    def from_bytes(cls, data: bytes, par) -> "Ciphertext":
        from tpufhe.serialize.codecs import deserialize_ciphertext

        return deserialize_ciphertext(data, par)


