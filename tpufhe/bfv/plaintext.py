"""Plaintexts and encode/decode (fhe/src/bfv/{plaintext,plaintext_vec}.rs).

SIMD encoding is the SEAL batch encoder: apply the matrix_reps permutation,
then an inverse NTT over Z_t (plaintext_vec.rs:174-234); decoding is the
forward NTT followed by the permutation (plaintext.rs:310-407). Both run as
single-limb device NTTs over the plaintext modulus.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from tpufhe.bfv.encoding import Encoding, POLY, SIMD
from tpufhe.bfv.parameters import BfvParameters
from tpufhe.ops.rq import NTT, POWER_BASIS, Poly, pack_u64
from tpufhe.errors import EncodingMismatch, SimdNotSupported, TooManyValues


@dataclass
class Plaintext:
    """An encoded plaintext (value + cached NTT polynomial + level)."""

    par: BfvParameters
    value: np.ndarray | list  # uint64 array (small t) or list[int] (large t)
    encoding: Encoding | None
    poly_ntt: Poly
    level: int

    def __eq__(self, other):
        if not isinstance(other, Plaintext):
            return NotImplemented
        if isinstance(self.value, np.ndarray) and isinstance(other.value, np.ndarray):
            values_eq = bool(np.array_equal(self.value, other.value))
        else:
            values_eq = [int(v) for v in self.value] == [
                int(v) for v in other.value
            ]
        enc_eq = (
            self.encoding == other.encoding
            if (self.encoding is not None and other.encoding is not None)
            else True
        )
        return (
            self.par == other.par
            and values_eq
            and self.level == other.level
            and enc_eq
        )

    # -- construction --

    @staticmethod
    def zero(encoding: Encoding, par: BfvParameters) -> "Plaintext":
        ctx = par.context_at_level(encoding.level)
        if par.plaintext.is_small:
            value = np.zeros(par.degree(), dtype=np.uint64)
        else:
            value = [0] * par.degree()
        return Plaintext(par, value, encoding, Poly.zero(ctx, NTT), encoding.level)

    # -- the Delta*m polynomial (plaintext.rs:71-98) --

    def to_poly(self) -> Poly:
        ctx_lvl = self.par.context_level_at(self.level)
        q_mod_t = ctx_lvl.cipher_plain_context.q_mod_t
        t = self.par.plaintext.value
        if isinstance(self.value, np.ndarray):
            m_v = np.array(
                [(int(v) * q_mod_t) % t for v in self.value], dtype=np.uint64
            )
            m = Poly.from_u64_coeffs(m_v, ctx_lvl.poly_context)
        else:
            m_v = [(int(v) * q_mod_t) % t for v in self.value]
            m = Poly.from_bigint_coeffs(m_v, ctx_lvl.poly_context)
        return m.into_ntt() * ctx_lvl.cipher_plain_context.delta

    # -- encoding (plaintext_vec.rs) --

    @staticmethod
    def try_encode(values, encoding: Encoding, par: BfvParameters) -> "Plaintext":
        values = list(values)
        if len(values) > par.degree():
            raise TooManyValues(len(values), par.degree())
        return PlaintextVec.try_encode(values, encoding, par)[0]

    @staticmethod
    def try_encode_i64(values, encoding: Encoding, par: BfvParameters) -> "Plaintext":
        t = par.plaintext.value
        reduced = [int(v) % t for v in values]
        return Plaintext.try_encode(reduced, encoding, par)

    # -- decoding (plaintext.rs:270-447) --

    def try_decode(self, encoding: Encoding | None = None) -> np.ndarray | list:
        if self.encoding is None and encoding is None:
            raise EncodingMismatch("none", "an encoding")
        enc = self.encoding if self.encoding is not None else encoding
        if encoding is not None and enc != encoding:
            raise EncodingMismatch(enc, encoding)

        if isinstance(self.value, np.ndarray):
            w = self.value.copy()
        else:
            w = list(self.value)
        if enc.encoding == POLY:
            return w
        # SIMD: forward plaintext NTT then permutation
        if self.par.ntt_operator is None:
            raise SimdNotSupported("no plaintext NTT for these parameters")
        ntt_ctx = self.par.ntt_operator
        arr = np.asarray(w, dtype=np.uint64)[None, :]  # (1, N)
        p = Poly.from_u64_matrix(arr, ntt_ctx, POWER_BASIS).into_ntt()
        w_ntt = p.to_u64_matrix()[0]
        return w_ntt[self.par.matrix_reps_index_map]

    def try_decode_i64(self, encoding: Encoding | None = None) -> np.ndarray:
        v = self.try_decode(encoding)
        t = self.par.plaintext.value
        out = np.empty(len(v), dtype=np.int64)
        for i, x in enumerate(v):
            x = int(x)
            out[i] = x - t if x >= (t >> 1) else x
        return out


class PlaintextVec(list):
    """Auto-chunking encoder (plaintext_vec.rs:19-234)."""

    @staticmethod
    def try_encode(values, encoding: Encoding, par: BfvParameters) -> "PlaintextVec":
        values = [int(v) for v in values]
        if not values:
            return PlaintextVec([Plaintext.zero(encoding, par)])
        if encoding.encoding == SIMD and par.ntt_operator is None:
            raise SimdNotSupported("no plaintext NTT for these parameters")
        n = par.degree()
        ctx = par.context_at_level(encoding.level)
        num = -((-len(values)) // n)
        out = []
        for c in range(num):
            chunk = values[c * n : min(len(values), (c + 1) * n)]
            if par.plaintext.is_small:
                v = np.zeros(n, dtype=np.uint64)
                if encoding.encoding == POLY:
                    v[: len(chunk)] = np.asarray(chunk, dtype=np.uint64)
                else:
                    for i, x in enumerate(chunk):
                        v[par.matrix_reps_index_map[i]] = x
                    # inverse plaintext NTT
                    ntt_ctx = par.ntt_operator
                    p = Poly(
                        ntt_ctx, NTT, np.asarray(pack_u64(v[None, :]))
                    ).into_power_basis()
                    v = p.to_u64_matrix()[0]
                poly = Poly.from_u64_coeffs(v, ctx).into_ntt()
                value = v
            else:
                if encoding.encoding == SIMD:
                    raise SimdNotSupported("large plaintext modulus")
                value = [0] * n
                value[: len(chunk)] = chunk
                poly = Poly.from_bigint_coeffs(value, ctx).into_ntt()
            out.append(Plaintext(par, value, encoding, poly, encoding.level))
        return PlaintextVec(out)
