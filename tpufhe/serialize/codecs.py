"""Serializers/deserializers for every BFV object (wire-compatible).

Representation conventions follow the reference exactly:
- Rq messages always carry power-basis bit-packed coefficients plus the
  original representation tag (rq/convert.rs:17-42); deserialization converts
  back into the tagged representation.
- Ciphertext stores all-but-last polynomials, plus either the last polynomial
  or the 32-byte seed that regenerates it (ciphertext.rs:167-241).
- KeySwitchingKey stores c0 always and either c1 or the seed chain
  (key_switching_key.rs:332-420).
"""

from __future__ import annotations

import numpy as np

from tpufhe.bfv.ciphertext import Ciphertext
from tpufhe.bfv.keys.evaluation_key import EvaluationKey
from tpufhe.bfv.keys.galois_key import GaloisKey
from tpufhe.bfv.keys.key_switching_key import KeySwitchingKey
from tpufhe.bfv.keys.public_key import PublicKey
from tpufhe.bfv.keys.relinearization_key import RelinearizationKey
from tpufhe.bfv.keys.secret_key import SecretKey
from tpufhe.bfv.parameters import BfvParameters, BfvParametersBuilder
from tpufhe.bfv.rgsw import RGSWCiphertext
from tpufhe.ops.rq import NTT, NTT_SHOUP, POWER_BASIS, Context, Poly, SubstitutionExponent
from tpufhe.errors import SerializationError
from tpufhe.serialize.proto import (
    ProtoReader,
    emit_bytes_field,
    emit_packed_sint64,
    emit_packed_varints,
    emit_varint_field,
    parse_packed_varints,
    zigzag_decode,
)

_REPR_TO_PROTO = {POWER_BASIS: 1, NTT: 2, NTT_SHOUP: 3}
_PROTO_TO_REPR = {v: k for k, v in _REPR_TO_PROTO.items()}


# ---------------------------------------------------------------------------
# Rq (polynomials)
# ---------------------------------------------------------------------------


def serialize_poly(p: Poly) -> bytes:
    assert not p.lazy
    q = p if p.representation == POWER_BASIS else p.into_power_basis()
    mat = q.to_u64_matrix()
    assert mat.ndim == 2, "only unbatched polys serialize"
    payload = b"".join(
        qi.serialize_vec(mat[i]) for i, qi in enumerate(p.ctx.q)
    )
    out = b""
    out += emit_varint_field(1, _REPR_TO_PROTO[p.representation])
    out += emit_varint_field(2, p.ctx.degree)
    out += emit_bytes_field(3, payload)
    return out


def deserialize_poly(data: bytes, ctx: Context,
                     expected_representation: str | None = None) -> Poly:
    representation = 0
    degree = 0
    payload = b""
    for field, wire, v in ProtoReader(data):
        if field == 1:
            representation = v
        elif field == 2:
            degree = v
        elif field == 3:
            payload = v
    if representation not in _PROTO_TO_REPR:
        raise SerializationError("Invalid representation")
    rep = _PROTO_TO_REPR[representation]
    if degree % 8 != 0 or degree < 8 or degree != ctx.degree:
        raise SerializationError("Invalid degree")
    expected = sum(q.serialization_length(degree) for q in ctx.q)
    if len(payload) != expected:
        raise SerializationError("Invalid coefficients")
    if expected_representation is not None and rep != expected_representation:
        raise SerializationError("Representation mismatch")
    rows = []
    idx = 0
    for q in ctx.q:
        ln = q.serialization_length(degree)
        row = q.deserialize_vec(payload[idx : idx + ln])[:degree]
        if any(int(x) >= q.p for x in row):
            raise SerializationError("Coefficient out of range")
        rows.append(row)
        idx += ln
    p = Poly.from_u64_matrix(np.stack(rows), ctx, POWER_BASIS)
    if rep == NTT:
        p = p.into_ntt()
    elif rep == NTT_SHOUP:
        p = p.into_ntt_shoup()
    return p


# ---------------------------------------------------------------------------
# Ciphertext
# ---------------------------------------------------------------------------


def serialize_ciphertext(ct: Ciphertext) -> bytes:
    out = b""
    if ct.c:
        for poly in ct.c[:-1]:
            out += emit_bytes_field(1, serialize_poly(poly), always=True)
        if ct.seed is not None:
            out += emit_bytes_field(2, ct.seed)
        else:
            out += emit_bytes_field(1, serialize_poly(ct.c[-1]), always=True)
    out += emit_varint_field(3, ct.level)
    return out


def deserialize_ciphertext(data: bytes, par: BfvParameters) -> Ciphertext:
    c_bytes = []
    seed = b""
    level = 0
    for field, wire, v in ProtoReader(data):
        if field == 1:
            c_bytes.append(v)
        elif field == 2:
            seed = v
        elif field == 3:
            level = v
    if not c_bytes or (len(c_bytes) == 1 and not seed):
        raise SerializationError("Not enough polynomials")
    if level > par.max_level():
        raise SerializationError("Invalid level")
    ctx = par.context_at_level(level)
    c = [deserialize_poly(cb, ctx, NTT) for cb in c_bytes]
    seed_out = None
    if seed:
        if len(seed) != 32:
            raise SerializationError("Invalid seed size")
        seed_out = bytes(seed)
        c.append(Poly.random_from_seed(ctx, seed_out, NTT))
    return Ciphertext(par, c, level, seed=seed_out)


# ---------------------------------------------------------------------------
# Keys
# ---------------------------------------------------------------------------


def serialize_ksk(ksk: KeySwitchingKey) -> bytes:
    out = b""
    for c0 in ksk.c0:
        out += emit_bytes_field(1, serialize_poly(c0), always=True)
    if ksk.seed is None:
        for c1 in ksk.c1:
            out += emit_bytes_field(2, serialize_poly(c1), always=True)
    else:
        out += emit_bytes_field(3, ksk.seed)
    out += emit_varint_field(4, ksk.ciphertext_level)
    out += emit_varint_field(5, ksk.ksk_level)
    out += emit_varint_field(6, ksk.log_base)
    return out


def deserialize_ksk(data: bytes, par: BfvParameters) -> KeySwitchingKey:
    c0_bytes, c1_bytes = [], []
    seed = b""
    ciphertext_level = ksk_level = log_base = 0
    for field, wire, v in ProtoReader(data):
        if field == 1:
            c0_bytes.append(v)
        elif field == 2:
            c1_bytes.append(v)
        elif field == 3:
            seed = v
        elif field == 4:
            ciphertext_level = v
        elif field == 5:
            ksk_level = v
        elif field == 6:
            log_base = v
    ctx_ksk = par.context_at_level(ksk_level)
    ctx_ct = par.context_at_level(ciphertext_level)
    c0 = [deserialize_poly(b, ctx_ksk, NTT_SHOUP) for b in c0_bytes]
    seed_out = None
    if seed:
        if len(seed) != 32:
            raise SerializationError("Invalid seed size")
        seed_out = bytes(seed)
        c1 = KeySwitchingKey._generate_c1(ctx_ksk, seed_out, len(c0))
    else:
        c1 = [deserialize_poly(b, ctx_ksk, NTT_SHOUP) for b in c1_bytes]
    if len(c0) != len(c1):
        raise SerializationError("Invalid c0/c1 sizes")
    return KeySwitchingKey(
        par, seed_out, c0, c1, ciphertext_level, ctx_ct, ksk_level, ctx_ksk,
        log_base,
    )


def serialize_relinearization_key(rk: RelinearizationKey) -> bytes:
    return emit_bytes_field(1, serialize_ksk(rk.ksk), always=True)


def deserialize_relinearization_key(data: bytes, par) -> RelinearizationKey:
    for field, wire, v in ProtoReader(data):
        if field == 1:
            return RelinearizationKey(deserialize_ksk(v, par))
    raise SerializationError("Invalid serialization")


def serialize_galois_key(gk: GaloisKey) -> bytes:
    out = emit_bytes_field(1, serialize_ksk(gk.ksk), always=True)
    out += emit_varint_field(2, gk.element.exponent)
    return out


def deserialize_galois_key(data: bytes, par) -> GaloisKey:
    ksk = None
    exponent = 0
    for field, wire, v in ProtoReader(data):
        if field == 1:
            ksk = deserialize_ksk(v, par)
        elif field == 2:
            exponent = v
    if ksk is None:
        raise SerializationError("Invalid serialization")
    element = SubstitutionExponent(ksk.ctx_ciphertext, exponent)
    return GaloisKey(element, ksk)


def serialize_evaluation_key(ek: EvaluationKey) -> bytes:
    out = b""
    for gk in ek.gk.values():
        out += emit_bytes_field(2, serialize_galois_key(gk), always=True)
    out += emit_varint_field(3, ek.ciphertext_level)
    out += emit_varint_field(4, ek.evaluation_key_level)
    return out


def deserialize_evaluation_key(data: bytes, par) -> EvaluationKey:
    gks = []
    ciphertext_level = evaluation_key_level = 0
    for field, wire, v in ProtoReader(data):
        if field == 2:
            gks.append(deserialize_galois_key(v, par))
        elif field == 3:
            ciphertext_level = v
        elif field == 4:
            evaluation_key_level = v
    gk = {}
    for k in gks:
        if k.ksk.ciphertext_level != ciphertext_level:
            raise SerializationError("Galois key has incorrect ciphertext level")
        if k.ksk.ksk_level != evaluation_key_level:
            raise SerializationError("Galois key has incorrect evaluation key level")
        gk[k.element.exponent] = k
    ctx = par.context_at_level(ciphertext_level)
    monomials = []
    for l in range(par.degree().bit_length() - 1):
        coeffs = [0] * par.degree()
        coeffs[par.degree() - (1 << l)] = -1
        monomials.append(Poly.from_i64_coeffs(coeffs, ctx).into_ntt_shoup())
    return EvaluationKey(
        par, ciphertext_level, evaluation_key_level, gk,
        EvaluationKey.construct_rot_to_gk_exponent(par), monomials,
    )


def serialize_public_key(pk: PublicKey) -> bytes:
    return emit_bytes_field(1, serialize_ciphertext(pk.c), always=True)


def deserialize_public_key(data: bytes, par) -> PublicKey:
    for field, wire, v in ProtoReader(data):
        if field == 1:
            c = deserialize_ciphertext(v, par)
            if c.level != 0:
                raise SerializationError("ciphertext level must be 0")
            return PublicKey(par, c)
    raise SerializationError("Missing field c")


def serialize_secret_key(sk: SecretKey) -> bytes:
    return emit_packed_sint64(1, [int(c) for c in sk.coeffs])


def deserialize_secret_key(data: bytes, par) -> SecretKey:
    coeffs = []
    for field, wire, v in ProtoReader(data):
        if field == 1:
            if wire == 2:
                coeffs.extend(zigzag_decode(x) for x in parse_packed_varints(v))
            else:
                coeffs.append(zigzag_decode(v))
    if len(coeffs) != par.degree():
        raise SerializationError("SecretKey length mismatch")
    return SecretKey(np.array(coeffs, dtype=np.int64), par)


def serialize_rgsw(ct: RGSWCiphertext) -> bytes:
    out = emit_bytes_field(1, serialize_ksk(ct.ksk0), always=True)
    out += emit_bytes_field(2, serialize_ksk(ct.ksk1), always=True)
    return out


def deserialize_rgsw(data: bytes, par) -> RGSWCiphertext:
    ksk0 = ksk1 = None
    for field, wire, v in ProtoReader(data):
        if field == 1:
            ksk0 = deserialize_ksk(v, par)
        elif field == 2:
            ksk1 = deserialize_ksk(v, par)
    if ksk0 is None or ksk1 is None:
        raise SerializationError("Missing ksk")
    if (ksk0.ksk_level != ksk0.ciphertext_level
            or ksk0.ciphertext_level != ksk1.ciphertext_level
            or ksk1.ciphertext_level != ksk1.ksk_level):
        raise SerializationError("Inconsistent key switching levels")
    return RGSWCiphertext(ksk0, ksk1)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def serialize_parameters(par: BfvParameters) -> bytes:
    # Field order matches prost's encode_raw: regular fields in number
    # order, then the oneof LAST (prost-build places oneofs after the
    # struct's scalar fields), i.e. 1, 2, 4, then 3|5. Parsing is
    # order-independent either way (proto3).
    out = emit_varint_field(1, par.polynomial_degree)
    out += emit_packed_varints(2, par.moduli)
    out += emit_varint_field(4, par.variance)
    t = par.plaintext.value
    if par.plaintext.is_small:
        # oneof: always emitted, even when zero
        from tpufhe.serialize.proto import encode_varint, tag

        out += tag(3, 0) + encode_varint(t)
    else:
        nbytes = (t.bit_length() + 7) // 8
        out += emit_bytes_field(5, t.to_bytes(nbytes, "little"), always=True)
    return out


def deserialize_parameters(data: bytes) -> BfvParameters:
    degree = variance = 0
    moduli = []
    t = None
    for field, wire, v in ProtoReader(data):
        if field == 1:
            degree = v
        elif field == 2:
            if wire == 2:
                moduli.extend(parse_packed_varints(v))
            else:
                moduli.append(v)
        elif field == 3:
            t = v
        elif field == 5:
            t = int.from_bytes(v, "little")
        elif field == 4:
            variance = v
    if t is None:
        raise SerializationError("Missing plaintext modulus")
    return (
        BfvParametersBuilder()
        .set_degree(degree)
        .set_plaintext_modulus(t)
        .set_moduli(moduli)
        .set_variance(variance)
        .build()
    )
