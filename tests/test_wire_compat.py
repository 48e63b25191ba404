"""Wire-format cross-validation against the official protobuf runtime.

The hand-rolled proto3 codecs (tpufhe/serialize/) claim byte-level
compatibility with the reference wire formats
(/root/reference/crates/fhe-math/src/proto/rq.proto and
/root/reference/crates/fhe/src/proto/bfv.proto, encoded by prost).
These tests pin that claim with an INDEPENDENT encoder: protoc compiles
the reference's own .proto schemas and the google.protobuf runtime
(a separate proto3 implementation) re-encodes/parses every object.

For each object we assert, in both directions:
  1. our bytes parse under the official runtime against the reference
     schema, and re-serializing the parsed message reproduces our bytes
     byte-for-byte (both prost and python-protobuf emit fields in
     field-number order and omit proto3 defaults, so canonical objects
     are byte-identical);
  2. bytes produced by the official runtime decode through our codecs
     to an equal object.

Skipped when protoc or the reference checkout is unavailable (the
package itself never depends on either).
"""

import shutil
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from tpufhe.bfv import (
    BfvParameters,
    EvaluationKeyBuilder,
    PublicKey,
    RGSWCiphertext,
    RelinearizationKey,
    SecretKey,
)
from tpufhe.ops.rq import NTT, POWER_BASIS, Poly
from tpufhe.serialize import (
    deserialize_ciphertext,
    deserialize_evaluation_key,
    deserialize_parameters,
    deserialize_poly,
    deserialize_public_key,
    deserialize_relinearization_key,
    deserialize_rgsw,
    deserialize_secret_key,
    serialize_ciphertext,
    serialize_evaluation_key,
    serialize_parameters,
    serialize_poly,
    serialize_public_key,
    serialize_relinearization_key,
    serialize_rgsw,
    serialize_secret_key,
)
from tpufhe.utils.rngs import ChaCha8Rng, seed_from_u64

RQ_PROTO = "/root/reference/crates/fhe-math/src/proto/rq.proto"
BFV_PROTO = "/root/reference/crates/fhe/src/proto/bfv.proto"

try:
    import google.protobuf  # noqa: F401

    _HAVE_RUNTIME = True
except ImportError:  # pragma: no cover
    _HAVE_RUNTIME = False

pytestmark = pytest.mark.skipif(
    not (
        _HAVE_RUNTIME
        and shutil.which("protoc")
        and __import__("os").path.exists(RQ_PROTO)
        and __import__("os").path.exists(BFV_PROTO)
    ),
    reason="needs protoc + google.protobuf + the reference schemas",
)

RNG = np.random.default_rng(20260817)


def rng():
    return ChaCha8Rng(seed_from_u64(int(RNG.integers(0, 1 << 63))))


@pytest.fixture(scope="module")
def pb():
    """Compile the reference schemas; import the generated modules."""
    tmp = tempfile.mkdtemp(prefix="tpufhe_pb_")
    import os

    for proto in (RQ_PROTO, BFV_PROTO):
        subprocess.run(
            ["protoc", f"--python_out={tmp}", "-I", os.path.dirname(proto),
             proto],
            check=True,
        )
    sys.path.insert(0, tmp)
    try:
        import bfv_pb2
        import rq_pb2

        yield {"rq": rq_pb2, "bfv": bfv_pb2}
    finally:
        sys.path.remove(tmp)
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.fixture(scope="module")
def par():
    return BfvParameters.default(2, 16)


def _reencode(msg_cls, data: bytes) -> bytes:
    """Parse `data` under the official runtime, serialize it back."""
    m = msg_cls()
    m.ParseFromString(data)
    # proto3 parse must consume everything (no unknown trailing junk)
    assert m.ByteSize() <= len(data)
    return m.SerializeToString()


def test_poly_wire(par, pb):
    ctx = par.context_at_level(0)
    for rep, tag in ((POWER_BASIS, 1), (NTT, 2)):
        p = Poly.random(ctx, rng(), rep)
        ours = serialize_poly(p)
        m = pb["rq"].Rq()
        m.ParseFromString(ours)
        assert m.representation == tag
        assert m.degree == ctx.degree
        assert len(m.coefficients) == sum(
            q.serialization_length(ctx.degree) for q in ctx.q
        )
        assert m.SerializeToString() == ours
        # official-runtime bytes decode through our codec
        q = deserialize_poly(m.SerializeToString(), ctx, rep)
        np.testing.assert_array_equal(p.to_u64_matrix(), q.to_u64_matrix())


def test_ciphertext_wire(par, pb):
    from tpufhe.bfv import Encoding, Plaintext

    sk = SecretKey.random(par, rng())
    v = RNG.integers(0, int(par.plaintext.value), size=par.degree(),
                     dtype=np.uint64)
    pt = Plaintext.try_encode(v, Encoding.poly(), par)
    ct = sk.try_encrypt(pt, rng())  # fresh: carries a c1 seed
    ours = serialize_ciphertext(ct)
    m = pb["bfv"].Ciphertext()
    m.ParseFromString(ours)
    assert len(m.c) == 1 and len(m.seed) == 32 and m.level == 0
    assert m.SerializeToString() == ours
    back = deserialize_ciphertext(m.SerializeToString(), par)
    for a, b in zip(ct.c, back.c):
        np.testing.assert_array_equal(a.to_u64_matrix(), b.to_u64_matrix())

    # seedless path: both polynomials on the wire
    ct2 = ct + ct
    ours2 = serialize_ciphertext(ct2)
    m2 = pb["bfv"].Ciphertext()
    m2.ParseFromString(ours2)
    assert len(m2.c) == 2 and not m2.seed
    assert m2.SerializeToString() == ours2


def test_secret_key_wire(par, pb):
    sk = SecretKey.random(par, rng())
    ours = serialize_secret_key(sk)
    m = pb["bfv"].SecretKey()
    m.ParseFromString(ours)
    np.testing.assert_array_equal(np.array(m.coeffs), sk.coeffs)
    assert m.SerializeToString() == ours
    # build from scratch with the official runtime
    m3 = pb["bfv"].SecretKey()
    m3.coeffs.extend(int(c) for c in sk.coeffs)
    back = deserialize_secret_key(m3.SerializeToString(), par)
    np.testing.assert_array_equal(back.coeffs, sk.coeffs)


def test_public_key_wire(par, pb):
    pk = PublicKey.new(SecretKey.random(par, rng()), rng())
    ours = serialize_public_key(pk)
    assert _reencode(pb["bfv"].PublicKey, ours) == ours
    back = deserialize_public_key(ours, par)
    for a, b in zip(pk.c.c, back.c.c):
        np.testing.assert_array_equal(a.to_u64_matrix(), b.to_u64_matrix())


def test_relin_galois_evaluation_keys_wire(par, pb):
    sk = SecretKey.random(par, rng())
    rk = RelinearizationKey.new(sk, rng())
    ours = serialize_relinearization_key(rk)
    m = pb["bfv"].RelinearizationKey()
    m.ParseFromString(ours)
    assert len(m.ksk.c0) == len(rk.ksk.c0)
    assert len(m.ksk.seed) == 32
    assert m.SerializeToString() == ours
    deserialize_relinearization_key(ours, par)

    ek = (EvaluationKeyBuilder(sk).enable_inner_sum()
          .enable_expansion(2).build(rng()))
    ours = serialize_evaluation_key(ek)
    m = pb["bfv"].EvaluationKey()
    m.ParseFromString(ours)
    assert len(m.gk) == len(ek.gk)
    for gk_msg in m.gk:
        assert gk_msg.exponent in ek.gk
    assert m.SerializeToString() == ours
    deserialize_evaluation_key(ours, par)


def test_rgsw_wire(par, pb):
    from tpufhe.bfv import Encoding, Plaintext

    sk = SecretKey.random(par, rng())
    v = RNG.integers(0, int(par.plaintext.value), size=par.degree(),
                     dtype=np.uint64)
    pt = Plaintext.try_encode(v, Encoding.poly(), par)
    rg = RGSWCiphertext.encrypt(sk, pt, rng())
    ours = serialize_rgsw(rg)
    assert _reencode(pb["bfv"].RGSWCiphertext, ours) == ours
    deserialize_rgsw(ours, par)


def _tag_order(data: bytes) -> list[int]:
    """Top-level field numbers of a wire message, in emission order."""
    from tpufhe.serialize.proto import ProtoReader

    return [f for f, _, _ in ProtoReader(data)]


def test_parameters_wire_small_and_big_t(pb):
    # NOTE on byte order: prost (the reference encoder) emits the oneof
    # LAST (struct order: 1, 2, 4, then 3|5) while python-protobuf emits
    # strictly by field number (1, 2, 3|5, 4). Both parse identically;
    # we match prost byte-for-byte and cross-check with the official
    # runtime via parse-equivalence.
    par = BfvParameters.default(2, 16)
    ours = serialize_parameters(par)
    assert _tag_order(ours) == [1, 2, 4, 3]  # prost emission order
    m = pb["bfv"].Parameters()
    m.ParseFromString(ours)
    assert m.degree == par.polynomial_degree
    assert list(m.moduli) == list(par.moduli)
    assert m.WhichOneof("plaintext_modulus") == "plaintext"
    assert m.plaintext == int(par.plaintext.value)
    assert m.variance == par.variance
    # official-runtime bytes decode through our codec
    back = deserialize_parameters(m.SerializeToString())
    assert back.polynomial_degree == par.polynomial_degree
    assert list(back.moduli) == list(par.moduli)
    assert int(back.plaintext.value) == int(par.plaintext.value)
    assert back.variance == par.variance

    # big plaintext modulus -> oneof arm 5 (bytes, little-endian)
    from tpufhe.bfv.parameters import BfvParametersBuilder

    big_t = (1 << 70) + 279
    par_big = (BfvParametersBuilder().set_degree(16)
               .set_plaintext_modulus(big_t)
               .set_moduli_sizes([62, 62, 62]).build())
    ours = serialize_parameters(par_big)
    assert _tag_order(ours) == [1, 2, 4, 5]
    m = pb["bfv"].Parameters()
    m.ParseFromString(ours)
    assert m.WhichOneof("plaintext_modulus") == "plaintext_big"
    assert int.from_bytes(m.plaintext_big, "little") == big_t
    back = deserialize_parameters(m.SerializeToString())
    assert int(back.plaintext.value) == big_t
