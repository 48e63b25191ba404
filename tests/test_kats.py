"""Known-answer tests anchoring bit-exactness claims to external sources.

VERDICT r1 item 4: the RNG/utility stack was only tested against itself.
These tests pin it to independent anchors:

- modular inverse over the reference's full Sage-generated KAT grid
  (fhe-util/src/lib.rs:307-500: `for p in range(2,1000,7): for a in
  range(1,30,3)`), checked against CPython's pow(a, -1, p) — an oracle
  implemented independently of tpufhe;
- the ChaCha block function against published external test vectors
  (RFC 8439 appendix A.1 vector #1 / the classic all-zero ChaCha20 block,
  and the RFC 8439 section 2.3.2 block), mapped onto the djb word layout
  rand_chacha uses (64-bit counter in words 12-13, stream in 14-15);
- seed_from_u64 (rand_core 0.9 PCG32 expansion) against a pinned vector so
  any drift in the expansion constants is caught;
- serialized-object bytes against an INDEPENDENT proto3 encoder written
  here from the wire-format spec + the reference's field numbering
  (fhe-math/src/proto/rq.proto:5-17), so "wire-compatible" is checked
  against the encoding rules, not our own codec.
"""

import numpy as np

from tpufhe.utils.misc import inverse
from tpufhe.utils.rngs import ChaCha8Rng, ChaChaRng, _chacha_block, seed_from_u64


def test_inverse_sage_kat_grid():
    """fhe-util/src/lib.rs:307-500 — same generator grid, independent
    oracle (CPython pow)."""
    checked = 0
    for p in range(2, 1000, 7):
        for a in range(1, 30, 3):
            got = inverse(a, p)
            try:
                want = pow(a, -1, p)
            except ValueError:
                want = None
            assert got == want, (a, p, got, want)
            checked += 1
    assert checked == 1430


def test_chacha20_block_zero_key_external_vector():
    """All-zero key/nonce ChaCha20 first block (RFC 8439 A.1 #1)."""
    out = _chacha_block([0] * 8, 0, [0, 0], 20)
    want = bytes.fromhex(
        "76b8e0ada0f13d90405d6ae55386bd28bdd219b8a08ded1aa836efcc8b770dc7"
        "da41597c5157488d7724e03fb8d84a376a43b8f41518a11cc387b669b2ee6586"
    )
    assert out == want


def test_chacha20_block_rfc8439_232():
    """RFC 8439 section 2.3.2 block function test, IETF counter/nonce
    mapped onto the djb layout (words 12..15 = 00000001, 09000000,
    4a000000, 00000000)."""
    key = [
        int.from_bytes(bytes(range(32))[4 * i : 4 * i + 4], "little")
        for i in range(8)
    ]
    counter = 1 | (0x09000000 << 32)
    out = _chacha_block(key, counter, [0x4A000000, 0x00000000], 20)
    assert out[:16] == bytes.fromhex("10f1e7e4d13b5915500fdd1fa32071c4")


def test_chacha8_stream_word_order():
    """The rand_chacha word stream: next_u32 yields little-endian words of
    consecutive blocks; next_u64 = lo word then hi word; fill_bytes
    consumes whole words. Cross-checked against the raw block function."""
    seed = bytes(range(32))
    rng = ChaCha8Rng(seed)
    key = [int.from_bytes(seed[4 * i : 4 * i + 4], "little") for i in range(8)]
    block0 = _chacha_block(key, 0, [0, 0], 8)
    block1 = _chacha_block(key, 1, [0, 0], 8)
    words = [
        int.from_bytes(block0[4 * i : 4 * i + 4], "little") for i in range(16)
    ] + [int.from_bytes(block1[4 * i : 4 * i + 4], "little") for i in range(16)]
    for i in range(20):
        assert rng.next_u32() == words[i]
    rng2 = ChaCha8Rng(seed)
    assert rng2.next_u64() == words[0] | (words[1] << 32)
    rng3 = ChaCha8Rng(seed)
    assert rng3.fill_bytes(128) == block0 + block1


def test_seed_from_u64_pinned():
    """rand_core 0.9 SeedableRng::seed_from_u64 (PCG32 expansion with the
    documented multiplier 6364136223846793005 / increment
    11634580027462260723). Pinned output: any change to the expansion
    breaks every cross-library seed-derived object."""
    s0 = seed_from_u64(0)
    s42 = seed_from_u64(42)
    assert len(s0) == 32 and len(s42) == 32 and s0 != s42
    # regenerate via an independent PCG32 step implementation
    def pcg32_stream(state):
        MUL, INC = 6364136223846793005, 11634580027462260723
        out = b""
        for _ in range(8):
            state = (state * MUL + INC) % (1 << 64)
            xs = (((state >> 18) ^ state) >> 27) % (1 << 32)
            rot = state >> 59
            word = ((xs >> rot) | (xs << ((32 - rot) & 31))) % (1 << 32)
            out += word.to_bytes(4, "little")
        return out

    assert s0 == pcg32_stream(0)
    assert s42 == pcg32_stream(42)


def test_poly_wire_bytes_vs_independent_encoder():
    """Serialize a tiny Poly and compare against bytes produced by an
    independent encoder following proto3 + the reference wire format:
    Rq { representation=1 (tag), degree=2 (varint), coefficients=3 (bytes,
    per-modulus bit-packed to ceil(log2 q) bits via transcode) }
    (fhe-math/src/proto/rq.proto:5-17, rq/convert.rs:17-42,
    zq/mod.rs:773-793)."""
    from tpufhe.ops.rq import Context, POWER_BASIS, Poly

    moduli = (0x3FFFFFFF000001,)  # 54-bit default-128 prime for n=2048... use small n
    n = 16
    ctx = Context(moduli, n)
    vals = np.arange(n, dtype=np.uint64) * 1234567 + 3
    p = Poly.from_u64_matrix(vals[None, :] % moduli[0], ctx, POWER_BASIS)
    got = p.to_bytes()

    # independent encoder
    def varint(v):
        out = bytearray()
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    def bitpack(values, nbits):
        # transcode_to_bytes semantics (fhe-util/src/lib.rs:60-98): pack
        # little-endian nbits-wide integers into a little-endian bit stream.
        acc = 0
        accbits = 0
        out = bytearray()
        for v in values:
            acc |= int(v) << accbits
            accbits += nbits
            while accbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                accbits -= 8
        if accbits:
            out.append(acc & 0xFF)
        return bytes(out)

    nbits = moduli[0].bit_length()
    payload = bitpack(vals % moduli[0], nbits)
    want = (
        bytes([0x08]) + varint(1)          # field 1 varint: representation
        + bytes([0x10]) + varint(n)        # field 2 varint: degree
        + bytes([0x1A]) + varint(len(payload)) + payload  # field 3 bytes
    )
    assert got == want
