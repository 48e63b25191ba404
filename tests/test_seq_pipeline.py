"""Sequence-sharded mul+relin: end-to-end correctness on the 8-device CPU
mesh (SURVEY hard part #5 as a first-class pipeline path, not just a
standalone NTT).

The degree axis (lane-folded n1 sublane rows) is sharded over a `seq`
mesh axis; every non-NTT stage runs shard-local and each NTT does one
all_to_all. The test encrypts real SIMD plaintexts, runs the sharded
fused program, decrypts, and checks the elementwise product mod t —
end-to-end semantics over the full (extend -> tensor -> downscale ->
key-switch) composition. Bit-exactness of the communicating stage (the
distributed four-step NTT) vs the single-device transform is covered by
tests/test_ntt_dist.py up to N=16384.

Cost notes (1-core host, see CLAUDE.md):
- encryption/decryption run under jax.disable_jit() — their op counts
  are small, and this avoids compiling the fused encrypt/decrypt
  programs at N=1024 just for this test;
- a full fused pipeline must NEVER run eagerly at this size (~10^5
  dispatches, measured hours), so the sharded program is the one big
  (persistently cached) compile here;
- params/keys/batch deliberately MATCH __graft_entry__.dryrun_multichip's
  seq configuration so both share one compile-cache entry.
"""

import os

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from tpufhe.bfv import (
    BfvParametersBuilder,
    Ciphertext,
    Encoding,
    Plaintext,
    RelinearizationKey,
    SecretKey,
)
from tpufhe.ops.rq import NTT, Poly
from tpufhe.parallel.seq_pipeline import make_seq_sharded_mul_relin
from tpufhe.utils.rngs import ChaCha8Rng, seed_from_u64

RNG = np.random.default_rng(4242)
BATCH = 2


@pytest.fixture(scope="module")
def setup():
    # wide 62-bit limbs, n1=2 (degree 256 over 2 seq shards — the
    # cheapest shape that exercises the distributed NTT's all_to_all;
    # VERDICT r4 item 1: cold compiles must fit a driver budget);
    # t=12289 = 1 mod 512 so SIMD encoding works
    par = (
        BfvParametersBuilder()
        .set_degree(256)
        .set_plaintext_modulus(12289)
        .set_moduli_sizes([62, 62])
        .build()
    )
    r = ChaCha8Rng(seed_from_u64(5))
    sk = SecretKey.random(par, r)
    rk = RelinearizationKey.new(sk, r)
    t = par.plaintext.value

    vas, vbs, cts = [], [], []
    with jax.disable_jit():  # cheap eager encrypt; avoids two compiles
        for _ in range(BATCH):
            va = RNG.integers(0, t, size=par.degree(), dtype=np.uint64)
            vb = RNG.integers(0, t, size=par.degree(), dtype=np.uint64)
            ca = sk.try_encrypt(Plaintext.try_encode(va, Encoding.simd(), par), r)
            cb = sk.try_encrypt(Plaintext.try_encode(vb, Encoding.simd(), par), r)
            vas.append(va)
            vbs.append(vb)
            cts.append((ca, cb))
    arrs = [
        np.stack([np.asarray(pair[i // 2][i % 2].coeffs) for pair in cts])
        for i in range(4)
    ]  # a0, a1, b0, b1 each (BATCH, k, 2, n1, 128)
    return par, sk, rk, vas, vbs, arrs


def _check(par, sk, vas, vbs, out0, out1):
    ctx = par.context_at_level(0)
    t = par.plaintext.value
    with jax.disable_jit():  # cheap eager decrypt
        for i in range(BATCH):
            ct = Ciphertext(
                par,
                [Poly(ctx, NTT, np.asarray(out0)[i]),
                 Poly(ctx, NTT, np.asarray(out1)[i])],
                0,
            )
            noise = sk.measure_noise(ct)
            assert noise < 100, f"noise {noise} bits exceeds budget"
            got = np.asarray(sk.try_decrypt(ct).try_decode(Encoding.simd()))
            want = (vas[i].astype(object) * vbs[i].astype(object)) % t
            np.testing.assert_array_equal(got, want.astype(np.uint64))


def test_seq_sharded_mul_relin_end_to_end(setup):
    par, sk, rk, vas, vbs, arrs = setup
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("seq",))
    seq_fn = make_seq_sharded_mul_relin(par, rk, mesh)
    s0, s1 = seq_fn(*arrs)
    _check(par, sk, vas, vbs, s0, s1)


@pytest.mark.skipif(
    os.environ.get("TPUFHE_SLOW_TESTS", "") != "1",
    reason="second long cold compile; set TPUFHE_SLOW_TESTS=1",
)
def test_seq_sharded_mul_relin_with_batch_axis(setup):
    """2x2 (batch, seq) mesh: DP and sequence sharding compose."""
    par, sk, rk, vas, vbs, arrs = setup
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                ("batch", "seq"))
    seq_fn = make_seq_sharded_mul_relin(par, rk, mesh, batch_axis="batch")
    s0, s1 = seq_fn(*arrs)
    _check(par, sk, vas, vbs, s0, s1)


def test_seq_sharded_strategy2(setup):
    """The eprint-2021/204 second strategy composes with degree sharding:
    every non-NTT stage (including the rhs P/q scaler) is coefficient-
    local, so only the distributed NTTs communicate. End-to-end decrypt-
    checked like the default-strategy test."""
    par, sk, rk, vas, vbs, arrs = setup
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("seq",))
    seq_fn = make_seq_sharded_mul_relin(par, rk, mesh, strategy2_primes=1)
    s0, s1 = seq_fn(*arrs)
    _check(par, sk, vas, vbs, s0, s1)
