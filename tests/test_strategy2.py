"""End-to-end correctness of the eprint 2021/204 SECOND multiplication
strategy wired into the fused pipeline (VERDICT r4 next-round item 2a).

Reference shows the strategy in its tests (ops/mul.rs:353-402) with a
conservative k-prime P; the pipeline variant exploits the wrap-soundness
fact documented in build_mul_relin_step (a q*P wrap of the tensor adds
t*m*q == 0 mod q under the t/P post-scale), so P only needs to dominate
N*t^2 by the desired noise margin. These tests decrypt-check the fused
strategy-2 program at degree 64 for kP in {1, 2} and compare its noise
against the default strategy.
"""

import jax
import numpy as np
import pytest

from tpufhe.bfv import (
    BfvParametersBuilder,
    Ciphertext,
    Encoding,
    Plaintext,
    RelinearizationKey,
    SecretKey,
)
from tpufhe.ops.rq import NTT, Poly
from tpufhe.pipeline import make_mul_relin
from tpufhe.utils.rngs import ChaCha8Rng, seed_from_u64

RNG = np.random.default_rng(77)


@pytest.fixture(scope="module")
def setup():
    par = (
        BfvParametersBuilder()
        .set_degree(64)
        .set_plaintext_modulus(257)  # 257 % 128 == 1: SIMD-capable
        .set_moduli_sizes([62, 62])
        .build()
    )
    r = ChaCha8Rng(seed_from_u64(21))
    sk = SecretKey.random(par, r)
    rk = RelinearizationKey.new(sk, r)
    t = 257
    va = RNG.integers(0, t, size=64, dtype=np.uint64)
    vb = RNG.integers(0, t, size=64, dtype=np.uint64)
    ca = sk.try_encrypt(Plaintext.try_encode(va, Encoding.simd(), par), r)
    cb = sk.try_encrypt(Plaintext.try_encode(vb, Encoding.simd(), par), r)
    arrs = tuple(
        np.asarray(c[i].coeffs)[None] for c in (ca, cb) for i in range(2)
    )
    return par, sk, rk, va, vb, arrs


def _run_and_check(par, sk, va, vb, fn, arrs):
    o0, o1 = fn(*arrs)
    ctx = par.context_at_level(0)
    ct = Ciphertext(
        par,
        [Poly(ctx, NTT, np.asarray(o0)[0]), Poly(ctx, NTT, np.asarray(o1)[0])],
        0,
    )
    noise = sk.measure_noise(ct)
    got = np.asarray(sk.try_decrypt(ct).try_decode(Encoding.simd()))
    want = (va.astype(object) * vb.astype(object)) % 257
    np.testing.assert_array_equal(got, want.astype(np.uint64))
    return noise


@pytest.mark.parametrize("kp", [1, 2])
def test_strategy2_mul_relin_decrypts(setup, kp):
    par, sk, rk, va, vb, arrs = setup
    fn = make_mul_relin(par, rk, strategy2_primes=kp)
    noise = _run_and_check(par, sk, va, vb, fn, arrs)
    # noise must stay within the decryption budget with margin; the
    # strategy-2 rounding term is ~N*t*q/(2P) (build_mul_relin_step doc)
    budget = sum(par.moduli_sizes[:2]) - 8 - 1  # log2(q/t) - 1
    assert noise < budget, (noise, budget)


def test_strategy2_noise_vs_default(setup):
    """Strategy 2's extra rounding noise is bounded as documented: at
    kP=1 (P ~ 2^62, N*t^2 ~ 2^22) it must stay within ~log2(N*t*q/2P)
    of the default strategy's product noise."""
    par, sk, rk, va, vb, arrs = setup
    n_def = _run_and_check(par, sk, va, vb, make_mul_relin(par, rk), arrs)
    n_s2 = _run_and_check(
        par, sk, va, vb, make_mul_relin(par, rk, strategy2_primes=1), arrs)
    # predicted strategy-2 rounding term: N*t*q/(2P)
    import math

    q = par.context_at_level(0).modulus()
    pred = math.log2(64 * 257 * q / 2) - 62
    assert n_s2 <= max(n_def, pred) + 6, (n_def, n_s2, pred)


def test_object_level_multiplicator_strategy2(setup):
    """Multiplicator.strategy2 (object API) decrypts the SIMD product —
    the reference's ops/mul.rs:353-402 pattern via a convenience
    constructor with the noise-bound-sized P."""
    from tpufhe.bfv import Ciphertext
    from tpufhe.bfv.ops import Multiplicator

    par, sk, rk, va, vb, arrs = setup
    with jax.disable_jit():  # cheap eager at degree 64
        m = Multiplicator.strategy2(rk, extension_primes=1)
        ctx = par.context_at_level(0)
        ca = Ciphertext(
            par, [Poly(ctx, NTT, np.asarray(arrs[i])[0])
                  for i in range(2)], 0)
        cb = Ciphertext(
            par, [Poly(ctx, NTT, np.asarray(arrs[i])[0])
                  for i in range(2, 4)], 0)
        ct = m.multiply(ca, cb)
        got = np.asarray(sk.try_decrypt(ct).try_decode(Encoding.simd()))
    want = ((va.astype(object) * vb.astype(object)) % 257).astype(np.uint64)
    np.testing.assert_array_equal(got, want)
