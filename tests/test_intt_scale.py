"""Parity for the fused iNTT+scale kernel (ops/pallas/intt_scale_kernel):
must be bit-identical to ntt_backward_any followed by the RNS scaler, for
both the factor-1 extension shape and the strategy-2 P/q shape. Runs in
Pallas interpret mode on CPU (conftest pins the platform)."""

import numpy as np
import pytest

from tpufhe.bfv import BfvParametersBuilder
from tpufhe.ops.pallas.intt_scale_kernel import intt_scale_ok, intt_scale_pallas
from tpufhe.ops.rns import ScalingFactor
from tpufhe.ops.rq import Scaler, ntt_backward_any
from tpufhe.utils.primes import generate_prime

RNG = np.random.default_rng(31)


@pytest.fixture(scope="module")
def setup():
    par = (
        BfvParametersBuilder()
        .set_degree(1024)
        .set_plaintext_modulus(12289)
        .set_moduli_sizes([62, 62])
        .build()
    )
    ctx = par.context_at_level(0)
    mp = par.context_level_at(0).mul_params()
    # random canonical NTT-representation residues, (B, k, 2, S, L)
    from tpufhe.ops.rq import pack_u64

    mat = np.stack(
        [RNG.integers(0, int(m), size=(3, 1024), dtype=np.uint64)
         for m in ctx.moduli],
        axis=1,
    )
    x = pack_u64(mat)
    return par, ctx, mp, x


def test_fused_extend_parity(setup):
    par, ctx, mp, x = setup
    scaler = mp.extender.rns_scaler
    k, k_mul = ctx.k, mp.extender.to_ctx.k
    assert intt_scale_ok(ctx, scaler, k, k_mul - k)
    ref = scaler.scale(ntt_backward_any(ctx, x, in_bits=62),
                       starting_index=k, size=k_mul - k)
    got = intt_scale_pallas(x, ctx, scaler, k, k_mul - k, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_strategy2_rhs_parity(setup):
    """factor P/q over the full strategy-2 basis (w-step exercised)."""
    par, ctx, mp, x = setup
    basis = list(ctx.moduli)
    p_new = 1 << 62
    while True:
        p_new = generate_prime(62, 2 * par.degree(), p_new)
        if p_new not in basis:
            break
    basis.append(p_new)
    from tpufhe.ops.rq import Context

    ctx_mul = Context(tuple(basis), par.degree())
    scaler = Scaler(ctx, ctx_mul,
                    ScalingFactor(p_new, ctx.modulus())).rns_scaler
    k_mul = ctx_mul.k
    assert intt_scale_ok(ctx, scaler, 0, k_mul)
    ref = scaler.scale(ntt_backward_any(ctx, x, in_bits=62),
                       starting_index=0, size=k_mul)
    got = intt_scale_pallas(x, ctx, scaler, 0, k_mul, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_pipeline_parity(setup):
    """make_mul_relin with the fusion forced == with it disabled."""
    import jax

    from tpufhe.bfv import RelinearizationKey, SecretKey
    from tpufhe.pipeline import build_mul_relin_step
    from tpufhe.utils.rngs import ChaCha8Rng, seed_from_u64

    par, ctx, mp, x = setup
    r = ChaCha8Rng(seed_from_u64(9))
    sk = SecretKey.random(par, r)
    rk = RelinearizationKey.new(sk, r)
    a = [x[i % 3][None] for i in range(4)]

    import os

    os.environ["TPUFHE_EXT_FUSE"] = "1"
    try:
        got = jax.jit(build_mul_relin_step(par, rk))(*a)
    finally:
        os.environ["TPUFHE_EXT_FUSE"] = "0"
    try:
        ref = jax.jit(build_mul_relin_step(par, rk))(*a)
    finally:
        del os.environ["TPUFHE_EXT_FUSE"]
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
