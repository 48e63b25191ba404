"""Tests for the rq polynomial layer (Poly, substitute, switch_down, Scaler)."""

import numpy as np
import pytest

from tpufhe.ops import rq
from tpufhe.ops.rns import ScalingFactor
from tpufhe.ops.rq import NTT, POWER_BASIS, Context, Poly, Scaler, SubstitutionExponent, Switcher
from tpufhe.utils.rngs import ChaCha8Rng, seed_from_u64

RNG = np.random.default_rng(5)

N = 16
MODULI = (4611686018326724609, 4611686018309947393, 1153)


def ctx3():
    return Context(MODULI, N)


def random_poly(ctx, rep=POWER_BASIS):
    mat = np.stack(
        [RNG.integers(0, m, size=ctx.degree, dtype=np.uint64) for m in ctx.moduli]
    )
    return Poly.from_u64_matrix(mat, ctx, rep), mat


def test_ntt_roundtrip_and_conv():
    ctx = ctx3()
    p, mat = random_poly(ctx)
    q, mat2 = random_poly(ctx)
    back = p.into_ntt().into_power_basis()
    np.testing.assert_array_equal(back.to_u64_matrix(), mat)

    # NTT pointwise product == negacyclic convolution, exact per limb
    prod = (p.into_ntt() * q.into_ntt()).into_power_basis().to_u64_matrix()
    for i, m in enumerate(ctx.moduli):
        want = np.zeros(N, dtype=object)
        for a in range(N):
            for b in range(N):
                v = int(mat[i, a]) * int(mat2[i, b])
                k = a + b
                if k >= N:
                    want[k - N] = (want[k - N] - v) % m
                else:
                    want[k] = (want[k] + v) % m
        np.testing.assert_array_equal(prod[i], want.astype(np.uint64))


def test_add_sub_neg_scalar():
    ctx = ctx3()
    p, mat = random_poly(ctx)
    q, mat2 = random_poly(ctx)
    ms = np.array(ctx.moduli, dtype=object)[:, None]
    np.testing.assert_array_equal(
        (p + q).to_u64_matrix(),
        ((mat.astype(object) + mat2.astype(object)) % ms).astype(np.uint64),
    )
    np.testing.assert_array_equal(
        (p - q).to_u64_matrix(),
        ((mat.astype(object) - mat2.astype(object)) % ms).astype(np.uint64),
    )
    np.testing.assert_array_equal(
        (-p).to_u64_matrix(),
        ((-mat.astype(object)) % ms).astype(np.uint64),
    )
    s = 123456789123456789
    np.testing.assert_array_equal(
        p.scalar_mul(s).to_u64_matrix(),
        ((mat.astype(object) * s) % ms).astype(np.uint64),
    )


def test_ntt_shoup_mul_matches_plain():
    ctx = ctx3()
    p, _ = random_poly(ctx, NTT)
    q, _ = random_poly(ctx, NTT)
    plain = (p * q).to_u64_matrix()
    shoup = (p * q.into_ntt_shoup()).to_u64_matrix()
    np.testing.assert_array_equal(plain, shoup)


def test_substitute_power_basis():
    ctx = ctx3()
    p, mat = random_poly(ctx)
    for exp in [3, 5, 2 * N - 1, N + 1]:
        e = SubstitutionExponent(ctx, exp)
        got = p.substitute(e).to_u64_matrix()
        # brute force: x^j -> x^(j*exp) with negacyclic sign folding
        for i, m in enumerate(ctx.moduli):
            want = np.zeros(N, dtype=object)
            for j in range(N):
                power = (j * exp) % (2 * N)
                v = int(mat[i, j])
                if power >= N:
                    want[power - N] = (want[power - N] - v) % m
                else:
                    want[power] = (want[power] + v) % m
            np.testing.assert_array_equal(got[i], want.astype(np.uint64))


def test_substitute_ntt_matches_power_basis():
    ctx = ctx3()
    p, _ = random_poly(ctx)
    for exp in [3, N + 1, 2 * N - 1]:
        e = SubstitutionExponent(ctx, exp)
        via_power = p.substitute(e).to_u64_matrix()
        via_ntt = p.into_ntt().substitute(e).into_power_basis().to_u64_matrix()
        np.testing.assert_array_equal(via_ntt, via_power)


def test_switch_down_exact():
    ctx = ctx3()
    p, _ = random_poly(ctx)
    q_last = ctx.moduli[-1]
    lifted = p.lift_bigints()
    down = p.switch_down()
    got = down.lift_bigints()
    q_new = down.ctx.modulus()
    for X, y in zip(lifted, got):
        want = ((X + q_last // 2) // q_last) % q_new
        assert y == want


def test_scaler_and_switcher():
    ctx = ctx3()
    to_ctx = Context(MODULI[:2], N)
    p, _ = random_poly(ctx)
    # scale by t/q (BFV decryption-style scaling), exact rounding oracle
    t = 1153
    scaler = Scaler(ctx, to_ctx, ScalingFactor(t, ctx.modulus()))
    got = scaler.scale(p).lift_bigints()
    q = ctx.modulus()
    q_to = to_ctx.modulus()
    for X, y in zip(p.lift_bigints(), got):
        sign = X >= (q >> 1)
        Xc = q - X if sign else X
        val = (Xc * t + (q >> 1)) // q
        want = (q_to - val % q_to) % q_to if sign else val % q_to
        assert y == want

    # NTT-representation scaling agrees with power-basis scaling
    got_ntt = scaler.scale(p.into_ntt()).into_power_basis().to_u64_matrix()
    got_pb = scaler.scale(p).to_u64_matrix()
    np.testing.assert_array_equal(got_ntt, got_pb)

    # Switcher roundtrip: switching up then down (factor one) keeps common rows
    sw_up = Switcher(to_ctx, ctx)
    p2, mat2 = random_poly(to_ctx)
    up = sw_up.switch(p2)
    assert up.ctx is ctx


def test_scaler_common_moduli_fast_path():
    ctx = ctx3()
    to_ctx = Context(MODULI[:2], N)
    p, mat = random_poly(ctx)
    sc = Scaler(ctx, to_ctx, ScalingFactor.one())
    assert sc.number_common_moduli == 2
    got = sc.scale(p).to_u64_matrix()
    np.testing.assert_array_equal(got, mat[:2])


def test_dot_product():
    ctx = ctx3()
    polys_a, polys_b, mats_a, mats_b = [], [], [], []
    for _ in range(5):
        a, ma = random_poly(ctx, NTT)
        b, mb = random_poly(ctx, NTT)
        polys_a.append(a)
        polys_b.append(b)
        mats_a.append(ma)
        mats_b.append(mb)
    got = rq.dot_product(polys_a, polys_b).to_u64_matrix()
    ms = np.array(ctx.moduli, dtype=object)[:, None]
    want = sum(
        (a.astype(object) * b.astype(object)) for a, b in zip(mats_a, mats_b)
    ) % ms
    np.testing.assert_array_equal(got, want.astype(np.uint64))


def test_multiply_inverse_power_of_x():
    ctx = ctx3()
    p, mat = random_poly(ctx)
    for power in [1, 5, N, 2 * N - 1]:
        got = p.multiply_inverse_power_of_x(power).to_u64_matrix()
        for i, m in enumerate(ctx.moduli):
            want = np.zeros(N, dtype=object)
            shift = ((2 * N) - power) % (2 * N)
            for k in range(N):
                index = shift + k
                v = int(mat[i, k])
                if index & N:
                    want[index & (N - 1)] = (-v) % m
                else:
                    want[index & (N - 1)] = v
            np.testing.assert_array_equal(got[i], want.astype(np.uint64))


def test_small_and_seeded():
    ctx = ctx3()
    rng = ChaCha8Rng(seed_from_u64(7))
    s = Poly.small(ctx, 10, rng)
    mat = s.to_u64_matrix()
    # all limbs encode the same centered value
    for j in range(N):
        c0 = int(mat[0, j])
        c = c0 - ctx.moduli[0] if c0 > ctx.moduli[0] // 2 else c0
        assert abs(c) <= 2 * 10
        for i, m in enumerate(ctx.moduli):
            assert int(mat[i, j]) == c % m

    seed = bytes(range(32))
    p1 = Poly.random_from_seed(ctx, seed)
    p2 = Poly.random_from_seed(ctx, seed)
    np.testing.assert_array_equal(p1.to_u64_matrix(), p2.to_u64_matrix())


def test_batched_ops_match_unbatched():
    import jax.numpy as jnp

    ctx = ctx3()
    ps = [random_poly(ctx) for _ in range(3)]
    stacked = Poly(
        ctx, POWER_BASIS, jnp.stack([p.coeffs for p, _ in ps], axis=0)
    )
    batched = stacked.into_ntt().into_power_basis().to_u64_matrix()
    for b, (p, mat) in enumerate(ps):
        np.testing.assert_array_equal(batched[b], mat)
