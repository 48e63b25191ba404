"""RNS context + HPS scaler tests against exact BigInt-style oracles.

Mirrors the reference's test strategy (rns/scaler.rs:366-473): scaled values
must equal round(x * num / den) with the centered-value sign convention.
"""

import numpy as np
import pytest

from tpufhe.ops import u64
from tpufhe.ops.rns import RnsContext, RnsScaler, ScalingFactor

RNG = np.random.default_rng(99)

Q3 = [4, 4611686018326724609, 1153]
R10 = [
    4,
    4611686018326724609,
    1153,
    4611686018309947393,
    4611686018282684417,
    4611686018257518593,
    4611686018232352769,
    4611686018171535361,
    4611686018106523649,
    4611686018058289153,
]


def test_context_project_lift():
    rns = RnsContext([4, 15, 1153])
    product = 4 * 15 * 1153
    assert rns.project(0) == [0, 0, 0]
    assert rns.project(4) == [0, 4, 4]
    assert rns.project(15) == [3, 0, 15]
    assert rns.project(1153) == [1, 13, 0]
    assert rns.project(product - 1) == [3, 14, 1152]
    for x in [0, 4, 15, 1153, product - 1]:
        assert rns.lift(rns.project(x)) == x
    with pytest.raises(ValueError):
        RnsContext([2, 4])
    with pytest.raises(ValueError):
        RnsContext([])


def expected_scale(q: RnsContext, out_ctx: RnsContext, x, n, d):
    """Exact rounding semantics from the reference tests."""
    x_lift = q.lift(x)
    x_sign = x_lift >= (q.modulus() >> 1)
    if x_sign:
        x_lift = q.modulus() - x_lift
    if x_sign:
        if d % 2 == 0:
            val = out_ctx.modulus() - ((x_lift * n + ((d >> 1) - 1)) // d) % out_ctx.modulus()
            val %= out_ctx.modulus()
        else:
            val = out_ctx.modulus() - ((x_lift * n + (d >> 1)) // d) % out_ctx.modulus()
            val %= out_ctx.modulus()
    else:
        val = (x_lift * n + (d >> 1)) // d
    return out_ctx.project(val)


def rests_to_pairs(rests_cols):
    """columns: list over coeffs of per-limb residues -> (k, 2, S, L) u32."""
    from tpufhe.ops.rq import pack_u64

    arr = np.array(rests_cols, dtype=np.uint64).T  # (k, N)
    return pack_u64(arr)


def unpack_out(out):
    """(k_out, 2, S, L) -> list over coeffs of per-limb ints."""
    from tpufhe.ops.rq import unpack_u64

    return unpack_u64(np.asarray(out)).T  # (N, k_out)


@pytest.mark.parametrize("num", [1, 2, 1000, 4611686018326724610])
@pytest.mark.parametrize("den", [1, 2, 3, 4, 101, 1000, 4611686018326724610])
def test_scale_same_context(num, den):
    q = RnsContext(Q3)
    scaler = RnsScaler(q, q, ScalingFactor(num, den))
    N = 16
    xs = [
        [int(RNG.integers(0, m)) for m in Q3]
        for _ in range(N)
    ]
    # device path
    out = unpack_out(scaler.scale(rests_to_pairs(xs)))
    for x, got in zip(xs, out):
        want = expected_scale(q, q, x, num, den)
        assert [int(g) for g in got] == want
        # host path agrees too
        assert scaler.scale_host(x) == want


def test_scale_different_contexts():
    q = RnsContext(Q3)
    r = RnsContext(R10)
    N = 8
    for num, den in [(1, 1), (2, 3), (1000, 1001), (4611686018326724610, 100)]:
        scaler = RnsScaler(q, r, ScalingFactor(num, den))
        xs = [[int(RNG.integers(0, m)) for m in Q3] for _ in range(N)]
        out = unpack_out(scaler.scale(rests_to_pairs(xs)))
        for x, got in zip(xs, out):
            want = expected_scale(q, r, x, num, den)
            assert [int(g) for g in got] == want


def test_scale_starting_index():
    """Partial outputs (used by the rq Scaler common-moduli fast path)."""
    q = RnsContext(Q3)
    r = RnsContext(R10)
    scaler = RnsScaler(q, r, ScalingFactor.one())
    N = 4
    xs = [[int(RNG.integers(0, m)) for m in Q3] for _ in range(N)]
    full = unpack_out(scaler.scale(rests_to_pairs(xs)))
    part = unpack_out(scaler.scale(rests_to_pairs(xs), starting_index=3, size=7))
    np.testing.assert_array_equal(part, full[:, 3:])
