"""Fused four-step Pallas kernel: bit-exact parity vs the XLA einsum path
(interpret mode on CPU)."""

import numpy as np
import pytest

from tpufhe.ops import ntt_mxu
from tpufhe.ops.ntt import NttOperator
from tpufhe.ops.pallas.mxu_ntt_kernel import build_mxu4_consts, mxu4_pallas
from tpufhe.ops.zq import Modulus

N = 1024
MODULI = [0x3FFFFFFF000001, 4611686018326724609, 1152921504606584833]


@pytest.fixture(scope="module")
def ops():
    return [NttOperator.new(Modulus(p), N) for p in MODULI]


@pytest.fixture(scope="module")
def plan(ops):
    return ntt_mxu.MxuNttPlan.new(ops)


def _rand(rng, ops, batch, bound_mul=1):
    vals = np.stack([
        np.stack([
            rng.integers(0, bound_mul * op.q.p, size=N, dtype=np.uint64)
            for op in ops
        ])
        for _ in range(batch)
    ])  # (B, k, N)
    lo = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (vals >> np.uint64(32)).astype(np.uint32)
    return np.stack([lo, hi], axis=2).reshape(batch, len(ops), 2, N // 128, 128)


@pytest.mark.parametrize("in_planes,bound,lazy", [
    (9, 1, False),   # canonical inputs
    (10, 4, False),  # lazy < 4p inputs
    (9, 1, True),    # lazy output mode
])
def test_forward_parity(ops, plan, in_planes, bound, lazy):
    rng = np.random.default_rng(41)
    a = _rand(rng, ops, batch=4, bound_mul=bound)
    want = np.asarray(
        ntt_mxu.forward_mxu(a, plan, lazy=lazy, in_bits=63 if bound == 1 else 64)
    )
    consts = build_mxu4_consts(plan, inverse=False, in_planes=in_planes)
    got = np.asarray(mxu4_pallas(a, consts, lazy=lazy, interpret=True))
    if lazy:
        # lazy bounds may differ; compare canonically per limb
        for i, op in enumerate(ops):
            p = np.uint64(op.q.p)
            g = got[:, i, 0].astype(np.uint64) | (
                got[:, i, 1].astype(np.uint64) << np.uint64(32))
            w = want[:, i, 0].astype(np.uint64) | (
                want[:, i, 1].astype(np.uint64) << np.uint64(32))
            np.testing.assert_array_equal(g % p, w % p)
    else:
        np.testing.assert_array_equal(got, want)


def test_backward_parity(ops, plan):
    rng = np.random.default_rng(42)
    a = _rand(rng, ops, batch=4)
    want = np.asarray(ntt_mxu.backward_mxu(a, plan, in_bits=63))
    consts = build_mxu4_consts(plan, inverse=True, in_planes=9)
    got = np.asarray(mxu4_pallas(a, consts, inverse=True, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_relin_tail_parity(ops, plan):
    """Fused NTT + key-switch accumulate + add == unfused composition."""
    import jax.numpy as jnp

    from tpufhe.ops import zq
    from tpufhe.ops.pallas.mxu_ntt_kernel import (
        build_ksk_tail_consts,
        relin_tail_pallas,
    )

    rng = np.random.default_rng(43)
    k = len(ops)
    n_polys = 2 + k
    B = 2
    x = np.stack([_rand(rng, ops, batch=B) for _ in range(n_polys)])

    # random ksk constants (canonical) + exact Shoup duplicates
    def pack(v64):
        lo = (v64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi = (v64 >> np.uint64(32)).astype(np.uint32)
        return np.stack([lo, hi], axis=-2).reshape(k, 2, N // 128, 128)

    def shoup_of(v64):
        out = np.empty_like(v64)
        for i, op in enumerate(ops):
            p = op.q.p
            row = v64[i].astype(object)
            out[i] = np.array([(int(t) << 64) // p for t in row.ravel()],
                              dtype=np.uint64).reshape(row.shape)
        return out

    ksk_c0, ksk_c1 = [], []
    for i in range(k):
        v0 = np.stack([rng.integers(0, op.q.p, size=N, dtype=np.uint64)
                       for op in ops])
        v1 = np.stack([rng.integers(0, op.q.p, size=N, dtype=np.uint64)
                       for op in ops])
        ksk_c0.append((pack(v0), pack(shoup_of(v0))))
        ksk_c1.append((pack(v1), pack(shoup_of(v1))))

    # unfused reference: forward NTT (canonical) + Shoup accumulate + add
    stacked = x.reshape((n_polys * B,) + x.shape[2:])
    ntts = np.asarray(ntt_mxu.forward_mxu(stacked, plan, in_bits=63))
    ntts = ntts.reshape(x.shape)
    c01, lifted = ntts[:2], ntts[2:]

    def pairs(a):
        return (jnp.asarray(a[..., 0, :, :]), jnp.asarray(a[..., 1, :, :]))

    idx = (...,) + (None,) * 2
    p = (jnp.asarray(plan.p_pair[0][idx]), jnp.asarray(plan.p_pair[1][idx]))
    acc0 = acc1 = None
    for i in range(k):
        di = pairs(lifted[i])
        t0 = zq.mul_shoup(di, pairs(ksk_c0[i][0]), pairs(ksk_c0[i][1]), p)
        t1 = zq.mul_shoup(di, pairs(ksk_c1[i][0]), pairs(ksk_c1[i][1]), p)
        if acc0 is None:
            acc0, acc1 = t0, t1
        else:
            acc0 = zq.add_mod(acc0, t0, p)
            acc1 = zq.add_mod(acc1, t1, p)
    want0 = np.stack(
        [np.asarray(v) for v in zq.add_mod(pairs(c01[0]), acc0, p)], axis=-3)
    want1 = np.stack(
        [np.asarray(v) for v in zq.add_mod(pairs(c01[1]), acc1, p)], axis=-3)

    ntt_consts = build_mxu4_consts(plan, inverse=False, in_planes=9)
    ksk_tail = build_ksk_tail_consts(ksk_c0, ksk_c1)
    got = np.asarray(
        relin_tail_pallas(jnp.asarray(x), ntt_consts, ksk_tail,
                          interpret=True))
    np.testing.assert_array_equal(got[0], want0)
    np.testing.assert_array_equal(got[1], want1)


def test_rotate_tail_parity(ops, plan):
    """Fused rotate tail (s0 passthrough + digit-lift NTT + key-switch
    accumulate + add, mode='rotate') == unfused composition."""
    import jax.numpy as jnp

    from tpufhe.ops import zq
    from tpufhe.ops.pallas.mxu_ntt_kernel import (
        build_ksk_tail_consts,
        rotate_tail_pallas,
    )

    rng = np.random.default_rng(46)
    k = len(ops)
    B = 2
    s0 = _rand(rng, ops, batch=B)  # canonical NTT-domain passthrough row
    digits = np.stack([_rand(rng, ops, batch=B) for _ in range(k)])
    x = np.concatenate([s0[None], digits], axis=0)

    def pack(v64):
        lo = (v64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi = (v64 >> np.uint64(32)).astype(np.uint32)
        return np.stack([lo, hi], axis=-2).reshape(k, 2, N // 128, 128)

    def shoup_of(v64):
        out = np.empty_like(v64)
        for i, op in enumerate(ops):
            p = op.q.p
            row = v64[i].astype(object)
            out[i] = np.array([(int(t) << 64) // p for t in row.ravel()],
                              dtype=np.uint64).reshape(row.shape)
        return out

    ksk_c0, ksk_c1 = [], []
    for i in range(k):
        v0 = np.stack([rng.integers(0, op.q.p, size=N, dtype=np.uint64)
                       for op in ops])
        v1 = np.stack([rng.integers(0, op.q.p, size=N, dtype=np.uint64)
                       for op in ops])
        ksk_c0.append((pack(v0), pack(shoup_of(v0))))
        ksk_c1.append((pack(v1), pack(shoup_of(v1))))

    # unfused reference: lift NTTs + Shoup accumulate + add s0
    stacked = digits.reshape((k * B,) + digits.shape[2:])
    lifted = np.asarray(ntt_mxu.forward_mxu(stacked, plan, in_bits=63))
    lifted = lifted.reshape(digits.shape)

    def pairs(a):
        return (jnp.asarray(a[..., 0, :, :]), jnp.asarray(a[..., 1, :, :]))

    idx = (...,) + (None,) * 2
    p = (jnp.asarray(plan.p_pair[0][idx]), jnp.asarray(plan.p_pair[1][idx]))
    acc0 = acc1 = None
    for i in range(k):
        di = pairs(lifted[i])
        t0 = zq.mul_shoup(di, pairs(ksk_c0[i][0]), pairs(ksk_c0[i][1]), p)
        t1 = zq.mul_shoup(di, pairs(ksk_c1[i][0]), pairs(ksk_c1[i][1]), p)
        if acc0 is None:
            acc0, acc1 = t0, t1
        else:
            acc0 = zq.add_mod(acc0, t0, p)
            acc1 = zq.add_mod(acc1, t1, p)
    want0 = np.stack(
        [np.asarray(v) for v in zq.add_mod(pairs(s0), acc0, p)], axis=-3)
    want1 = np.stack([np.asarray(v) for v in acc1], axis=-3)

    ntt_consts = build_mxu4_consts(plan, inverse=False, in_planes=9)
    ksk_tail = build_ksk_tail_consts(ksk_c0, ksk_c1)
    got = np.asarray(
        rotate_tail_pallas(jnp.asarray(x), ntt_consts, ksk_tail,
                           interpret=True))
    np.testing.assert_array_equal(got[0], want0)
    np.testing.assert_array_equal(got[1], want1)


def test_tensor_intt_parity(ops, plan):
    """Fused tensor product + inverse NTT == unfused composition."""
    import jax.numpy as jnp

    from tpufhe.ops import zq
    from tpufhe.ops.pallas.mxu_ntt_kernel import tensor_intt_pallas

    rng = np.random.default_rng(44)
    B = 2
    a0, a1, b0, b1 = (_rand(rng, ops, batch=B) for _ in range(4))

    def pairs(a):
        return (jnp.asarray(a[..., 0, :, :]), jnp.asarray(a[..., 1, :, :]))

    idx = (...,) + (None,) * 2
    p = (jnp.asarray(plan.p_pair[0][idx]), jnp.asarray(plan.p_pair[1][idx]))
    bl = (jnp.asarray(plan.barrett_lo[0][idx]),
          jnp.asarray(plan.barrett_lo[1][idx]))
    bh = (jnp.asarray(plan.barrett_hi[0][idx]),
          jnp.asarray(plan.barrett_hi[1][idx]))

    def stack(r):
        return np.stack([np.asarray(r[0]), np.asarray(r[1])], axis=-3)

    c0 = zq.mul_mod(pairs(a0), pairs(b0), bl, bh, p)
    c1 = zq.add_mod(zq.mul_mod(pairs(a0), pairs(b1), bl, bh, p),
                    zq.mul_mod(pairs(a1), pairs(b0), bl, bh, p), p)
    c2 = zq.mul_mod(pairs(a1), pairs(b1), bl, bh, p)
    t = np.stack([stack(c0), stack(c1), stack(c2)])  # (3, B, k, 2, n1, L)
    want = np.asarray(ntt_mxu.backward_mxu(
        t.reshape((-1,) + t.shape[2:]), plan, in_bits=63
    )).reshape(t.shape)

    consts = build_mxu4_consts(plan, inverse=True, in_planes=9)
    got = np.asarray(tensor_intt_pallas(
        jnp.asarray(np.stack([a0, a1, b0, b1])), consts, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_forward_parity_opt_reduction():
    """NFLlib-opt fold reduction (all-62-bit generated primes): canonical
    outputs bit-identical to the generic Barrett path."""
    import os

    from tpufhe.utils.primes import generate_prime

    ps, ub = [], 1 << 62
    for _ in range(3):
        p = generate_prime(62, 2 * N, ub)
        ps.append(p)
        ub = p
    ops62 = [NttOperator.new(Modulus(p), N) for p in ps]
    plan62 = ntt_mxu.MxuNttPlan.new(ops62)
    rng = np.random.default_rng(45)
    a = _rand(rng, ops62, batch=2)
    consts = build_mxu4_consts(plan62, inverse=False, in_planes=9)
    from tpufhe.ops.pallas.mxu_ntt_kernel import _opt_lz

    assert _opt_lz(consts[3]) == 2  # 62-bit primes: leading_zeros == 2
    got = np.asarray(mxu4_pallas(a, consts, interpret=True))
    os.environ["TPUFHE_OPT_RED"] = "0"
    try:
        want = np.asarray(mxu4_pallas(a, consts, interpret=True))
    finally:
        del os.environ["TPUFHE_OPT_RED"]
    np.testing.assert_array_equal(got, want)
