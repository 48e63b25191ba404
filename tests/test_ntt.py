"""NTT tests: device/host parity, bijection, pointwise-mul == negacyclic conv."""

import jax
import numpy as np
import pytest

from tpufhe.ops import ntt, u64
from tpufhe.ops.zq import Modulus

RNG = np.random.default_rng(7)


def tables_pairs(op: ntt.NttOperator):
    def pack(v):
        lo = (v & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi = (v >> np.uint64(32)).astype(np.uint32)
        return np.stack([lo, hi], axis=0)  # (2, n)

    return (
        pack(op.omegas),
        pack(op.omegas_shoup),
        pack(op.zetas_inv),
        pack(op.zetas_inv_shoup),
    )


def consts(op: ntt.NttOperator):
    p = u64.to_pair(np.uint64(op.q.p))
    p2 = u64.to_pair(np.uint64(2 * op.q.p))
    ninv = u64.to_pair(np.uint64(op.size_inv))
    ninv_s = u64.to_pair(np.uint64(op.size_inv_shoup))
    return p, p2, ninv, ninv_s


@pytest.mark.parametrize("p,n", [(1153, 32), (4611686018326724609, 64)])
def test_forward_backward_device_matches_host(p, n):
    q = Modulus(p)
    op = ntt.NttOperator.new(q, n)
    assert op is not None

    om, om_s, ze, ze_s = tables_pairs(op)
    pp, pp2, ninv, ninv_s = consts(op)

    a = (RNG.integers(0, 1 << 63, size=n, dtype=np.uint64) % np.uint64(p)).astype(
        np.uint64
    )
    a_pair = np.stack(
        [
            (a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (a >> np.uint64(32)).astype(np.uint32),
        ],
        axis=0,
    )  # (2, n)

    fwd = np.asarray(ntt.forward(a_pair, om, om_s, pp, pp2))
    got = u64.from_pair_np((fwd[0], fwd[1]))
    want = op.forward_host(a)
    np.testing.assert_array_equal(got, want)

    bwd = np.asarray(
        ntt.backward(fwd, ze, ze_s, ninv, ninv_s, pp, pp2)
    )
    got_b = u64.from_pair_np((bwd[0], bwd[1]))
    np.testing.assert_array_equal(got_b, a)  # bijection

    # lazy forward: values < 4p, congruent to forward
    lazy = np.asarray(ntt.forward(a_pair, om, om_s, pp, pp2, lazy=True))
    lazy_v = u64.from_pair_np((lazy[0], lazy[1]))
    assert all(int(v) < 4 * p for v in lazy_v)
    np.testing.assert_array_equal(
        np.array([int(v) % p for v in lazy_v], dtype=np.uint64), want
    )


def test_pointwise_mul_is_negacyclic_convolution():
    p, n = 1153, 32
    q = Modulus(p)
    op = ntt.NttOperator.new(q, n)
    om, om_s, ze, ze_s = tables_pairs(op)
    pp, pp2, ninv, ninv_s = consts(op)

    a = RNG.integers(0, p, size=n, dtype=np.uint64)
    b = RNG.integers(0, p, size=n, dtype=np.uint64)

    fa = op.forward_host(a)
    fb = op.forward_host(b)
    prod = np.array([(int(x) * int(y)) % p for x, y in zip(fa, fb)], dtype=np.uint64)
    res = op.backward_host(prod)

    # exact negacyclic convolution
    want = np.zeros(n, dtype=object)
    for i in range(n):
        for j in range(n):
            k = i + j
            v = int(a[i]) * int(b[j])
            if k >= n:
                want[k - n] = (want[k - n] - v) % p
            else:
                want[k] = (want[k] + v) % p
    np.testing.assert_array_equal(res, want.astype(np.uint64))


def test_batched_multi_limb_layout():
    """(k, 2, n) stacked tables with (B, k, 2, n) data broadcast correctly."""
    n = 32
    moduli = [1153, 4611686018326724609]
    ops = [ntt.NttOperator.new(Modulus(p), n) for p in moduli]
    om = np.stack([tables_pairs(o)[0] for o in ops])  # (k, 2, n)
    om_s = np.stack([tables_pairs(o)[1] for o in ops])
    p_arr = np.array(moduli, dtype=np.uint64)
    pp = u64.to_pair(p_arr)
    pp2 = u64.to_pair(2 * p_arr)

    B = 3
    data = np.zeros((B, len(moduli), 2, n), dtype=np.uint32)
    raw = []
    for bi in range(B):
        row = []
        for ki, p in enumerate(moduli):
            a = RNG.integers(0, p, size=n, dtype=np.uint64)
            data[bi, ki, 0] = (a & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            data[bi, ki, 1] = (a >> np.uint64(32)).astype(np.uint32)
            row.append(a)
        raw.append(row)

    fwd = np.asarray(ntt.forward(data, om, om_s, pp, pp2))
    for bi in range(B):
        for ki, o in enumerate(ops):
            got = u64.from_pair_np((fwd[bi, ki, 0], fwd[bi, ki, 1]))
            np.testing.assert_array_equal(got, o.forward_host(raw[bi][ki]))


def test_primitive_root_properties():
    for p, n in [(1153, 32), (4611686018326724609, 1024)]:
        q = Modulus(p)
        w = ntt.primitive_root(n, q)
        assert ntt.is_primitive_root(w, 2 * n, p)
