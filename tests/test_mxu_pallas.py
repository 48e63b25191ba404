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
