"""Cross-chip four-step NTT: bit-exact parity vs the single-device path
on the 8-device CPU mesh (SURVEY hard part #5; VERDICT r1 missing #1).

The distributed plan shards the sublane (n1) axis over a `seq` mesh axis
and exchanges coefficients with one all_to_all per transform; outputs must
be bit-identical to ntt_mxu (itself parity-locked to the butterfly path).
"""

import os

import jax
import numpy as np
import pytest

from tpufhe.ops import ntt_mxu, rq
from tpufhe.parallel.ntt_dist import DistNtt

MODULI_3 = [0x3FFFFFFF000001, 4611686018326724609, 1152921504606584833]


def _seq_mesh(n):
    devs = np.asarray(jax.devices()[:n])
    return jax.sharding.Mesh(devs, ("seq",))


def _rand_pairs(rng, moduli, n, bound_mul=1):
    vals = np.stack(
        [
            rng.integers(0, bound_mul * p, size=n, dtype=np.uint64)
            for p in moduli
        ]
    )
    lo = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (vals >> np.uint64(32)).astype(np.uint32)
    return np.stack([lo, hi], axis=1).reshape(len(moduli), 2, n // 128, 128)


_N16384 = (
    [(16384, MODULI_3[:1], 1)]  # the reference's largest default degree;
    if os.environ.get("TPUFHE_SLOW") == "1"  # ~20 min at XLA opt level 0
    else []  # run via benches/ntt_dist_check.py (full opt) otherwise;
)  # N=16384 parity evidence recorded in benches/logs/ntt_dist_16384.log


@pytest.mark.parametrize("n,moduli,bound", [
    (2048, MODULI_3, 1),
    (2048, MODULI_3, 4),       # lazy (< 4p) inputs
    (4096, MODULI_3[:1], 1),   # more sublanes per shard (blk=4)
] + _N16384)
def test_dist_forward_backward_parity(n, moduli, bound):
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    mesh = _seq_mesh(8)
    ctx = rq.Context(tuple(moduli), n)
    dist = DistNtt(ctx, mesh)
    plan = dist.plan

    a = _rand_pairs(np.random.default_rng(3), moduli, n, bound)
    want_f = np.asarray(ntt_mxu.forward_mxu(a, plan))

    a_sh = jax.device_put(a, dist.sharding(0))
    got_f = np.asarray(dist.forward(a_sh))
    np.testing.assert_array_equal(got_f, want_f)

    b = _rand_pairs(np.random.default_rng(4), moduli, n)
    want_b = np.asarray(ntt_mxu.backward_mxu(b, plan))
    b_sh = jax.device_put(b, dist.sharding(0))
    got_b = np.asarray(dist.backward(b_sh))
    np.testing.assert_array_equal(got_b, want_b)


def test_dist_forward_batched():
    mesh = _seq_mesh(8)
    n = 2048
    ctx = rq.Context(tuple(MODULI_3), n)
    dist = DistNtt(ctx, mesh)

    rng = np.random.default_rng(5)
    a = np.stack([_rand_pairs(rng, MODULI_3, n) for _ in range(4)])
    want = np.asarray(ntt_mxu.forward_mxu(a, dist.plan))
    a_sh = jax.device_put(a, dist.sharding(1))
    got = np.asarray(dist.forward(a_sh))
    np.testing.assert_array_equal(got, want)
