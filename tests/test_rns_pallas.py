"""Parity tests for the fused Pallas HPS scaler kernel.

The kernel (ops/pallas/rns_kernel.py) must be bit-identical to the XLA
scale() path and the exact Python-int oracle (scale_host), for both the
base-extension shape (factor == 1, the mul pipeline's `extend`) and the
t/q down-scaling shape (factor != 1). Runs in Pallas interpret mode on
CPU (tests/conftest.py pins JAX_PLATFORMS=cpu).
"""

import numpy as np
import pytest

from tpufhe.ops.rns import RnsContext, RnsScaler, ScalingFactor

RNG = np.random.default_rng(7)

# NFLlib-style 62-bit primes (the bench.py regime) for a 3 -> 7 extension
Q3 = [4611686018326724609, 4611686018309947393, 4611686018282684417]
Q7 = Q3 + [
    4611686018257518593,
    4611686018232352769,
    4611686018171535361,
    4611686018106523649,
]
T = 1153


def _pack(xs):
    from tpufhe.ops.rq import pack_u64

    return pack_u64(np.array(xs, dtype=np.uint64).T)


def _unpack(out):
    from tpufhe.ops.rq import unpack_u64

    return unpack_u64(np.asarray(out)).T


def _run_both(monkeypatch, scaler, xs, starting_index, size):
    packed = _pack(xs)
    monkeypatch.setenv("TPUFHE_PALLAS_RNS", "0")
    ref = _unpack(scaler.scale(packed, starting_index, size))
    monkeypatch.setenv("TPUFHE_PALLAS_RNS", "1")
    got = _unpack(scaler.scale(packed, starting_index, size))
    return got, ref


def test_pallas_extend_parity(monkeypatch):
    """factor == 1, partial outputs: the pipeline's base extension."""
    N = 1024
    q = RnsContext(Q3)
    r = RnsContext(Q7)
    scaler = RnsScaler(q, r, ScalingFactor.one())
    xs = [[int(RNG.integers(0, m)) for m in Q3] for _ in range(N)]
    got, ref = _run_both(monkeypatch, scaler, xs, 3, 4)
    np.testing.assert_array_equal(got, ref)
    for idx in RNG.integers(0, N, size=5):
        want = scaler.scale_host(xs[idx], starting_index=3, size=4)
        assert [int(v) for v in got[idx]] == want


def test_pallas_downscale_parity(monkeypatch):
    """factor == t/q over a 7 -> 3 base: the pipeline's down-scaling."""
    N = 1024
    q = RnsContext(Q7)
    r = RnsContext(Q3)
    scaler = RnsScaler(q, r, ScalingFactor(T, q.modulus()))
    xs = [[int(RNG.integers(0, m)) for m in Q7] for _ in range(N)]
    got, ref = _run_both(monkeypatch, scaler, xs, 0, 3)
    np.testing.assert_array_equal(got, ref)
    for idx in RNG.integers(0, N, size=5):
        want = scaler.scale_host(xs[idx])
        assert [int(v) for v in got[idx]] == want


def test_pallas_batched_rows(monkeypatch):
    """Leading batch dims flatten into kernel grid rows (bt > 1)."""
    N = 1024
    q = RnsContext(Q7)
    r = RnsContext(Q3)
    scaler = RnsScaler(q, r, ScalingFactor(T, q.modulus()))
    polys = [
        [[int(RNG.integers(0, m)) for m in Q7] for _ in range(N)]
        for _ in range(4)
    ]
    packed = np.stack([_pack(p) for p in polys])  # (4, k, 2, S, L)
    monkeypatch.setenv("TPUFHE_PALLAS_RNS", "0")
    ref = np.asarray(scaler.scale(packed, 0, 3))
    monkeypatch.setenv("TPUFHE_PALLAS_RNS", "1")
    got = np.asarray(scaler.scale(packed, 0, 3))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("start,size,qin,qout,factor", [
    (3, 4, Q3, Q7, "one"),
    (0, 3, Q7, Q3, "tq"),
])
def test_pallas_bc_scaler_ab(monkeypatch, start, size, qin, qout, factor):
    """Balanced-byte (bitcast) scaler kernel == 7-bit kernel, explicitly
    both modes (independent of the TPUFHE_BC_SCALER default)."""
    N = 1024
    q = RnsContext(qin)
    r = RnsContext(qout)
    f = ScalingFactor.one() if factor == "one" else ScalingFactor(
        T, q.modulus())
    xs = [[int(RNG.integers(0, m)) for m in qin] for _ in range(N)]
    packed = _pack(xs)
    monkeypatch.setenv("TPUFHE_PALLAS_RNS", "1")
    monkeypatch.setenv("TPUFHE_BC_SCALER", "0")
    ref = _unpack(RnsScaler(q, r, f).scale(packed, start, size))
    monkeypatch.setenv("TPUFHE_BC_SCALER", "1")
    got = _unpack(RnsScaler(q, r, f).scale(packed, start, size))
    np.testing.assert_array_equal(got, ref)
