"""Bit-exact parity of the MXU four-step NTT vs the butterfly reference.

The MXU path must produce identical arrays to tpufhe.ops.ntt (same
bit-reversed output order, canonical residues) so the two kernels are
interchangeable everywhere (CLAUDE.md bit-exactness convention).
"""

import numpy as np
import pytest

from tpufhe.ops import ntt as ntt_mod
from tpufhe.ops import ntt_mxu
from tpufhe.ops.ntt import NttOperator
from tpufhe.ops.zq import Modulus

N = 1024  # smallest lane-foldable size: (n1, n2) = (8, 128)
MODULI = [0x3FFFFFFF000001, 4611686018326724609, 1152921504606584833]


@pytest.fixture(scope="module")
def ops():
    return [NttOperator.new(Modulus(p), N) for p in MODULI]


@pytest.fixture(scope="module")
def plan(ops):
    return ntt_mxu.MxuNttPlan.new(ops)


def _tables(ops):
    def pairs(vals):
        a = np.stack([np.asarray(v, dtype=np.uint64) for v in vals])
        return np.stack([(a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                         (a >> np.uint64(32)).astype(np.uint32)], axis=1)

    omegas = pairs([op.omegas for op in ops])
    omegas_s = pairs([op.omegas_shoup for op in ops])
    zetas = pairs([op.zetas_inv for op in ops])
    zetas_s = pairs([op.zetas_inv_shoup for op in ops])

    def kpair(vals):
        a = np.array(vals, dtype=np.uint64)
        return ((a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                (a >> np.uint64(32)).astype(np.uint32))

    p = kpair([op.q.p for op in ops])
    p2 = kpair([2 * op.q.p for op in ops])
    ninv = kpair([op.size_inv for op in ops])
    ninv_s = kpair([op.size_inv_shoup for op in ops])
    return omegas, omegas_s, zetas, zetas_s, p, p2, ninv, ninv_s


def _rand_pairs(rng, ops, bound_mul=1):
    """(k, 2, n1, n2) uint32 pairs with values < bound_mul * p per limb."""
    vals = np.stack([
        rng.integers(0, bound_mul * op.q.p, size=N, dtype=np.uint64)
        for op in ops
    ])
    lo = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (vals >> np.uint64(32)).astype(np.uint32)
    return np.stack([lo, hi], axis=1).reshape(len(ops), 2, N // 128, 128)


def _flat(x):
    """(k, 2, n1, n2) -> (k, 2, N) for the butterfly API."""
    return np.asarray(x).reshape(x.shape[0], 2, -1)


def test_forward_parity(ops, plan):
    rng = np.random.default_rng(7)
    omegas, omegas_s, *_rest = _tables(ops)
    p, p2 = _rest[2], _rest[3]
    a = _rand_pairs(rng, ops)
    want = np.asarray(ntt_mod.forward(_flat(a), omegas, omegas_s, p, p2))
    got = np.asarray(ntt_mxu.forward_mxu(a, plan))
    np.testing.assert_array_equal(got.reshape(want.shape), want)


def test_forward_lazy_inputs(ops, plan):
    """Lazy key-switch inputs (< 4p) must reduce to the same canonical out."""
    rng = np.random.default_rng(8)
    omegas, omegas_s, *_rest = _tables(ops)
    p, p2 = _rest[2], _rest[3]
    a = _rand_pairs(rng, ops, bound_mul=4)
    want = np.asarray(ntt_mod.forward(_flat(a), omegas, omegas_s, p, p2))
    got = np.asarray(ntt_mxu.forward_mxu(a, plan))
    np.testing.assert_array_equal(got.reshape(want.shape), want)


def test_forward_lazy_output_bound(ops, plan):
    rng = np.random.default_rng(9)
    a = _rand_pairs(rng, ops)
    got = np.asarray(ntt_mxu.forward_mxu(a, plan, lazy=True)).reshape(len(ops), 2, N)
    vals = got[:, 0].astype(np.uint64) | (got[:, 1].astype(np.uint64) << np.uint64(32))
    for i, op in enumerate(ops):
        assert vals[i].max() < 2 * op.q.p
        canon = vals[i] % np.uint64(op.q.p)
        full = np.asarray(ntt_mxu.forward_mxu(a, plan)).reshape(len(ops), 2, N)
        fvals = full[i, 0].astype(np.uint64) | (full[i, 1].astype(np.uint64) << np.uint64(32))
        np.testing.assert_array_equal(canon, fvals)


def test_backward_parity(ops, plan):
    rng = np.random.default_rng(10)
    tabs = _tables(ops)
    zetas, zetas_s, p, p2, ninv, ninv_s = tabs[2], tabs[3], tabs[4], tabs[5], tabs[6], tabs[7]
    a = _rand_pairs(rng, ops)
    want = np.asarray(ntt_mod.backward(_flat(a), zetas, zetas_s, ninv, ninv_s, p, p2))
    got = np.asarray(ntt_mxu.backward_mxu(a, plan))
    np.testing.assert_array_equal(got.reshape(want.shape), want)


def test_rq_routing_parity(ops, monkeypatch):
    """ntt_forward_any/backward_any give identical arrays via the MXU route."""
    from tpufhe.ops import rq

    ctx = rq.Context([op.q.p for op in ops], N)
    rng = np.random.default_rng(12)
    a = _rand_pairs(rng, ops)

    monkeypatch.setenv("TPUFHE_MXU_NTT", "0")
    want_f = np.asarray(rq.ntt_forward_any(ctx, a))
    want_fl = np.asarray(rq.ntt_forward_any(ctx, a, lazy=True))
    want_b = np.asarray(rq.ntt_backward_any(ctx, want_f))
    monkeypatch.setenv("TPUFHE_MXU_NTT", "1")
    got_f = np.asarray(rq.ntt_forward_any(ctx, a))
    got_fl = np.asarray(rq.ntt_forward_any(ctx, a, lazy=True))
    got_b = np.asarray(rq.ntt_backward_any(ctx, got_f))

    np.testing.assert_array_equal(got_f, want_f)
    np.testing.assert_array_equal(got_b, want_b)
    # lazy bounds differ between kernels (< 2p vs < 4p); compare canonically
    for i, op in enumerate(ops):
        p = np.uint64(op.q.p)
        for arr_got, arr_want in ((got_fl, want_fl),):
            g = arr_got[i, 0].astype(np.uint64) | (
                arr_got[i, 1].astype(np.uint64) << np.uint64(32))
            w = arr_want[i, 0].astype(np.uint64) | (
                arr_want[i, 1].astype(np.uint64) << np.uint64(32))
            np.testing.assert_array_equal(g % p, w % p)

    # partial-limb slice (the Scaler's ncm.. forward path)
    sl = slice(1, 3)
    monkeypatch.setenv("TPUFHE_MXU_NTT", "0")
    want_s = np.asarray(rq.ntt_forward_any(ctx, a[1:3], limb_slice=sl))
    monkeypatch.setenv("TPUFHE_MXU_NTT", "1")
    got_s = np.asarray(rq.ntt_forward_any(ctx, a[1:3], limb_slice=sl))
    np.testing.assert_array_equal(got_s, want_s)


def test_full_pipeline_with_mxu_paths(monkeypatch):
    """mul+relin through the fused pipeline with BOTH MXU paths forced
    matches the object API bit-exactly (eager CPU, N=1024 wide limbs)."""
    import jax

    from tpufhe.bfv import (
        BfvParametersBuilder, Encoding, Plaintext, RelinearizationKey,
        SecretKey, ct_mul,
    )
    from tpufhe.pipeline import make_mul_relin
    from tpufhe.utils.rngs import ChaCha8Rng, seed_from_u64

    monkeypatch.setenv("TPUFHE_MXU_NTT", "1")
    monkeypatch.setenv("TPUFHE_MXU_RNS", "1")
    par = (BfvParametersBuilder().set_degree(1024)
           .set_plaintext_modulus(65537).set_moduli_sizes([62, 62]).build())
    r = ChaCha8Rng(seed_from_u64(77))
    sk = SecretKey.random(par, r)
    rk = RelinearizationKey.new(sk, r)
    t = par.plaintext.value
    rng = np.random.default_rng(13)
    va = rng.integers(0, t, size=1024, dtype=np.uint64)
    vb = rng.integers(0, t, size=1024, dtype=np.uint64)
    ca = sk.try_encrypt(Plaintext.try_encode(va, Encoding.simd(), par), r)
    cb = sk.try_encrypt(Plaintext.try_encode(vb, Encoding.simd(), par), r)

    monkeypatch.setenv("TPUFHE_MXU_NTT", "0")
    monkeypatch.setenv("TPUFHE_MXU_RNS", "0")
    want_ct = ct_mul(ca, cb)
    rk.relinearizes(want_ct)

    monkeypatch.setenv("TPUFHE_MXU_NTT", "1")
    monkeypatch.setenv("TPUFHE_MXU_RNS", "1")
    fn = make_mul_relin(par, rk)
    with jax.disable_jit():
        out0, out1 = fn(ca[0].coeffs, ca[1].coeffs, cb[0].coeffs, cb[1].coeffs)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(want_ct[0].coeffs))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(want_ct[1].coeffs))
    got = np.asarray(sk.try_decrypt(want_ct).try_decode(Encoding.simd()))
    np.testing.assert_array_equal(got.astype(np.uint64), (va * vb) % t)


def test_roundtrip_with_batch(ops, plan):
    """Batched (B, k, 2, n1, n2) forward->backward is the identity."""
    rng = np.random.default_rng(11)
    a = np.stack([_rand_pairs(rng, ops) for _ in range(3)])
    back = np.asarray(ntt_mxu.backward_mxu(ntt_mxu.forward_mxu(a, plan), plan))
    np.testing.assert_array_equal(back, a)


# ---------------------------------------------------------------------------
# Narrow (w30) MXU plan parity
# ---------------------------------------------------------------------------

MODULI32 = [1073707009, 1073698817, 1073692673]  # 30-bit, = 1 mod 2048


@pytest.fixture(scope="module")
def ops32():
    return [NttOperator.new(Modulus(p), N) for p in MODULI32]


@pytest.fixture(scope="module")
def plan32(ops32):
    return ntt_mxu.MxuNttPlan32.new(ops32)


def _tables32(ops):
    import numpy as _np

    om = _np.stack([op.omegas.astype(_np.uint32) for op in ops])
    oms = _np.stack([
        _np.array([op.q.shoup32(int(v)) for v in op.omegas], dtype=_np.uint32)
        for op in ops
    ])
    zi = _np.stack([op.zetas_inv.astype(_np.uint32) for op in ops])
    zis = _np.stack([
        _np.array([op.q.shoup32(int(v)) for v in op.zetas_inv],
                  dtype=_np.uint32)
        for op in ops
    ])
    p = _np.array([op.q.p for op in ops], dtype=_np.uint32)
    p2 = 2 * p
    ninv = _np.array([op.size_inv for op in ops], dtype=_np.uint32)
    ninvs = _np.array([op.q.shoup32(int(op.size_inv)) for op in ops],
                      dtype=_np.uint32)
    return om, oms, zi, zis, p, p2, ninv, ninvs


def _rand32(rng, ops, bound_mul=1):
    vals = np.stack([
        rng.integers(0, bound_mul * op.q.p, size=N, dtype=np.uint32)
        for op in ops
    ])
    return vals.reshape(len(ops), N // 128, 128)


@pytest.mark.parametrize("bound", [1, 3])
def test_forward32_parity(ops32, plan32, bound):
    rng = np.random.default_rng(21)
    om, oms, p, p2 = _tables32(ops32)[0], _tables32(ops32)[1], \
        _tables32(ops32)[4], _tables32(ops32)[5]
    a = _rand32(rng, ops32, bound)
    want = np.asarray(
        ntt_mod.forward32(a.reshape(len(ops32), N), om, oms, p, p2)
    )
    got = np.asarray(ntt_mxu.forward_mxu32(a, plan32))
    np.testing.assert_array_equal(got.reshape(want.shape), want)


def test_forward32_lazy_bound(ops32, plan32):
    rng = np.random.default_rng(22)
    a = _rand32(rng, ops32)
    got = np.asarray(ntt_mxu.forward_mxu32(a, plan32, lazy=True))
    full = np.asarray(ntt_mxu.forward_mxu32(a, plan32))
    for i, op in enumerate(ops32):
        assert got[i].max() < 2 * op.q.p
        np.testing.assert_array_equal(got[i] % np.uint32(op.q.p), full[i])


def test_backward32_parity(ops32, plan32):
    rng = np.random.default_rng(23)
    t = _tables32(ops32)
    zi, zis, p, p2, ninv, ninvs = t[2], t[3], t[4], t[5], t[6], t[7]
    a = _rand32(rng, ops32)
    want = np.asarray(
        ntt_mod.backward32(a.reshape(len(ops32), N), zi, zis, ninv, ninvs,
                           p, p2)
    )
    got = np.asarray(ntt_mxu.backward_mxu32(a, plan32))
    np.testing.assert_array_equal(got.reshape(want.shape), want)


def test_rq_routing32_parity(ops32, monkeypatch):
    """ntt_forward_any/backward_any via the narrow MXU route match the
    butterfly path bit-exactly on a narrow context."""
    monkeypatch.setenv("TPUFHE_MXU_NTT32", "1")
    from tpufhe.ops import rq

    ctx = rq.Context(tuple(MODULI32), N, narrow=True)
    rng = np.random.default_rng(24)
    a = _rand32(rng, ops32)[:, None]  # (k, 1, S, L)
    got_f = np.asarray(rq.ntt_forward_any(ctx, a))
    monkeypatch.setenv("TPUFHE_MXU_NTT32", "0")
    want_f = np.asarray(rq.ntt_forward_any(ctx, a))
    np.testing.assert_array_equal(got_f, want_f)

    monkeypatch.setenv("TPUFHE_MXU_NTT32", "1")
    got_b = np.asarray(rq.ntt_backward_any(ctx, a))
    monkeypatch.setenv("TPUFHE_MXU_NTT32", "0")
    want_b = np.asarray(rq.ntt_backward_any(ctx, a))
    np.testing.assert_array_equal(got_b, want_b)


def test_flat_lowering_parity(ops, plan, ops32, plan32, monkeypatch):
    """The flat 2D-matmul lowering produces bit-identical arrays to the
    einsum lowering, wide and narrow, forward (incl. lazy) and backward."""
    monkeypatch.setenv("TPUFHE_MXU_FLAT", "0")
    rng = np.random.default_rng(31)
    a = _rand_pairs(rng, ops, bound_mul=4)
    want_f = np.asarray(ntt_mxu.forward_mxu(a, plan))
    want_fl = np.asarray(ntt_mxu.forward_mxu(a, plan, lazy=True))
    want_b = np.asarray(ntt_mxu.backward_mxu(a, plan))
    a32 = _rand32(rng, ops32, 3)
    want32_f = np.asarray(ntt_mxu.forward_mxu32(a32, plan32))
    want32_b = np.asarray(ntt_mxu.backward_mxu32(a32, plan32))

    monkeypatch.setenv("TPUFHE_MXU_FLAT", "1")
    np.testing.assert_array_equal(
        np.asarray(ntt_mxu.forward_mxu(a, plan)), want_f)
    np.testing.assert_array_equal(
        np.asarray(ntt_mxu.forward_mxu(a, plan, lazy=True)) , want_fl)
    np.testing.assert_array_equal(
        np.asarray(ntt_mxu.backward_mxu(a, plan)), want_b)
    np.testing.assert_array_equal(
        np.asarray(ntt_mxu.forward_mxu32(a32, plan32)), want32_f)
    np.testing.assert_array_equal(
        np.asarray(ntt_mxu.backward_mxu32(a32, plan32)), want32_b)
