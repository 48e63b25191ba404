"""Parity tests for the fused Pallas tensor-product kernel.

The kernel (ops/pallas/tensor_kernel.py) must be bit-identical to the
XLA-graph tensor stage (6 Barrett muls + 2 adds) and to exact Python-int
arithmetic. Runs in Pallas interpret mode on CPU (tests/conftest.py pins
JAX_PLATFORMS=cpu). Reference behavior: fhe.rs bfv/ops/mod.rs:318-325.
"""

import numpy as np

from tpufhe.ops.rq import Context, pack_u64, unpack_u64

Q = [4611686018326724609, 4611686018309947393, 1152921504606830593]
N = 256
RNG = np.random.default_rng(11)


def _ctx():
    return Context(Q, N)


def _rand_poly():
    """(k, 2, S, 128) lane-folded canonical residues + the int matrix."""
    vals = np.array(
        [[int(RNG.integers(0, q)) for _ in range(N)] for q in Q],
        dtype=np.uint64,
    )
    return pack_u64(vals), vals


def test_tensor_kernel_parity(monkeypatch):
    ctx = _ctx()
    from tpufhe.ops.pallas.tensor_kernel import tensor_product_pallas

    packs, vals = zip(*[_rand_poly() for _ in range(4)])
    a0, a1, b0, b1 = packs
    va0, va1, vb0, vb1 = [v.astype(object) for v in vals]

    got = tensor_product_pallas(ctx, a0, a1, b0, b1, interpret=True)
    qcol = np.array(Q, dtype=object)[:, None]
    want = [
        (va0 * vb0) % qcol,
        (va0 * vb1 + va1 * vb0) % qcol,
        (va1 * vb1) % qcol,
    ]
    for g, w in zip(got, want):
        np.testing.assert_array_equal(
            unpack_u64(np.asarray(g)).astype(object), w)


def test_tensor_kernel_karatsuba_parity(monkeypatch):
    """TPUFHE_TENSOR_KARA=1: 3-mul Karatsuba form is bit-identical."""
    monkeypatch.setenv("TPUFHE_TENSOR_KARA", "1")
    ctx = _ctx()
    from tpufhe.ops.pallas.tensor_kernel import tensor_product_pallas

    packs, vals = zip(*[_rand_poly() for _ in range(4)])
    a0, a1, b0, b1 = packs
    va0, va1, vb0, vb1 = [v.astype(object) for v in vals]

    got = tensor_product_pallas(ctx, a0, a1, b0, b1, interpret=True)
    qcol = np.array(Q, dtype=object)[:, None]
    want = [
        (va0 * vb0) % qcol,
        (va0 * vb1 + va1 * vb0) % qcol,
        (va1 * vb1) % qcol,
    ]
    for g, w in zip(got, want):
        np.testing.assert_array_equal(
            unpack_u64(np.asarray(g)).astype(object), w)


def test_graph_karatsuba_parity(monkeypatch):
    """The XLA-graph Karatsuba tensor stage (no Pallas) is bit-identical."""
    import jax

    from tpufhe.pipeline import _tensor_for

    ctx = _ctx()
    packs, vals = zip(*[_rand_poly() for _ in range(4)])
    va0, va1, vb0, vb1 = [v.astype(object) for v in vals]

    monkeypatch.setenv("TPUFHE_PALLAS_TENSOR", "0")
    monkeypatch.setenv("TPUFHE_TENSOR_KARA", "1")
    tensor = _tensor_for(ctx)
    with jax.disable_jit():
        got = tensor(*packs)
    qcol = np.array(Q, dtype=object)[:, None]
    want = [
        (va0 * vb0) % qcol,
        (va0 * vb1 + va1 * vb0) % qcol,
        (va1 * vb1) % qcol,
    ]
    for g, w in zip(got, want):
        np.testing.assert_array_equal(
            unpack_u64(np.asarray(g)).astype(object), w)


def test_tensor_kernel_batched_odd_tile(monkeypatch):
    """Leading batch dims that don't divide the default tile."""
    ctx = _ctx()
    from tpufhe.ops.pallas.tensor_kernel import tensor_product_pallas

    B = 3  # forces bt fallback (3 % 8 != 0 -> bt = 3 -> 1)
    packs = []
    vals = []
    for _ in range(4):
        ps, vs = zip(*[_rand_poly() for _ in range(B)])
        packs.append(np.stack(ps))
        vals.append(np.stack([v.astype(object) for v in vs]))
    a0, a1, b0, b1 = packs
    va0, va1, vb0, vb1 = vals

    got = tensor_product_pallas(ctx, a0, a1, b0, b1, interpret=True)
    qcol = np.array(Q, dtype=object)[None, :, None]
    want = [
        (va0 * vb0) % qcol,
        (va0 * vb1 + va1 * vb0) % qcol,
        (va1 * vb1) % qcol,
    ]
    for g, w in zip(got, want):
        g = np.stack([unpack_u64(r) for r in np.asarray(g)]).astype(object)
        np.testing.assert_array_equal(g, w)


def test_pipeline_uses_tensor_kernel(monkeypatch):
    """make_mul_relin parity: Pallas tensor stage vs XLA-graph stage."""
    import jax

    from tpufhe.bfv import (
        BfvParameters,
        Encoding,
        Plaintext,
        RelinearizationKey,
        SecretKey,
    )
    from tpufhe.pipeline import make_mul_relin
    from tpufhe.utils.rngs import ChaCha8Rng, seed_from_u64

    par = BfvParameters.default(2, 256)  # 128-lane folded (kernel regime)
    r = ChaCha8Rng(seed_from_u64(99))
    sk = SecretKey.random(par, r)
    rk = RelinearizationKey.new(sk, r)
    t = par.plaintext.value
    va = RNG.integers(0, t, size=256, dtype=np.uint64)
    vb = RNG.integers(0, t, size=256, dtype=np.uint64)
    ca = sk.try_encrypt(Plaintext.try_encode(va, Encoding.poly(), par), r)
    cb = sk.try_encrypt(Plaintext.try_encode(vb, Encoding.poly(), par), r)
    args = (ca[0].coeffs, ca[1].coeffs, cb[0].coeffs, cb[1].coeffs)

    monkeypatch.setenv("TPUFHE_PALLAS_TENSOR", "0")
    f_ref = make_mul_relin(par, rk)
    with jax.disable_jit():
        r0, r1 = f_ref(*args)
    monkeypatch.setenv("TPUFHE_PALLAS_TENSOR", "1")
    f_pal = make_mul_relin(par, rk)
    with jax.disable_jit():
        p0, p1 = f_pal(*args)
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(p0))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(p1))
