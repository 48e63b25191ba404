"""Single-lane (w30, p < 2^30) arithmetic and NTT parity tests."""

import numpy as np
import pytest

from tpufhe.ops import ntt as ntt_mod
from tpufhe.ops import zq32
from tpufhe.ops.pallas.ntt32_kernel import (
    build_limb_scalars32,
    build_stage_tables32,
    ntt32_pallas,
)
from tpufhe.ops.rq import Context, lane_shape, pack_u64
from tpufhe.ops.zq import Modulus
from tpufhe.utils.primes import generate_prime

RNG = np.random.default_rng(77)

N = 256
# 30-bit primes == 1 mod 2N (the TPU-native narrow regime)
P1 = generate_prime(30, 2 * N, 1 << 30)
P2 = generate_prime(30, 2 * N, P1)
P3 = generate_prime(24, 2 * N, 1 << 24)


def u32s(bound, shape):
    return RNG.integers(0, bound, size=shape, dtype=np.uint64).astype(np.uint32)


@pytest.mark.parametrize("p", [P1, P2, P3, (1 << 29) + 5])
def test_zq32_ops_exact(p):
    import jax.numpy as jnp

    q = Modulus(p)
    a = u32s(p, 512)
    b = u32s(p, 512)
    pj = jnp.uint32(p)

    np.testing.assert_array_equal(
        np.asarray(zq32.add_mod32(a, b, pj)),
        (a.astype(np.uint64) + b) % p)
    np.testing.assert_array_equal(
        np.asarray(zq32.sub_mod32(a, b, pj)),
        (a.astype(np.uint64) + p - b) % p)
    np.testing.assert_array_equal(
        np.asarray(zq32.neg_mod32(a, pj)),
        (p - a.astype(np.uint64)) % p)

    mu = q.mu64
    mu0, mu1 = np.uint32(mu & 0xFFFFFFFF), np.uint32(mu >> 32)
    np.testing.assert_array_equal(
        np.asarray(zq32.mul_mod32(a, b, mu0, mu1, pj)),
        (a.astype(object) * b.astype(object)) % p)

    # Shoup: b fixed < p, a ANY u32; lazy result in [0, 2p) and exact mod p
    a_any = u32s(1 << 32, 512)
    bs = np.array([q.shoup32(int(x)) for x in b], dtype=np.uint32)
    lazy = np.asarray(zq32.lazy_mul_shoup32(a_any, b, bs, pj))
    assert (lazy.astype(np.uint64) < 2 * p).all()
    np.testing.assert_array_equal(
        lazy.astype(np.uint64) % p,
        (a_any.astype(object) * b.astype(object)) % p)
    np.testing.assert_array_equal(
        np.asarray(zq32.mul_shoup32(a_any, b, bs, pj)).astype(np.uint64),
        (a_any.astype(object) * b.astype(object)) % p)


def _ntt32_consts(ctx):
    ops = ctx.ops
    om = np.stack([o.omegas.astype(np.uint32) for o in ops])
    oms = np.stack([
        np.array([o.q.shoup32(int(v)) for v in o.omegas], dtype=np.uint32)
        for o in ops])
    zi = np.stack([o.zetas_inv.astype(np.uint32) for o in ops])
    zis = np.stack([
        np.array([o.q.shoup32(int(v)) for v in o.zetas_inv], dtype=np.uint32)
        for o in ops])
    p = np.array([o.q.p for o in ops], dtype=np.uint32)
    p2 = 2 * p
    ninv = np.array([o.size_inv for o in ops], dtype=np.uint32)
    ninvs = np.array([o.q.shoup32(int(o.size_inv)) for o in ops],
                     dtype=np.uint32)
    return om, oms, zi, zis, p, p2, ninv, ninvs


def test_ntt32_matches_wide_path():
    """forward32/backward32 agree bit-exactly with the u64-pair transforms
    (both output canonical residues with identical twiddles)."""
    ctx = Context((P1, P2), N)
    om, oms, zi, zis, p, p2, ninv, ninvs = _ntt32_consts(ctx)

    mats = np.stack(
        [RNG.integers(0, m, size=N, dtype=np.uint64) for m in ctx.moduli])
    x32 = mats.astype(np.uint32)

    got = np.asarray(ntt_mod.forward32(x32, om, oms, p, p2))
    d = ctx.dev
    want = np.asarray(ntt_mod.forward(
        pack_u64(mats).reshape(2, 2, N), d.omegas, d.omegas_shoup,
        d.p, d.p2))
    want64 = want[:, 0, :].astype(np.uint64) | (
        want[:, 1, :].astype(np.uint64) << 32)
    np.testing.assert_array_equal(got.astype(np.uint64), want64)

    # bijection
    back = np.asarray(ntt_mod.backward32(got, zi, zis, ninv, ninvs, p, p2))
    np.testing.assert_array_equal(back, x32)

    # lazy forward: < 4p and exact mod p
    lazy = np.asarray(ntt_mod.forward32(x32, om, oms, p, p2, lazy=True))
    assert (lazy.astype(np.uint64) < (4 * p.astype(np.uint64))[:, None]).all()
    np.testing.assert_array_equal(
        lazy.astype(np.uint64) % p.astype(np.uint64)[:, None],
        got.astype(np.uint64) % p.astype(np.uint64)[:, None])


@pytest.mark.parametrize("inverse", [False, True])
@pytest.mark.parametrize("lazy", [False, True])
def test_ntt32_pallas_parity(inverse, lazy):
    if inverse and lazy:
        pytest.skip("no lazy inverse")
    ctx = Context((P1, P2), N)
    om, oms, zi, zis, p, p2, ninv, ninvs = _ntt32_consts(ctx)
    batch = 2
    x = np.stack([
        np.stack([RNG.integers(0, m, size=N, dtype=np.uint64).astype(np.uint32)
                  for m in ctx.moduli])
        for _ in range(batch)])  # (B, k, N)

    tables = np.stack(
        [build_stage_tables32(op, inverse) for op in ctx.ops])
    tables = tables.reshape(tables.shape[:-1] + lane_shape(N))
    scal = build_limb_scalars32(ctx.ops)
    xf = x.reshape(x.shape[:-1] + lane_shape(N))
    got = np.asarray(ntt32_pallas(xf, tables, scal, lazy=lazy,
                                  inverse=inverse, interpret=True))
    got = got.reshape(x.shape)

    if inverse:
        fwd = np.asarray(ntt_mod.forward32(x, om, oms, p, p2))
        want = np.asarray(ntt_mod.backward32(fwd, zi, zis, ninv, ninvs, p, p2))
        got2 = np.asarray(ntt32_pallas(
            fwd.reshape(fwd.shape[:-1] + lane_shape(N)), tables, scal,
            inverse=True, interpret=True)).reshape(x.shape)
        np.testing.assert_array_equal(got2, x)
    else:
        want = np.asarray(ntt_mod.forward32(x, om, oms, p, p2, lazy=lazy))
        np.testing.assert_array_equal(got, want)


def test_poly_narrow_wide_parity():
    """Every Poly op over a narrow context matches the wide (u64-pair)
    context on the same moduli, value for value."""
    moduli = (P1, P2, P3)
    cn = Context(moduli, N, narrow=True)
    cw = Context(moduli, N)
    from tpufhe.ops.rns import ScalingFactor
    from tpufhe.ops.rq import Poly, Scaler, SubstitutionExponent

    mat_a = np.stack(
        [RNG.integers(0, m, size=N, dtype=np.uint64) for m in moduli])
    mat_b = np.stack(
        [RNG.integers(0, m, size=N, dtype=np.uint64) for m in moduli])
    an, aw = Poly.from_u64_matrix(mat_a, cn), Poly.from_u64_matrix(mat_a, cw)
    bn, bw = Poly.from_u64_matrix(mat_b, cn), Poly.from_u64_matrix(mat_b, cw)
    assert an.coeffs.shape[-3] == 1 and aw.coeffs.shape[-3] == 2

    np.testing.assert_array_equal((an + bn).to_u64_matrix(),
                                  (aw + bw).to_u64_matrix())
    np.testing.assert_array_equal((an - bn).to_u64_matrix(),
                                  (aw - bw).to_u64_matrix())
    np.testing.assert_array_equal((-an).to_u64_matrix(),
                                  (-aw).to_u64_matrix())
    np.testing.assert_array_equal(an.scalar_mul(12345678901).to_u64_matrix(),
                                  aw.scalar_mul(12345678901).to_u64_matrix())

    fn, fw = an.into_ntt(), aw.into_ntt()
    np.testing.assert_array_equal(fn.to_u64_matrix(), fw.to_u64_matrix())
    np.testing.assert_array_equal(fn.into_power_basis().to_u64_matrix(), mat_a)
    gn, gw = bn.into_ntt(), bw.into_ntt()
    np.testing.assert_array_equal((fn * gn).to_u64_matrix(),
                                  (fw * gw).to_u64_matrix())

    sn = bn.into_ntt_shoup()
    sw = bw.into_ntt_shoup()
    np.testing.assert_array_equal((fn * sn).to_u64_matrix(),
                                  (fw * sw).to_u64_matrix())

    np.testing.assert_array_equal(an.switch_down().to_u64_matrix(),
                                  aw.switch_down().to_u64_matrix())

    en = SubstitutionExponent(cn, 3)
    ew = SubstitutionExponent(cw, 3)
    np.testing.assert_array_equal(fn.substitute(en).to_u64_matrix(),
                                  fw.substitute(ew).to_u64_matrix())
    np.testing.assert_array_equal(an.substitute(en).to_u64_matrix(),
                                  aw.substitute(ew).to_u64_matrix())

    # scaler: down-scale 3 -> 2 limbs with a rational factor
    tn = Context(moduli[:2], N, narrow=True)
    tw = Context(moduli[:2], N)
    scn = Scaler(cn, tn, ScalingFactor(65537, cn.modulus()))
    scw = Scaler(cw, tw, ScalingFactor(65537, cw.modulus()))
    np.testing.assert_array_equal(scn.scale(an).to_u64_matrix(),
                                  scw.scale(aw).to_u64_matrix())
    # extender (factor one, common moduli fast path)
    exn = Scaler(tn, cn, ScalingFactor.one())
    exw = Scaler(tw, cw, ScalingFactor.one())
    a2n = Poly.from_u64_matrix(mat_a[:2], tn, "ntt")
    a2w = Poly.from_u64_matrix(mat_a[:2], tw, "ntt")
    np.testing.assert_array_equal(exn.scale(a2n).to_u64_matrix(),
                                  exw.scale(a2w).to_u64_matrix())


def test_bfv_narrow_end_to_end():
    """Full scheme over a 30-bit-limb parameter set: SIMD encrypt ->
    mul+relin (object API AND fused pipeline) -> decrypt."""
    import jax

    from tpufhe.bfv import (BfvParametersBuilder, Encoding, Plaintext,
                            RelinearizationKey, SecretKey, ct_mul)
    from tpufhe.bfv.ciphertext import Ciphertext
    from tpufhe.ops.rq import NTT, Poly
    from tpufhe.pipeline import make_mul_relin
    from tpufhe.utils.rngs import ChaCha8Rng, seed_from_u64

    par = (BfvParametersBuilder()
           .set_degree(N)
           .set_plaintext_modulus(65537)
           .set_moduli_sizes([30, 30, 30, 30, 30])
           .build())
    assert par.context_at_level(0).narrow
    r = ChaCha8Rng(seed_from_u64(21))
    sk = SecretKey.random(par, r)
    rk = RelinearizationKey.new(sk, r)
    t = par.plaintext.value
    va = RNG.integers(0, t, size=N, dtype=np.uint64)
    vb = RNG.integers(0, t, size=N, dtype=np.uint64)
    ca = sk.try_encrypt(Plaintext.try_encode(va, Encoding.simd(), par), r)
    cb = sk.try_encrypt(Plaintext.try_encode(vb, Encoding.simd(), par), r)

    want = (va.astype(object) * vb.astype(object) % t).astype(np.uint64)

    ct = ct_mul(ca, cb)
    rk.relinearizes(ct)
    got = np.asarray(sk.try_decrypt(ct).try_decode(Encoding.simd()))
    np.testing.assert_array_equal(got, want)

    fn = make_mul_relin(par, rk)
    with jax.disable_jit():
        out0, out1 = fn(ca[0].coeffs, ca[1].coeffs, cb[0].coeffs, cb[1].coeffs)
    np.testing.assert_array_equal(np.asarray(out0),
                                  np.asarray(ct[0].coeffs))
    np.testing.assert_array_equal(np.asarray(out1),
                                  np.asarray(ct[1].coeffs))
