"""Fused, jit-compiled end-to-end BFV pipelines.

The object-level API (tpufhe.bfv) dispatches one XLA program per poly op,
which is convenient but leaves fusion on the table. This module builds
whole-operation programs — multiply+relinearize, encrypt, decrypt, rotate —
as single jitted functions over raw coefficient arrays with every constant
(twiddles, Barrett/Shoup tables, HPS omega matrices, keys) embedded. Leading
batch dimensions vectorize batches of ciphertexts; under a mesh, batch and
limb axes shard via jax.sharding and XLA inserts the collectives.

Dispatch-count discipline (this is what the profile said matters): every
NTT/iNTT in an operation is batched into as few Pallas calls as possible by
stacking polynomials along the leading batch axis —
- extend: all 4 input polys share one iNTT and one forward-NTT call;
- down-scale: c0/c1/c2 share one iNTT; only c0/c1 are forward-transformed
  (c2 is consumed in power basis by the key switch, so the reference's
  NTT-then-iNTT round trip on c2 — ops/mod.rs:326-332 followed by
  relinearization_key.rs:81 — is elided; both transforms are exact bijections
  so the result is bit-identical);
- key switch: all k decomposition rows are lifted in one lazy-NTT call
  (key_switching_key.rs:214-241).

Key material is embedded as NUMPY constants: XLA bakes those into the
executable's device image once, whereas captured jax.Array constants were
measured to re-stage per execution on this runtime.

This is the production serving path and the unit the driver benchmarks
(SURVEY.md section 2.9, BASELINE north star).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpufhe.bfv.parameters import BfvParameters
from tpufhe.ops import u64, zq
from tpufhe.ops.rq import (
    NTT,
    POWER_BASIS,
    Poly,
    _exp2,
    _fold,
    _unfold,
    ntt_backward_any,
    ntt_forward_any,
)


def _np_pairs(arr) -> np.ndarray:
    """Device array -> numpy (so jit embeds it as a baked literal)."""
    return np.asarray(arr)


def _pairs(a):
    return (a[..., 0, :, :], a[..., 1, :, :])


def _stack(r):
    return jnp.stack([r[0], r[1]], axis=-3)


def _ksk_consts(ksk):
    """Key-switching key material as numpy constants."""
    c0 = [(_np_pairs(p.coeffs), _np_pairs(p.coeffs_shoup)) for p in ksk.c0]
    c1 = [(_np_pairs(p.coeffs), _np_pairs(p.coeffs_shoup)) for p in ksk.c1]
    return c0, c1


def _pallas_tensor_on(ctx) -> tuple[bool, bool]:
    """(enabled, interpret) for the fused Pallas tensor-product kernel.

    TPUFHE_PALLAS_TENSOR=1 opts in (interpret mode off-TPU for parity
    tests). Opt-in until the on-chip A/B (benches/ab_r2c.sh) decides the
    default — one pass over the four operand polys instead of XLA's
    per-output fusions.
    """
    import os

    if ctx.narrow or ctx.degree % 128:
        return False, False
    if os.environ.get("TPUFHE_PALLAS_TENSOR", "") != "1":
        return False, False
    try:
        tpu = jax.default_backend() == "tpu"
    except Exception:
        tpu = False
    return True, not tpu


def _tensor_for(ctx):
    """(a0, a1, b0, b1) -> stacked (3, ...) tensor product (c0, c1, c2)."""
    import os

    mul_m, add_m = _ops_for(ctx)
    on, interp = _pallas_tensor_on(ctx)
    kara = (not ctx.narrow
            and os.environ.get("TPUFHE_TENSOR_KARA", "") == "1")
    if on:
        from tpufhe.ops.pallas.tensor_kernel import tensor_product_pallas

        def tensor(a0, a1, b0, b1):
            return tensor_product_pallas(ctx, a0, a1, b0, b1,
                                         interpret=interp)
    elif kara:
        from tpufhe.ops.pallas.tensor_kernel import tensor_karatsuba

        d = ctx.dev
        p = _exp2(d.p)
        bl, bh = _exp2(d.barrett_lo), _exp2(d.barrett_hi)

        def tensor(a0, a1, b0, b1):
            c0, c1, c2 = tensor_karatsuba(
                _pairs(a0), _pairs(a1), _pairs(b0), _pairs(b1), bl, bh, p)
            return jnp.stack([_stack(c0), _stack(c1), _stack(c2)])
    else:
        def tensor(a0, a1, b0, b1):
            c0 = mul_m(a0, b0)
            c1 = add_m(mul_m(a0, b1), mul_m(a1, b0))
            c2 = mul_m(a1, b1)
            return jnp.stack([c0, c1, c2])

    return tensor


def _ops_for(ctx):
    """(mul, add) elementwise mod-q closures over (..., k, 2|1, S, L)."""
    d = ctx.dev
    if ctx.narrow:
        from tpufhe.ops import zq32
        from tpufhe.ops.rq import _c32

        p32 = _c32(d.p32)
        mu0, mu1 = _c32(d.mu0), _c32(d.mu1)

        def mul(a, b):
            r = zq32.mul_mod32(a[..., 0, :, :], b[..., 0, :, :], mu0, mu1,
                               p32)
            return r[..., None, :, :]

        def add(a, b):
            r = zq32.add_mod32(a[..., 0, :, :], b[..., 0, :, :], p32)
            return r[..., None, :, :]

        return mul, add

    p = _exp2(d.p)
    bl, bh = _exp2(d.barrett_lo), _exp2(d.barrett_hi)

    def mul(a, b):
        return _stack(zq.mul_mod(_pairs(a), _pairs(b), bl, bh, p))

    def add(a, b):
        return _stack(zq.add_mod(_pairs(a), _pairs(b), p))

    return mul, add


def _ksk_digits(ctx, c2_pb):
    """Garner decomposition rows of power-basis c2, CANONICAL (< p).

    Returns (k, ..., k, 2|1, S, L): row i broadcast to every limb and
    fully reduced, so the forward lift can share one in_bits=62 NTT call
    with other canonical power-basis rows (the down-scale outputs). The
    extra conditional subtraction vs the lazy [0, 2p) form is one VPU op
    per element; bit-exactness is unaffected (NTT outputs are canonical
    either way).
    """
    d = ctx.dev
    k = ctx.k
    if ctx.narrow:
        from tpufhe.ops import zq32
        from tpufhe.ops.rq import _c32

        p32 = _c32(d.p32)
        mu0, mu1 = _c32(d.mu0), _c32(d.mu1)
        # (k, ..., 1, S, L) -> exact residues broadcast over the limb axis
        digits = jnp.moveaxis(c2_pb, -4, 0)[..., 0, :, :][..., None, :, :]
        r = zq32.reduce_u64_32(digits, jnp.zeros_like(digits), mu0, mu1, p32)
        lifted = r[..., None, :, :]
        return jnp.broadcast_to(
            lifted,
            (c2_pb.shape[-4],) + c2_pb.shape[:-4] + (k, 1)
            + c2_pb.shape[-2:],
        )

    p = _exp2(d.p)
    bl, bh = _exp2(d.barrett_lo), _exp2(d.barrett_hi)
    digits = jnp.moveaxis(c2_pb, -4, 0)[..., None, :, :, :]
    dp = _pairs(digits)
    import os as _os

    lzs = {q.leading_zeros for q in ctx.q}
    if (len(lzs) == 1 and 0 < next(iter(lzs)) < 32
            and all(q.supports_opt for q in ctx.q)
            and _os.environ.get("TPUFHE_OPT_RED", "") != "0"):
        r = zq.lazy_reduce_opt(dp, next(iter(lzs)), p)  # NFLlib Eq.(1)
    else:
        r = zq.lazy_reduce(dp, bl, bh, p)  # broadcasts limb axis to k
    r = zq.reduce1(r, p)  # canonical: shares the in_bits=62 digit mode
    lifted = _stack(r)
    # row axis = the INPUT's limb count (differs from ctx.k when the key
    # switch runs in a larger leveled context); limb axis = ctx.k
    return jnp.broadcast_to(
        lifted,
        (c2_pb.shape[-4],) + c2_pb.shape[:-4] + (k, 2) + c2_pb.shape[-2:],
    )


def _ksk_accumulate(ctx, lifted, ksk_c0, ksk_c1, const_slice=None):
    """sum_i d_i * ksk.c{0,1}_i with Shoup products on NTT-domain lifted
    rows (key_switching_key.rs:227-239). `const_slice` maps full-degree
    constants to the local coefficient block (sequence-sharded pipelines).
    """
    if const_slice is not None:
        ksk_c0 = [(const_slice(v), const_slice(vs)) for v, vs in ksk_c0]
        ksk_c1 = [(const_slice(v), const_slice(vs)) for v, vs in ksk_c1]
    d = ctx.dev
    k = ctx.k

    if ctx.narrow:
        from tpufhe.ops import zq32
        from tpufhe.ops.rq import _c32

        p32 = _c32(d.p32)
        acc0 = acc1 = None
        for i in range(len(ksk_c0)):  # decomposition rows (k_ct, may be < k)
            di = lifted[i][..., 0, :, :]
            t0 = zq32.mul_shoup32(
                di, ksk_c0[i][0][..., 0, :, :], ksk_c0[i][1][..., 0, :, :],
                p32)
            t1 = zq32.mul_shoup32(
                di, ksk_c1[i][0][..., 0, :, :], ksk_c1[i][1][..., 0, :, :],
                p32)
            if acc0 is None:
                acc0, acc1 = t0, t1
            else:
                acc0 = zq32.add_mod32(acc0, t0, p32)
                acc1 = zq32.add_mod32(acc1, t1, p32)
        return acc0[..., None, :, :], acc1[..., None, :, :]

    p = _exp2(d.p)
    acc0 = None
    acc1 = None
    for i in range(len(ksk_c0)):  # decomposition rows (k_ct, may be < k)
        di = _pairs(lifted[i])
        t0 = zq.mul_shoup(di, _pairs(ksk_c0[i][0]), _pairs(ksk_c0[i][1]), p)
        t1 = zq.mul_shoup(di, _pairs(ksk_c1[i][0]), _pairs(ksk_c1[i][1]), p)
        if acc0 is None:
            acc0, acc1 = t0, t1
        else:
            acc0 = zq.add_mod(acc0, t0, p)
            acc1 = zq.add_mod(acc1, t1, p)
    return _stack(acc0), _stack(acc1)


def _tensor_intt_on(ctx) -> tuple[bool, bool]:
    """(enabled, interpret) for the fused tensor-product + inverse-NTT
    Pallas kernel: the degree-2 tensor rows are computed in VMEM and
    immediately inverse-transformed, so the full multiplication-basis
    tensor never round-trips HBM. TPUFHE_TENSOR_INTT=0 opts out, =1
    forces (interpret mode off-TPU for parity tests)."""
    import os

    flag = os.environ.get("TPUFHE_TENSOR_INTT", "")
    if flag == "0" or ctx.narrow or ctx.degree < 1024 or ctx.degree % 128:
        return False, False
    try:
        tpu = jax.default_backend() == "tpu"
    except Exception:
        tpu = False
    if flag == "1":
        return True, not tpu
    return tpu, False


def _make_tensor_intt(ctx_mul, interpret: bool):
    from tpufhe.ops.pallas.mxu_ntt_kernel import tensor_intt_pallas
    from tpufhe.ops.rq import _mxu_b8_on

    b8 = _mxu_b8_on()
    in_planes = 8 if b8 else 9
    consts = ctx_mul.dev.mxu4_consts(slice(None), True, in_planes, b8)

    def fused(ext):
        # ext: (4, ..., k, 2, n1, 128) with the poly axis ALREADY leading
        lead = ext.shape[1:-4]
        x = ext.reshape((4, -1) + ext.shape[-4:])
        out = tensor_intt_pallas(x, consts, interpret=interpret, b8=b8)
        return out.reshape((3,) + lead + out.shape[-4:])

    return fused


def _ext_fuse_on(ctx) -> tuple[bool, bool]:
    """(enabled, interpret) for the fused extend iNTT+scale kernel
    (pallas/intt_scale_kernel.py): the power-basis residues of the
    extend stage never round-trip HBM between the inverse transform and
    the HPS base conversion. OPT-IN (TPUFHE_EXT_FUSE=1; interpret mode
    off-TPU for parity tests): the round-5 v5e A/B measured the fusion
    ~3.4% SLOWER than the split launches on every strategy (default
    6,640 -> 6,400; s2-kP1 8,075 -> 7,810/7,853 at bt 8/4) — holding all
    k limbs' iNTT constants resident shrinks the batch tile to <= 8 rows
    and forfeits the split iNTT kernel's bt=16 software-pipelined
    chunks, which outweighs the saved HBM round trip. Kept as a
    bit-exact measured-reject (tests/test_intt_scale.py)."""
    import os

    flag = os.environ.get("TPUFHE_EXT_FUSE", "")
    if flag != "1" or ctx.narrow or ctx.degree < 1024 or ctx.degree % 128:
        return False, False
    try:
        tpu = jax.default_backend() == "tpu"
    except Exception:
        tpu = False
    return True, not tpu


def _relin_tail_on(ctx) -> tuple[bool, bool]:
    """(enabled, interpret) for the fused relin-tail Pallas kernel
    (pallas/mxu_ntt_kernel.py relin_tail_pallas): the merged forward NTT,
    key-switch Shoup accumulation, and final adds in ONE kernel so the
    (k x batch) lifted rows never round-trip HBM. TPUFHE_RELIN_TAIL=0
    opts out, =1 forces (interpret mode off-TPU for parity tests)."""
    import os

    flag = os.environ.get("TPUFHE_RELIN_TAIL", "")
    if flag == "0" or ctx.narrow or ctx.degree < 1024 or ctx.degree % 128:
        return False, False
    try:
        tpu = jax.default_backend() == "tpu"
    except Exception:
        tpu = False
    if flag == "1":
        return True, not tpu
    return tpu, False


def _make_rotate_tail(ctx, ksk_c0, ksk_c1, interpret: bool):
    """(s0_ntt, digits) -> (s0 + ks0, ks1) via the fused rotate-tail
    kernel (mode='rotate' of relin_tail: merged decomposition-lift NTT +
    key-switch Shoup accumulation + the substituted-c0 add, one launch)."""
    from tpufhe.ops.pallas.mxu_ntt_kernel import (
        build_ksk_tail_consts,
        rotate_tail_pallas,
    )
    from tpufhe.ops.rq import _mxu_b8_on

    b8 = _mxu_b8_on()
    in_planes = 8 if b8 else 9  # canonical (< 2^62) digit rows
    ntt_consts = ctx.dev.mxu4_consts(slice(None), False, in_planes, b8)
    ksk_tail = build_ksk_tail_consts(ksk_c0, ksk_c1)

    def tail(s0, digits):
        stacked = jnp.concatenate([s0[None], digits], axis=0)
        lead = stacked.shape[1:-4]
        x = stacked.reshape((stacked.shape[0], -1) + stacked.shape[-4:])
        out = rotate_tail_pallas(x, ntt_consts, ksk_tail,
                                 interpret=interpret, b8=b8)
        return (out[0].reshape(lead + out.shape[-4:]),
                out[1].reshape(lead + out.shape[-4:]))

    return tail


def _make_relin_tail(ctx, ksk_c0, ksk_c1, interpret: bool):
    """(dsc01, digits) -> (c0+ks0, c1+ks1) via the fused tail kernel."""
    from tpufhe.ops.pallas.mxu_ntt_kernel import (
        build_ksk_tail_consts,
        relin_tail_pallas,
    )
    from tpufhe.ops.rq import _mxu_b8_on

    b8 = _mxu_b8_on()
    in_planes = 8 if b8 else 9  # canonical (< 2^62) inputs
    ntt_consts = ctx.dev.mxu4_consts(slice(None), False, in_planes, b8)
    ksk_tail = build_ksk_tail_consts(ksk_c0, ksk_c1)

    def tail(dsc01, digits):
        stacked = jnp.concatenate([dsc01, digits], axis=0)
        lead = stacked.shape[1:-4]
        x = stacked.reshape((stacked.shape[0], -1) + stacked.shape[-4:])
        out = relin_tail_pallas(x, ntt_consts, ksk_tail,
                                interpret=interpret, b8=b8)
        return (out[0].reshape(lead + out.shape[-4:]),
                out[1].reshape(lead + out.shape[-4:]))

    return tail


def _key_switch_batched(ctx, c2_pb, ksk_c0, ksk_c1, ntt_fwd=None,
                        const_slice=None):
    """Garner-decomposition key switch on power-basis coeffs (..., k, 2|1, S, L).

    Lifts every decomposition row in ONE forward NTT, then accumulates
    sum_i d_i * ksk.c{0,1}_i with Shoup products (key_switching_key.rs:214-241).
    Standalone form (Galois rotation path); the mul+relin pipeline merges
    the lift NTT with the down-scale forward NTT instead.
    """
    if ntt_fwd is None:
        ntt_fwd = ntt_forward_any
    lifted = _ksk_digits(ctx, c2_pb)
    lifted = ntt_fwd(ctx, lifted, lazy=True, in_bits=62)  # ONE call
    return _ksk_accumulate(ctx, lifted, ksk_c0, ksk_c1,
                           const_slice=const_slice)


def build_mul_relin_step(par: BfvParameters, rk, level: int = 0,
                         ntt_fwd=None, ntt_bwd=None, const_slice=None,
                         strategy2_primes: int | None = None):
    """Un-jitted (a0, a1, b0, b1) -> (c0, c1) multiply+relinearize step.

    Implements extend -> tensor -> down-scale (ops/mod.rs:259-341) followed
    by the garner-decomposition key switch (key_switching_key.rs:214-241)
    as one traceable function. `ntt_fwd`/`ntt_bwd` override the transform
    implementation (the sequence-sharded pipeline substitutes the
    distributed four-step NTT; see parallel/seq_pipeline.py).

    strategy2_primes=kP selects the SECOND multiplication strategy of
    eprint 2021/204 (shown in the reference's tests, ops/mul.rs:353-402):
    lhs extends exactly (factor 1) into q (+) P with P a product of kP
    fresh 62-bit primes, rhs is scaled by P/q into the same basis, and the
    tensor is post-scaled by t/P. The key soundness fact (why P does NOT
    need to exceed the ~2^388 tensor bound of the first strategy,
    ROOFLINE.md round-3 audit): the tensor is only known mod q*P, but a
    wrap of m*q*P changes round(t*C/P) by exactly t*m*q == 0 (mod q), so
    wrapping is harmless for the t/P post-scale — unlike the default t/q
    post-scale, where a wrap adds t*m*P != 0 (mod q). The cost is noise:
    the rhs rounding error eps (|eps| <= 1/2 per coefficient) enters the
    tensor as x1*eps and lands as ~N*t*q/(2P) noise, so P must satisfy
    P >> N*t^2 * 2^(noise margin). Transform ledger: 42 + 7*kP
    limb-transforms per op vs 64 for the default strategy (kP=1: 49,
    kP=2: 56).
    """
    if ntt_fwd is None:
        ntt_fwd = ntt_forward_any
    if ntt_bwd is None:
        ntt_bwd = ntt_backward_any
    ctx_lvl = par.context_level_at(level)
    ctx = ctx_lvl.poly_context
    ksk = rk.ksk
    assert ksk.ciphertext_level == level and ksk.ksk_level == level
    if strategy2_primes is None:
        mp = ctx_lvl.mul_params()
        ctx_mul = mp.extender.to_ctx
        ext_rns = mp.extender.rns_scaler
        rhs_rns = None
        down_rns = mp.down_scaler.rns_scaler
        assert mp.extender.number_common_moduli == ctx.k
    else:
        from tpufhe.ops.rq import Context as _Ctx, Scaler as _Scaler
        from tpufhe.ops.rns import ScalingFactor as _SF
        from tpufhe.utils.primes import generate_prime as _genp

        basis = list(ctx.moduli)
        upper = 1 << 62
        p_prod = 1
        while len(basis) != ctx.k + strategy2_primes:
            upper = _genp(62, 2 * par.degree(), upper)
            if upper not in basis:
                basis.append(upper)
                p_prod *= upper
        ctx_mul = _Ctx(tuple(basis), par.degree())
        q_prod = ctx.modulus()
        ext_rns = _Scaler(ctx, ctx_mul, _SF.one()).rns_scaler
        rhs_rns = _Scaler(ctx, ctx_mul, _SF(p_prod, q_prod)).rns_scaler
        down_rns = _Scaler(
            ctx_mul, ctx, _SF(par.plaintext.value, p_prod)).rns_scaler
    k, k_mul = ctx.k, ctx_mul.k
    tensor_m = _tensor_for(ctx_mul)
    _, add_c = _ops_for(ctx)
    ksk_c0, ksk_c1 = _ksk_consts(ksk)
    tail_on, tail_interp = _relin_tail_on(ctx)
    tail_on &= ntt_fwd is ntt_forward_any and const_slice is None
    from tpufhe.ops.pallas.mxu_ntt_kernel import tail_kernel_fits

    tail_on &= tail_kernel_fits(ctx.degree // 128, 2 + len(ksk_c0),
                                len(ksk_c0))
    tail = (_make_relin_tail(ctx, ksk_c0, ksk_c1, tail_interp)
            if tail_on else None)
    tintt_on, tintt_interp = _tensor_intt_on(ctx_mul)
    tintt_on &= ntt_bwd is ntt_backward_any
    tintt = _make_tensor_intt(ctx_mul, tintt_interp) if tintt_on else None

    # fused extend iNTT+scale (round 5): one launch computes the inverse
    # transform of all input limbs AND the HPS base conversion per batch
    # tile, replacing the ntt_bwd + scale pair
    from tpufhe.ops.pallas.intt_scale_kernel import (
        intt_scale_ok,
        intt_scale_pallas,
    )

    extf_on, extf_interp = _ext_fuse_on(ctx)
    extf_on &= ntt_bwd is ntt_backward_any and const_slice is None
    ext_fused = rhs_fused = None
    if extf_on and intt_scale_ok(ctx, ext_rns, k, k_mul - k):
        ext_fused = partial(intt_scale_pallas, ctx=ctx, scaler=ext_rns,
                            starting_index=k, size=k_mul - k,
                            interpret=extf_interp)
    if (extf_on and rhs_rns is not None
            and intt_scale_ok(ctx, rhs_rns, 0, k_mul)):
        rhs_fused = partial(intt_scale_pallas, ctx=ctx, scaler=rhs_rns,
                            starting_index=0, size=k_mul,
                            interpret=extf_interp)

    def step(a0, a1, b0, b1):
        x = jnp.stack([a0, a1, b0, b1])  # (4, ..., k, 2|1, S, L)
        # extend to the multiplication basis (ops/mod.rs:307-317)
        if rhs_rns is None:
            if ext_fused is not None:
                new_rows = ext_fused(x)
            else:
                x_pb = ntt_bwd(ctx, x, in_bits=62)
                new_rows = ext_rns.scale(x_pb, starting_index=k,
                                         size=k_mul - k)
            new_rows = ntt_fwd(ctx_mul, new_rows,
                               limb_slice=slice(k, k_mul), in_bits=62)
            ext = jnp.concatenate([x, new_rows], axis=-4)
        else:
            # strategy 2: lhs keeps the factor-1 common-moduli fast path;
            # rhs is scaled by P/q so ALL its mul-basis rows are fresh
            if ext_fused is not None and rhs_fused is not None:
                lhs_new = ext_fused(x[:2])
                rhs_rows = rhs_fused(x[2:])
            else:
                x_pb = ntt_bwd(ctx, x, in_bits=62)
                lhs_new = ext_rns.scale(x_pb[:2], starting_index=k,
                                        size=k_mul - k)
                rhs_rows = rhs_rns.scale(x_pb[2:], starting_index=0,
                                         size=k_mul)
            lhs_new = ntt_fwd(ctx_mul, lhs_new,
                              limb_slice=slice(k, k_mul), in_bits=62)
            lhs_ext = jnp.concatenate([x[:2], lhs_new], axis=-4)
            rhs_ext = ntt_fwd(ctx_mul, rhs_rows, in_bits=62)
            ext = jnp.concatenate([lhs_ext, rhs_ext], axis=0)

        if tintt is not None:
            # fused tensor + down-scale iNTT (ops/mod.rs:318-332): the
            # tensor rows are formed and inverse-transformed in VMEM;
            # ext's leading poly axis feeds the kernel directly
            t_pb = tintt(ext)
        else:
            a0e, a1e, b0e, b1e = (ext[i] for i in range(4))
            # tensor product (ops/mod.rs:318-325), parts pre-stacked
            t = tensor_m(a0e, a1e, b0e, b1e)
            # down-scale by t/q (ops/mod.rs:326-332)
            t_pb = ntt_bwd(ctx_mul, t, in_bits=62)
        dsc = down_rns.scale(t_pb, starting_index=0, size=k)  # power basis

        # MERGED forward transform: the down-scaled c0/c1 (2 polys) and
        # the key-switch decomposition lift of c2 (k broadcast rows,
        # relinearization_key.rs:71-98) all consume canonical power-basis
        # rows, so they share ONE forward-NTT launch (2+k polys, k limbs
        # each) instead of two — fewer dispatches and a larger MXU batch
        # per kernel grid.
        digits = _ksk_digits(ctx, dsc[2])
        if tail is not None:
            # fused tail kernel: NTT + key-switch accumulate + adds in
            # VMEM (the lifted rows never round-trip HBM)
            return tail(dsc[:2], digits)
        stacked = jnp.concatenate([dsc[:2], digits], axis=0)
        ntts = ntt_fwd(ctx, stacked, in_bits=62)
        c01, lifted = ntts[:2], ntts[2:]
        ks0, ks1 = _ksk_accumulate(ctx, lifted, ksk_c0, ksk_c1,
                                   const_slice=const_slice)
        return add_c(c01[0], ks0), add_c(c01[1], ks1)

    return step


def make_mul_relin(par: BfvParameters, rk, level: int = 0,
                   strategy2_primes: int | None = None):
    """Jitted (a, b) -> a*b relinearized, on raw (..., k, 2, N) uint32
    arrays, in ONE XLA program with exactly 5 Pallas NTT calls.
    strategy2_primes selects the eprint 2021/204 second multiplication
    strategy (see build_mul_relin_step)."""
    return jax.jit(build_mul_relin_step(
        par, rk, level, strategy2_primes=strategy2_primes))


def make_square_relin(par: BfvParameters, rk, level: int = 0):
    """Jitted squaring + relinearization (the bfv/square benchmark)."""
    ctx_lvl = par.context_level_at(level)
    ctx = ctx_lvl.poly_context
    mp = ctx_lvl.mul_params()
    ksk = rk.ksk
    ctx_mul = mp.extender.to_ctx
    k, k_mul = ctx.k, ctx_mul.k
    ext_rns = mp.extender.rns_scaler
    down_rns = mp.down_scaler.rns_scaler
    tensor_m = _tensor_for(ctx_mul)
    _, add_c = _ops_for(ctx)
    ksk_c0, ksk_c1 = _ksk_consts(ksk)

    def step(a0, a1):
        x = jnp.stack([a0, a1])
        x_pb = ntt_backward_any(ctx, x, in_bits=62)
        new_rows = ext_rns.scale(x_pb, starting_index=k, size=k_mul - k)
        new_rows = ntt_forward_any(ctx_mul, new_rows,
                                   limb_slice=slice(k, k_mul), in_bits=62)
        ext = jnp.concatenate([x, new_rows], axis=-4)
        a0e, a1e = ext[0], ext[1]

        # square fast-path: c1 = 2*a0*a1 via the same fused tensor kernel
        t = tensor_m(a0e, a1e, a0e, a1e)

        t_pb = ntt_backward_any(ctx_mul, t, in_bits=62)
        dsc = down_rns.scale(t_pb, starting_index=0, size=k)

        # merged c0/c1 + key-switch-lift forward NTT (see make_mul_relin)
        digits = _ksk_digits(ctx, dsc[2])
        stacked = jnp.concatenate([dsc[:2], digits], axis=0)
        ntts = ntt_forward_any(ctx, stacked, in_bits=62)
        c01, lifted = ntts[:2], ntts[2:]
        ks0, ks1 = _ksk_accumulate(ctx, lifted, ksk_c0, ksk_c1)
        return add_c(c01[0], ks0), add_c(c01[1], ks1)

    return jax.jit(step)


def make_decrypt_phase(par: BfvParameters, sk, level: int = 0):
    """Jitted phase + t/q scaling: (c0, c1) -> plaintext-context residues.

    The secret key enters as a runtime argument (bound with partial), so
    one compiled program serves every secret key of the same parameters.
    The final small mod-t fold stays host-side (it needs exact big ints
    only on the first limb row, secret_key.rs:233-260).
    """
    ctx = par.context_at_level(level)
    ctx_lvl = par.context_level_at(level)
    s_np = _np_pairs(
        Poly.from_i64_coeffs(sk.coeffs, ctx).into_ntt().coeffs)
    scaler = ctx_lvl.cipher_plain_context.scaler

    @partial(jax.jit)
    def step(c0, c1, s_coeffs):
        p0 = Poly(ctx, NTT, c0)
        p1 = Poly(ctx, NTT, c1)
        phase = p0 + (p1 * Poly(ctx, NTT, s_coeffs))
        d = scaler.scale(phase.into_power_basis())
        return d.coeffs

    def bound(c0, c1):
        return step(c0, c1, s_np)

    return bound


def make_encrypt_with_seed_expansion(par: BfvParameters, sk, level: int = 0):
    """Jitted symmetric encryption core: given the seed-expanded uniform a
    (already NTT-domain values), the power-basis error e, and the message
    poly m, compute b = e - a*s + m in one program (secret_key.rs:102-137).
    Sampling stays host-side (ChaCha8 parity); the error NTT and all the
    arithmetic fuse. The secret key is a runtime argument, so one
    executable serves every key of the same parameters."""
    ctx = par.context_at_level(level)
    s_np = _np_pairs(
        Poly.from_i64_coeffs(sk.coeffs, ctx).into_ntt().coeffs)

    @partial(jax.jit)
    def step(a, e_pb, m, s_coeffs):
        pa = Poly(ctx, NTT, a)
        pe = Poly(ctx, POWER_BASIS, e_pb).into_ntt()
        pm = Poly(ctx, NTT, m)
        b = (pe - (pa * Poly(ctx, NTT, s_coeffs))) + pm
        return b.coeffs

    def bound(a, e_pb, m):
        return step(a, e_pb, m, s_np)

    return bound


def make_pk_encrypt(par: BfvParameters, level: int = 0):
    """Jitted public-key encryption core (public_key.rs:24-37): given the
    power-basis u/e1/e2 samples, the message poly, and the public key,
    compute (u*pk0 + e1 + m, u*pk1 + e2) with all three forward NTTs in a
    single batched call."""
    ctx = par.context_at_level(level)

    @partial(jax.jit)
    def step(u_pb, e1_pb, e2_pb, m, pk0, pk1):
        ntts = ntt_forward_any(ctx, jnp.stack([u_pb, e1_pb, e2_pb]))
        pu = Poly(ctx, NTT, ntts[0])
        pe1 = Poly(ctx, NTT, ntts[1])
        pe2 = Poly(ctx, NTT, ntts[2])
        p0 = Poly(ctx, NTT, pk0)
        p1 = Poly(ctx, NTT, pk1)
        pm = Poly(ctx, NTT, m)
        c0 = (pu * p0) + pe1 + pm
        c1 = (pu * p1) + pe2
        return c0.coeffs, c1.coeffs

    return step


def make_rotate(par: BfvParameters, gk, level: int = 0):
    """Jitted Galois rotation (substitute + key switch + add).

    Uses the fused rotate-tail kernel on TPU (one launch for the
    decomposition-lift NTT + key-switch accumulation + the substituted-c0
    add; _rotate_step), propagating the round-3 relin-tail structure to
    the rotation path (VERDICT r3 item 5)."""
    ctx = par.context_at_level(level)
    ksk_c0, ksk_c1 = _ksk_consts(gk.ksk)
    _, add_c = _ops_for(ctx)
    rot = _rotate_step(ctx, np.asarray(gk.element.perm_ntt), ksk_c0,
                       ksk_c1, add_c)
    return jax.jit(rot)


def _ops3_for(ctx):
    """(mul_shoup, add, sub) elementwise closures over (..., k, 2|1, S, L).

    mul_shoup takes (a, const_pair, const_shoup_pair) with the constants
    as baked numpy arrays (NttShoup polys)."""
    d = ctx.dev
    if ctx.narrow:
        from tpufhe.ops import zq32
        from tpufhe.ops.rq import _c32

        p32 = _c32(d.p32)

        def mul_shoup(a, c, cs):
            r = zq32.mul_shoup32(a[..., 0, :, :], c[..., 0, :, :],
                                 cs[..., 0, :, :], p32)
            return r[..., None, :, :]

        def add(a, b):
            return zq32.add_mod32(a[..., 0, :, :], b[..., 0, :, :],
                                  p32)[..., None, :, :]

        def sub(a, b):
            return zq32.sub_mod32(a[..., 0, :, :], b[..., 0, :, :],
                                  p32)[..., None, :, :]

        return mul_shoup, add, sub

    p = _exp2(d.p)

    def mul_shoup(a, c, cs):
        return _stack(zq.mul_shoup(_pairs(a), _pairs(c), _pairs(cs), p))

    def add(a, b):
        return _stack(zq.add_mod(_pairs(a), _pairs(b), p))

    def sub(a, b):
        return _stack(zq.sub_mod(_pairs(a), _pairs(b), p))

    return mul_shoup, add, sub


def _rotate_step(ctx, perm, ksk_c0, ksk_c1, add_c):
    """(c0, c1) -> Galois-rotated ciphertext (galois_key.rs:90-124):
    substitute both parts, key-switch the substituted c1, add. On TPU the
    lift NTT + accumulation + add run as ONE fused launch (rotate-mode
    tail kernel); off-TPU (and under TPUFHE_RELIN_TAIL=0) the composition
    is the separate batched NTT + XLA accumulate — bit-identical."""
    perm_j = jnp.asarray(perm)
    tail_on, tail_interp = _relin_tail_on(ctx)
    from tpufhe.ops.pallas.mxu_ntt_kernel import tail_kernel_fits

    tail_on &= tail_kernel_fits(ctx.degree // 128, 1 + len(ksk_c0),
                                len(ksk_c0))
    tail = (_make_rotate_tail(ctx, ksk_c0, ksk_c1, tail_interp)
            if tail_on else None)

    def rot(c0, c1):
        s0 = _fold(jnp.take(_unfold(c0), perm_j, axis=-1))
        s1 = _fold(jnp.take(_unfold(c1), perm_j, axis=-1))
        c2_pb = ntt_backward_any(ctx, s1, in_bits=62)
        if tail is not None:
            digits = _ksk_digits(ctx, c2_pb)
            return tail(s0, digits)
        ks0, ks1 = _key_switch_batched(ctx, c2_pb, ksk_c0, ksk_c1)
        return add_c(ks0, s0), ks1

    return rot


def _rotate_step_leveled(ctx_ct, ctx_ksk, perm, ksk_c0, ksk_c1, add_c):
    """Leveled fused rotate: ciphertext at ctx_ct, key switch in the
    LARGER ctx_ksk (galois_key.rs:62-87 with galois_key_level <
    ciphertext_level). The substituted c1's garner digits are reduced mod
    every ksk modulus, lifted with one lazy NTT over ctx_ksk, accumulated
    against the ksk rows there, then divide+rounded back down to ctx_ct
    (Poly.switch_down semantics, eprint 2018/931 Alg. 2) — the extra
    modulus divides the key-switch noise, which is what makes deep
    oblivious expansions (MulPIR level_count=7) decryptable."""
    perm_j = jnp.asarray(perm)

    def rot(c0, c1):
        s0 = _fold(jnp.take(_unfold(c0), perm_j, axis=-1))
        s1 = _fold(jnp.take(_unfold(c1), perm_j, axis=-1))
        c2_pb = ntt_backward_any(ctx_ct, s1, in_bits=62)
        digits = _ksk_digits(ctx_ksk, c2_pb)  # (k_ct, ..., k_ksk, 2|1, S, L)
        lifted = ntt_forward_any(ctx_ksk, digits, lazy=True, in_bits=62)
        ks0, ks1 = _ksk_accumulate(ctx_ksk, lifted, ksk_c0, ksk_c1)
        ks_pb = ntt_backward_any(ctx_ksk, jnp.stack([ks0, ks1]), in_bits=62)
        from tpufhe.ops.rq import _switch_down_fn

        cur = ctx_ksk
        while cur is not ctx_ct:
            ks_pb = _switch_down_fn(cur)(ks_pb)
            cur = cur.next_context
        ks = ntt_forward_any(ctx_ct, ks_pb, in_bits=62)
        return add_c(ks[0], s0), ks[1]

    return rot


def make_inner_sum(par: BfvParameters, ek, level: int = 0):
    """Jitted inner sum: log2(n/2) column rotations + 1 row rotation, each
    a fused substitute+key-switch, accumulated in ONE program
    (evaluation_key.rs:56-82; BASELINE config #4 'inner-product circuit')."""
    ctx = par.context_at_level(level)
    n = par.degree()
    _, add_c = _ops_for(ctx)

    rots = []
    i = 1
    while i < n // 2:
        gk = ek.gk[ek.rot_to_gk_exponent[i]]
        rots.append(_rotate_step(ctx, np.asarray(gk.element.perm_ntt),
                                 *_ksk_consts(gk.ksk), add_c))
        i *= 2
    gk = ek.gk[2 * n - 1]
    rots.append(_rotate_step(ctx, np.asarray(gk.element.perm_ntt),
                             *_ksk_consts(gk.ksk), add_c))

    def step(c0, c1):
        for rot in rots:
            r0, r1 = rot(c0, c1)
            c0, c1 = add_c(c0, r0), add_c(c1, r1)
        return c0, c1

    return jax.jit(step)


def build_expand_step(par: BfvParameters, ek, level_count: int,
                      level: int = 0):
    """Un-jitted oblivious expansion (Angel et al., evaluation_key.rs:153-193)
    into 2^level_count ciphertexts, fully fused: at doubling level l ALL
    2^l live ciphertexts rotate in one batched substitute+key-switch and
    the monomial x^{-2^l} fold is one Shoup multiply by a baked constant.

    (c0, c1) of shape (B, k, 2|1, S, L) -> (2^level_count, B, k, 2|1, S, L)
    pair, bit-identical to EvaluationKey.expands.
    """
    ctx = par.context_at_level(level)
    n = par.degree()
    mul_s, add_c, sub_c = _ops3_for(ctx)

    levels = []
    for l in range(level_count):
        gk = ek.gk[(n >> l) + 1]
        mono = ek.monomials[l]
        levels.append((
            np.asarray(gk.element.perm_ntt),
            _ksk_consts(gk.ksk),
            _np_pairs(mono.coeffs),
            _np_pairs(mono.coeffs_shoup),
            gk.ksk.ctx_ksk,  # leveled keys switch in the larger context
        ))

    def step(c0, c1):
        cur0, cur1 = c0[None], c1[None]  # (1, B, ...)
        for perm, (kc0, kc1), mono, mono_s, ctx_ksk in levels:
            if ctx_ksk is ctx:
                rot = _rotate_step(ctx, perm, kc0, kc1, add_c)
            else:
                rot = _rotate_step_leveled(ctx, ctx_ksk, perm, kc0, kc1,
                                           add_c)
            sub0, sub1 = rot(cur0, cur1)
            new0 = mul_s(sub_c(cur0, sub0), mono, mono_s)
            new1 = mul_s(sub_c(cur1, sub1), mono, mono_s)
            cur0 = jnp.concatenate([add_c(cur0, sub0), new0])
            cur1 = jnp.concatenate([add_c(cur1, sub1), new1])
        return cur0, cur1

    return step


def make_expand(par: BfvParameters, ek, level_count: int, level: int = 0):
    return jax.jit(build_expand_step(par, ek, level_count, level))


def make_pir_response(par: BfvParameters, ek, rk, db_pts, dim1: int,
                      dim2: int, level: int = 0):
    """Jitted MulPIR server response (examples/mulpir.rs:163-183): ONE
    program that expands the query to dim1+dim2 ciphertexts, dot-products
    the first dim1 against the plaintext database columns, multiplies each
    of the dim2 second-dimension selectors against its column response
    (extend -> tensor accumulated in the multiplication basis), then
    down-scales and relinearizes ONCE.

    db_pts: (dim1, dim2) array of plaintext NTT polys as raw residue
    arrays (k, 2|1, S, L) — baked into the program as constants.
    """
    level_count = (dim1 + dim2 - 1).bit_length()
    ctx_lvl = par.context_level_at(level)
    ctx = ctx_lvl.poly_context
    mp = ctx_lvl.mul_params()
    ctx_mul = mp.extender.to_ctx
    k, k_mul = ctx.k, ctx_mul.k
    ext_rns = mp.extender.rns_scaler
    down_rns = mp.down_scaler.rns_scaler
    mul_c, add_c = _ops_for(ctx)
    mul_m, add_m = _ops_for(ctx_mul)
    ksk_c0, ksk_c1 = _ksk_consts(rk.ksk)
    expand = build_expand_step(par, ek, level_count, level)
    db = np.asarray(db_pts)  # (dim1, dim2, k, 2|1, S, L)

    def step(c0, c1):
        e0, e1 = expand(c0, c1)  # (2^L, B, ...)

        # first dimension: resp[j] = sum_i db[i, j] * exp_i (pt-mul dots)
        q0, q1 = e0[:dim1], e1[:dim1]
        r0 = []
        r1 = []
        for j in range(dim2):
            acc0 = acc1 = None
            for i in range(dim1):
                w = jnp.asarray(db[i, j])
                t0, t1 = mul_c(q0[i], w), mul_c(q1[i], w)
                acc0 = t0 if acc0 is None else add_c(acc0, t0)
                acc1 = t1 if acc1 is None else add_c(acc1, t1)
            r0.append(acc0)
            r1.append(acc1)

        # second dimension: extend everything to the multiplication basis
        # and accumulate the tensor sum_j exp2_j (x) resp_j, then ONE
        # down-scale + relinearize (ops/mod.rs:259-341 done once for the
        # whole accumulated tensor — exact by linearity of the scaler's
        # per-coefficient rounding ONLY at the tensor level, so the sum
        # is taken BEFORE scaling, matching mulpir.rs:176-183 semantics).
        sel = jnp.stack([e0[dim1 : dim1 + dim2], e1[dim1 : dim1 + dim2]])
        resp = jnp.stack([jnp.stack(r0), jnp.stack(r1)])
        both = jnp.concatenate([sel, resp], axis=0)  # (4, dim2, B, ...)
        pb = ntt_backward_any(ctx, both, in_bits=62)
        new_rows = ext_rns.scale(pb, starting_index=k, size=k_mul - k)
        new_rows = ntt_forward_any(ctx_mul, new_rows,
                                   limb_slice=slice(k, k_mul), in_bits=62)
        ext = jnp.concatenate([both, new_rows], axis=-4)
        s0, s1, p0, p1 = (ext[i] for i in range(4))

        acc = None
        for j in range(dim2):
            t = jnp.stack([
                mul_m(s0[j], p0[j]),
                add_m(mul_m(s0[j], p1[j]), mul_m(s1[j], p0[j])),
                mul_m(s1[j], p1[j]),
            ])
            acc = t if acc is None else jnp.stack([
                add_m(acc[0], t[0]), add_m(acc[1], t[1]),
                add_m(acc[2], t[2]),
            ])

        t_pb = ntt_backward_any(ctx_mul, acc, in_bits=62)
        dsc = down_rns.scale(t_pb, starting_index=0, size=k)
        digits = _ksk_digits(ctx, dsc[2])
        stacked = jnp.concatenate([dsc[:2], digits], axis=0)
        ntts = ntt_forward_any(ctx, stacked, in_bits=62)
        c01, lifted = ntts[:2], ntts[2:]
        ks0, ks1 = _ksk_accumulate(ctx, lifted, ksk_c0, ksk_c1)
        return add_c(c01[0], ks0), add_c(c01[1], ks1)

    return jax.jit(step)


def make_pir_response_db(par: BfvParameters, rk, dim1: int, dim2: int,
                         level: int = 0):
    """Paper-scale MulPIR server response: jitted
    (e0, e1, db) -> (c0, c1).

    Unlike make_pir_response (which unrolls the dim1 x dim2 loops in
    Python and bakes the database into the executable — fine at bench
    scale, ~400 MB of constants and a 10^5-node graph at the 65536-element
    paper config), this takes the EXPANDED query arrays (from make_expand)
    plus the database as a device argument, and runs both dot products as
    lax.scan's with deferred u128 accumulation:

      - first dimension (examples/mulpir.rs:168-174): resp_j =
        sum_i db[i,j] * exp_i accumulates raw 128-bit products and
        Barrett-reduces once per headroom window (rq/ops.rs:448-550
        semantics, so results match dot_product_scalar bit-exactly);
      - second dimension (mulpir.rs:176-183): the degree-2 tensor
        sum_j exp2_j (x) resp_j accumulates in the multiplication basis
        BEFORE the single down-scale + relinearize.

    e0/e1: (E >= dim1+dim2, B, k, 2, S, L) expanded NTT rows;
    db: (dim1, dim2, k, 2, S, L) plaintext NTT residues (pt.poly_ntt).
    """
    ctx_lvl = par.context_level_at(level)
    ctx = ctx_lvl.poly_context
    if ctx.narrow:
        raise NotImplementedError("narrow (w30) PIR response path")
    mp = ctx_lvl.mul_params()
    ctx_mul = mp.extender.to_ctx
    k, k_mul = ctx.k, ctx_mul.k
    ext_rns = mp.extender.rns_scaler
    down_rns = mp.down_scaler.rns_scaler
    _, add_c = _ops_for(ctx)
    ksk_c0, ksk_c1 = _ksk_consts(rk.ksk)
    d, dm = ctx.dev, ctx_mul.dev
    p, bl, bh = _exp2(d.p), _exp2(d.barrett_lo), _exp2(d.barrett_hi)
    pm, blm, bhm = _exp2(dm.p), _exp2(dm.barrett_lo), _exp2(dm.barrett_hi)
    # headroom windows (rq.dot_product): sum of w products < p^2 each
    # stays under 2^128 while w < 2^(2*leading_zeros)
    win1 = max(1, min(1 << (2 * q.leading_zeros) for q in ctx.q) - 2)
    win2 = max(1, (min(1 << (2 * q.leading_zeros) for q in ctx_mul.q) - 2)
               // 2)  # the c1 row adds TWO products per scan step

    def _chunked_scan(body, acc, xs, n, win, reduce_consts):
        cbl, cbh, cp = reduce_consts
        start = 0
        while start < n:
            stop = min(n, start + win)
            acc, _ = jax.lax.scan(
                body, acc, tuple(x[start:stop] for x in xs))
            if stop < n:
                out = [zq.reduce_u128(a, cbl, cbh, cp) for a in acc]
                acc = tuple((lo, hi, jnp.zeros_like(lo), jnp.zeros_like(lo))
                            for lo, hi in out)
            start = stop
        return tuple(zq.reduce_u128(a, cbl, cbh, cp) for a in acc)

    def step(e0, e1, db):
        assert e0.shape[0] >= dim1 + dim2 and db.shape[:2] == (dim1, dim2)
        # --- first dimension: resp_j = sum_i db[i,j] * exp_i ---
        q = jnp.stack([e0[:dim1], e1[:dim1]], axis=1)  # (dim1,2,B,k,2,S,L)
        zero = jnp.zeros((2, dim2) + q.shape[2:-3] + q.shape[-2:],
                         jnp.uint32)
        acc0 = (zero, zero, zero, zero)

        def pt_body(acc, x):
            (a4,) = acc
            qi, dbi = x  # (2, B, k, 2, S, L), (dim2, k, 2, S, L)
            a = _pairs(qi[:, None])          # (2, 1, B, k, S, L)
            b = _pairs(dbi[None, :, None])   # (1, dim2, 1, k, S, L)
            return (u64.mp_mul_pair(a4, a, b),), None

        r = _chunked_scan(pt_body, (acc0,), (q, db), dim1, win1,
                          (bl, bh, p))[0]
        resp = jnp.stack(r, axis=-3)  # (2, dim2, B, k, 2, S, L)

        # --- extend selectors + responses to the multiplication basis ---
        sel = jnp.stack([e0[dim1 : dim1 + dim2],
                         e1[dim1 : dim1 + dim2]], axis=0)
        both = jnp.concatenate([sel, resp], axis=0)  # (4, dim2, B, ...)
        pb = ntt_backward_any(ctx, both, in_bits=62)
        new_rows = ext_rns.scale(pb, starting_index=k, size=k_mul - k)
        new_rows = ntt_forward_any(ctx_mul, new_rows,
                                   limb_slice=slice(k, k_mul), in_bits=62)
        ext = jnp.concatenate([both, new_rows], axis=-4)

        # --- second dimension: accumulated tensor over j ---
        xs = jnp.moveaxis(ext, 1, 0)  # (dim2, 4, B, k_mul, 2, S, L)
        zt = jnp.zeros(xs.shape[2:-3] + xs.shape[-2:], jnp.uint32)
        acct = tuple((zt, zt, zt, zt) for _ in range(3))

        def tensor_body(acc, x):
            (xi,) = x
            s0, s1, r0, r1 = (_pairs(xi[i]) for i in range(4))
            a0, a1, a2v = acc
            a0 = u64.mp_mul_pair(a0, s0, r0)
            a1 = u64.mp_mul_pair(u64.mp_mul_pair(a1, s0, r1), s1, r0)
            a2v = u64.mp_mul_pair(a2v, s1, r1)
            return (a0, a1, a2v), None

        t3 = _chunked_scan(tensor_body, acct, (xs,), dim2, win2,
                           (blm, bhm, pm))
        tt = jnp.stack([jnp.stack(t, axis=-3) for t in t3])

        # --- one down-scale + relinearize (mul+relin tail) ---
        t_pb = ntt_backward_any(ctx_mul, tt, in_bits=62)
        dsc = down_rns.scale(t_pb, starting_index=0, size=k)
        digits = _ksk_digits(ctx, dsc[2])
        stacked = jnp.concatenate([dsc[:2], digits], axis=0)
        ntts = ntt_forward_any(ctx, stacked, in_bits=62)
        c01, lifted = ntts[:2], ntts[2:]
        ks0, ks1 = _ksk_accumulate(ctx, lifted, ksk_c0, ksk_c1)
        return add_c(c01[0], ks0), add_c(c01[1], ks1)

    return jax.jit(step)


def make_ct_pt_dot(par: BfvParameters, n: int, m: int, level: int = 0):
    """Jitted batched ciphertext x plaintext dot products:
    (e0, e1, db) -> (r0, r1) with r_j = sum_{i<n} db[i, j] * e_i.

    The scan-based core of make_pir_response_db's first dimension as a
    standalone program (dot_product_scalar / rq/ops.rs:448-550 semantics:
    deferred u128 accumulation, Barrett-reduced once per headroom window
    — results are bit-identical to the object API). Serves SealPIR's two
    server dot phases (sealpir.rs:150-201) at paper scale, where the
    per-op object path is dispatch-latency-bound on the tunneled runtime.

    e0/e1: (>= n, B, k, 2, S, L) NTT ciphertext parts; db: (n, m, k, 2,
    S, L) plaintext NTT residues; returns two (m, B, k, 2, S, L) arrays.
    """
    ctx = par.context_at_level(level)
    if ctx.narrow:
        raise NotImplementedError("narrow (w30) ct-pt dot path")
    d = ctx.dev
    p, bl, bh = _exp2(d.p), _exp2(d.barrett_lo), _exp2(d.barrett_hi)
    win = max(1, min(1 << (2 * q.leading_zeros) for q in ctx.q) - 2)

    def step(e0, e1, db):
        assert e0.shape[0] >= n and db.shape[:2] == (n, m)
        q = jnp.stack([e0[:n], e1[:n]], axis=1)  # (n, 2, B, k, 2, S, L)
        zero = jnp.zeros((2, m) + q.shape[2:-3] + q.shape[-2:], jnp.uint32)
        acc = (zero, zero, zero, zero)

        # per headroom window (rq/ops.rs:448-550 bound: `win` deferred
        # 128-bit products per Barrett reduce), products for ALL window
        # terms are computed VECTORIZED with the term index as a leading
        # axis and mp-added pairwise — a lax.scan over single terms
        # measured scan-overhead-bound (33/s; each step's arithmetic is
        # ~4 us of VPU work), the window-vectorized form is ~arithmetic-
        # bound. Integer adds are associative: results bit-identical.
        # The vectorized sub-window is capped so the live product tensor
        # stays under ~512 MB (paper-scale PIR has m in the hundreds);
        # sub-windows within one headroom window just mp-add — the
        # reduce cadence (and hence bit-exactness) is unchanged.
        import os as _os

        per_term = 16 * zero.size  # 4 u32 limbs x product tensor
        budget = int(_os.environ.get("TPUFHE_DOT_VBYTES", 512 * 2**20))
        wv = max(1, min(win, budget // max(per_term, 1)))
        start = 0
        while start < n:
            stop = min(n, start + win)
            for s0 in range(start, stop, wv):
                s1 = min(stop, s0 + wv)
                w = s1 - s0
                a = _pairs(q[s0:s1, :, None])        # (w, 2, 1, B, ...)
                b = _pairs(db[s0:s1, None, :, None])  # (w, 1, m, 1, ...)
                zw = jnp.zeros((w,) + zero.shape, jnp.uint32)
                prod = u64.mp_mul_pair((zw, zw, zw, zw), a, b)
                # pairwise tree-sum over the term axis (exact: < 2^128)
                while prod[0].shape[0] > 1:
                    h = prod[0].shape[0] // 2
                    rest = tuple(x[2 * h :] for x in prod)
                    prod = u64.mp_add(tuple(x[:h] for x in prod),
                                      tuple(x[h : 2 * h] for x in prod))
                    if rest[0].shape[0]:
                        prod = tuple(jnp.concatenate([x, y])
                                     for x, y in zip(prod, rest))
                acc = u64.mp_add(acc, tuple(x[0] for x in prod))
            if stop < n:
                lo, hi = zq.reduce_u128(acc, bl, bh, p)
                acc = (lo, hi, jnp.zeros_like(lo), jnp.zeros_like(lo))
            start = stop
        lo, hi = zq.reduce_u128(acc, bl, bh, p)
        r = jnp.stack((lo, hi), axis=-3)  # (2, m, B, k, 2, S, L)
        return r[0], r[1]

    return jax.jit(step)


def make_add(par: BfvParameters, level: int = 0):
    ctx = par.context_at_level(level)

    def step(a0, a1, b0, b1):
        out0 = Poly(ctx, NTT, a0) + Poly(ctx, NTT, b0)
        out1 = Poly(ctx, NTT, a1) + Poly(ctx, NTT, b1)
        return out0.coeffs, out1.coeffs

    return jax.jit(step)
