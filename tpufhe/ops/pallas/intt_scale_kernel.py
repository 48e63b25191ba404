"""Fused inverse-NTT + HPS base-conversion/scale as ONE Pallas kernel.

The multiply pipeline's extend stage runs iNTT (per-limb grid) and the
RNS scaler (batch x sublane grid) as separate launches, so the power-
basis residues round-trip HBM and the scaler re-extracts digit planes
the iNTT's final fold just produced. This kernel keeps one batch-tile
entirely in VMEM:

    per limb i: extract -> M2b dot (MXU) -> fold -> Shoup twiddle
                -> extract -> M1b dot (MXU) -> fold/canonical
    then per sublane tile: bitcast byte planes of ALL limbs -> ONE int8
                scaler dot -> v/w/omega accumulation -> write

Constants for ALL k_in limbs must be VMEM-resident simultaneously
(~1.5 MiB/limb at n1=64), so the fusion is gated by `intt_scale_fits`
(k_in and n1 bounded) and falls back to the split launches elsewhere.

Bit-exactness: the iNTT stages are the _mxu4_kernel inverse path
(b8 + bitcast extraction) and the scaler is the shared _scale_core_bc —
identical arithmetic to the split kernels, so outputs are bit-identical
(tests/test_intt_scale.py).

Reference behavior: rq/scaler.rs:52-126 (backward NTT + RnsScaler per
coefficient) realized as one fused device kernel.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufhe.ops import zq
from tpufhe.ops.pallas.mxu_ntt_kernel import (
    _extract_lane,
    _extract_sub,
    _fold_slices,
    _opt_lz,
)
from tpufhe.ops.pallas.rns_kernel import (
    _BC_DATA_PLANES,
    _BC_THETA_DIGITS,
    _THETA_DIGITS16,
    _bc_bytes_cast,
    _bc_cast,
    _bc_thetas_fit,
    _scale_core_bc,
    build_scaler_consts_bc,
)

_B8 = 8  # balanced byte planes: data and matrix sides


def _intt_scale_kernel(scal_ntt_ref, scal_sc_ref, x_ref, msub_ref, tw_ref,
                       mlane_ref, w_ref, o_ref, *, n1: int, bt: int,
                       k_in: int, size: int, st: int, rows_t: int,
                       factor_one: bool, tg_shift: int,
                       tgamma_digits: tuple, tgamma_sign: bool,
                       opt_lz: int = 0, bc_interp: bool = False):
    lims = []
    for i in range(k_in):
        p = (scal_ntt_ref[i, 0], scal_ntt_ref[i, 1])
        bl = (scal_ntt_ref[i, 2], scal_ntt_ref[i, 3])
        bh = (scal_ntt_ref[i, 4], scal_ntt_ref[i, 5])
        consts = (bl, bh, p)
        # stage 1 (M2b, lane contraction): rows sublane-concatenated
        x2 = jnp.concatenate(
            [_extract_lane(x_ref[r, i, 0], x_ref[r, i, 1], _B8, b8=True)
             for r in range(bt)],
            axis=0,
        )  # (bt*n1, 8*128)
        c2 = jax.lax.dot_general(
            x2, mlane_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (bt*n1, 8*128)
        s = _fold_slices(lambda b: c2[:, b * 128 : (b + 1) * 128],
                         consts, lazy=True, b8=True, opt_lz=opt_lz)
        twv_t = (jnp.concatenate([tw_ref[i, 0, 0]] * bt, axis=0),
                 jnp.concatenate([tw_ref[i, 0, 1]] * bt, axis=0))
        tws_t = (jnp.concatenate([tw_ref[i, 1, 0]] * bt, axis=0),
                 jnp.concatenate([tw_ref[i, 1, 1]] * bt, axis=0))
        s = zq.lazy_mul_shoup(s, twv_t, tws_t, p)
        s = zq.reduce1(s, p)
        # stage 2 (M1b, sublane contraction): rows lane-concatenated
        x1 = jnp.concatenate(
            [_extract_sub(s[0][r * n1 : (r + 1) * n1],
                          s[1][r * n1 : (r + 1) * n1], _B8, b8=True,
                          bc=True, bc_interp=bc_interp)
             for r in range(bt)],
            axis=1,
        )  # (8*n1, bt*128)
        c1 = jax.lax.dot_general(
            msub_ref[i], x1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (8*n1, bt*128)
        out = _fold_slices(lambda b: c1[b * n1 : (b + 1) * n1],
                           consts, lazy=False, b8=True, opt_lz=opt_lz)
        lims.append(out)  # (lo, hi) each (n1, bt*128), canonical

    # HPS scale per sublane tile, digit planes straight from VMEM values
    cast = _bc_cast(bc_interp)
    for s_t in range(n1 // st):
        sl = slice(s_t * st, (s_t + 1) * st)
        cols_x = []
        for r in range(bt):
            rl = slice(r * 128, (r + 1) * 128)
            blocks = []
            for i in range(k_in):
                blo, bhi = _bc_bytes_cast(
                    lims[i][0][sl, rl], lims[i][1][sl, rl], cast)
                blocks.append(blo)
                blocks.append(bhi)
            cols_x.append(jnp.concatenate(blocks, axis=0))
        x1 = jnp.concatenate(cols_x, axis=1)  # (k_in*8*st, bt*128)
        c = jax.lax.dot_general(
            w_ref[...], x1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (R_tot*st, bt*128)

        def crow(r, c=c):
            return c[r * st : (r + 1) * st]

        outs = _scale_core_bc(
            crow, scal_sc_ref, (st, bt * 128), size=size, rows_t=rows_t,
            factor_one=factor_one, tg_shift=tg_shift,
            tgamma_digits=tgamma_digits, tgamma_sign=tgamma_sign,
            opt_lz=opt_lz)
        for j, out in enumerate(outs):
            for r in range(bt):
                o_ref[r, j, 0, sl] = out[0][:, r * 128 : (r + 1) * 128]
                o_ref[r, j, 1, sl] = out[1][:, r * 128 : (r + 1) * 128]


def _const_bytes(n1: int, k_in: int) -> int:
    """VMEM footprint of the resident per-limb iNTT constant blocks."""
    msub = _B8 * n1 * _B8 * n1          # i8
    mlane = _B8 * 128 * _B8 * 128       # i8
    tw = 2 * 2 * n1 * 128 * 4           # u32
    return k_in * (msub + mlane + tw)


def intt_scale_fits(n1: int, k_in: int) -> bool:
    """Whether all k_in limbs' iNTT constants + a 2-row batch tile fit
    the VMEM scope (the gate mirrors _pick_bt's 13 MiB budget)."""
    budget = int(os.environ.get("TPUFHE_EXTF_VMEM", str(13 * 2**20)))
    per_row = _per_row_bytes(n1, k_in)
    return _const_bytes(n1, k_in) + 2 * per_row < budget


def _per_row_bytes(n1: int, k_in: int) -> int:
    # lims (k_in u64 pairs) + one limb's live iNTT scratch (x2 + c2 int32
    # planes) + the scaler tile dot result
    lims = k_in * 2 * n1 * 128 * 4
    intt = 2 * _B8 * n1 * 128 * 4
    scale = (_BC_DATA_PLANES + _BC_THETA_DIGITS - 1) * 2 * 8 * 128 * 4
    return lims + intt + scale


@lru_cache(maxsize=None)
def _intt_scale_call(n1: int, k_in: int, rows: int, size: int, st: int,
                     rows_t: int, r_tot: int, factor_one: bool,
                     tg_shift: int, tgamma_digits: tuple,
                     tgamma_sign: bool, opt_lz: int, interpret: bool):
    budget = int(os.environ.get("TPUFHE_EXTF_VMEM", str(13 * 2**20)))
    bt = int(os.environ.get("TPUFHE_EXTF_BT", "0"))
    if bt <= 0:
        bt = max(1, (budget - _const_bytes(n1, k_in))
                 // _per_row_bytes(n1, k_in))
        bt = min(bt, rows, 8)
    while rows % bt:
        bt -= 1

    kernel = partial(
        _intt_scale_kernel, n1=n1, bt=bt, k_in=k_in, size=size, st=st,
        rows_t=rows_t, factor_one=factor_one, tg_shift=tg_shift,
        tgamma_digits=tgamma_digits, tgamma_sign=tgamma_sign,
        opt_lz=opt_lz, bc_interp=interpret)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(rows // bt,),
        in_specs=[
            pl.BlockSpec((bt, k_in, 2, n1, 128),
                         lambda bi, *_: (bi, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_in, _B8 * n1, _B8 * n1),
                         lambda bi, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_in, 2, 2, n1, 128),
                         lambda bi, *_: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_in, _B8 * 128, _B8 * 128),
                         lambda bi, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_tot * st, k_in * 8 * st),
                         lambda bi, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, size, 2, n1, 128),
                               lambda bi, *_: (bi, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, size, 2, n1, 128),
                                       jnp.uint32),
        grid_spec=grid_spec,
        interpret=interpret,
    )


def intt_scale_ok(ctx, scaler, starting_index: int, size: int) -> bool:
    """All gates for routing an iNTT+scale pair through the fused kernel:
    wide lane-folded context, b8/bc NTT mode active, the balanced-byte
    scaler's feasibility conditions (mirrors rns_scale_pallas's `bcs`),
    and the all-limb constants fitting VMEM."""
    from tpufhe.ops.rq import _mxu_b8_on
    from tpufhe.ops.pallas.mxu_ntt_kernel import _bc_on

    if ctx.narrow or ctx.degree < 1024 or ctx.degree % 128:
        return False
    if not (_mxu_b8_on() and _bc_on(True)):
        return False
    if os.environ.get("TPUFHE_BC_SCALER", "1") == "0":
        return False
    k_in = ctx.k
    if not all((q.p << 17) > (k_in << 74)
               for q in scaler.to_ctx.moduli[
                   starting_index : starting_index + size]):
        return False
    if not all(q.p < (1 << 62) for q in scaler.from_ctx.moduli):
        return False
    if not _bc_thetas_fit(scaler):
        return False
    return intt_scale_fits(ctx.degree // 128, k_in)


def intt_scale_pallas(x, ctx, scaler, starting_index: int, size: int,
                      interpret: bool = False):
    """Fused iNTT + HPS scale.

    x: (..., k_in, 2, n1, 128) uint32 NTT-representation residues,
    canonical (< 2^62). Returns (..., size, 2, n1, 128) power-basis
    scaled residues — bit-identical to
    rns_scale(ntt_backward(x), starting_index, size).
    """
    lead = x.shape[:-4]
    k_in, _, n1, _ = x.shape[-4:]
    rows = 1
    for d in lead:
        rows *= d
    xb = x.reshape((rows, k_in, 2, n1, 128))

    m_sub, tw, m_lane, scal_ntt = ctx.dev.mxu4_consts(
        slice(None), True, _B8, True)

    st = int(os.environ.get("TPUFHE_RNS_ST", 8))
    cache = getattr(scaler, "_extf_consts", None)
    if cache is None:
        cache = scaler._extf_consts = {}
    key = (starting_index, size, st)
    if key not in cache:
        cache[key] = build_scaler_consts_bc(scaler, starting_index, size, st)
    w_delta, scal_sc = cache[key]
    r_tot = w_delta.shape[0] // st
    rows_t = _BC_DATA_PLANES + _BC_THETA_DIGITS - 1
    tg_digits = tuple(
        (int(scaler.theta_gamma) >> (16 * i)) & 0xFFFF
        for i in range(_THETA_DIGITS16)
    )

    call = _intt_scale_call(
        n1, k_in, rows, size, st, rows_t, r_tot,
        bool(scaler.factor.is_one), int(scaler.theta_garner_shift),
        tg_digits, bool(scaler.theta_gamma_sign), _opt_lz(scal_ntt),
        interpret)
    out = call(scal_ntt, scal_sc, xb, np.asarray(m_sub),
               np.asarray(tw), np.asarray(m_lane), w_delta)
    return out.reshape(lead + (size, 2, n1, 128))
