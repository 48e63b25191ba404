"""Fused negacyclic NTT as a single Pallas TPU kernel.

The XLA-graph NTT (ops/ntt.py) materializes every butterfly stage through
HBM; this kernel keeps the whole transform resident in VMEM and runs all
log2(N) stages back-to-back on the VPU.

Design:
- data (B, k, 2, N) uint32; grid (k, B/Bt) with the limb axis OUTER so each
  limb's twiddle block stays resident across the batch sweep;
- every stage uses per-lane twiddle VECTORS (host-precomputed,
  (n_stages, 2, 2, N) per limb: [stage][value|shoup][lo|hi][coeff]) so the
  butterfly is uniform: partners are fetched with circular rolls (sublane
  rolls for pair distance >= 128, lane rolls below — pairs never straddle a
  128-lane row for distances < 128), and a static block-parity mask selects
  the x/y role of every position;
- identical integer semantics to the reference's Harvey butterflies
  (ntt/native.rs:77-132): outputs are bit-exact.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufhe.ops import u64, zq
from tpufhe.ops.u64 import U32


def build_stage_tables(op, inverse: bool) -> np.ndarray:
    """Per-lane twiddle vectors for every stage.

    Returns (n_stages, 2, 2, N) uint32: [stage][w|w_shoup][lo|hi][i] where
    w[i] is the twiddle of the butterfly block containing coefficient i.
    Forward stages run l = N/2 .. 1; inverse stages run l = 1 .. N/2.
    """
    n = op.size
    logn = n.bit_length() - 1
    table = np.empty((logn, 2, n), dtype=np.uint64)
    if not inverse:
        vals, shoups = op.omegas, op.omegas_shoup
        ls = [n >> (s + 1) for s in range(logn)]
        offsets = [n // (2 * l) for l in ls]  # k starts at m
    else:
        vals, shoups = op.zetas_inv, op.zetas_inv_shoup
        ls = [1 << s for s in range(logn)]
        # backward: k accumulates stage block counts (native.rs:106-132)
        offsets = []
        acc = 0
        for l in ls:
            offsets.append(acc)
            acc += n // (2 * l)
    for s, (l, off) in enumerate(zip(ls, offsets)):
        blocks = np.arange(n) // (2 * l)
        table[s, 0] = vals[off + blocks]
        table[s, 1] = shoups[off + blocks]
    lo = (table & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (table >> np.uint64(32)).astype(np.uint32)
    return np.stack([lo, hi], axis=2)  # (n_stages, 2, 2, N)


def _roll(x, shift: int, axis: int):
    """Circular roll by a static amount (partner fetch)."""
    size = x.shape[axis]
    return pltpu.roll(x, shift % size, axis=axis)


def _stage_mask(n: int, l: int, S: int):
    """(S, 128) bool: True where the position is the x-part of its block."""
    row = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    idx = row * 128 + lane
    return (idx & (2 * l - 1)) < l


def _partners(lo, hi, l: int):
    """Fetch both roll directions of the (lo, hi) planes at distance l.

    Planes are (Bt, S, 128); distance >= 128 rolls sublanes, else lanes.
    """
    if l >= 128:
        ax, sh = 1, l // 128
    else:
        ax, sh = 2, l
    fwd = (_roll(lo, -sh, ax), _roll(hi, -sh, ax))
    bwd = (_roll(lo, sh, ax), _roll(hi, sh, ax))
    return fwd, bwd


def _sel(mask, a, b):
    return (jnp.where(mask, a[0], b[0]), jnp.where(mask, a[1], b[1]))


def _ntt_kernel(x_ref, tw_ref, o_ref, *, n: int, lazy: bool, inverse: bool,
                p: int, ninv: int, ninv_shoup: int):
    S = n // 128
    logn = n.bit_length() - 1
    x = x_ref[...]  # (Bt, 1, 2, N)
    Bt = x.shape[0]
    lo = x[:, 0, 0, :].reshape(Bt, S, 128)
    hi = x[:, 0, 1, :].reshape(Bt, S, 128)

    p_pair = (jnp.uint32(p & 0xFFFFFFFF), jnp.uint32(p >> 32))
    p2 = 2 * p
    p2_pair = (jnp.uint32(p2 & 0xFFFFFFFF), jnp.uint32(p2 >> 32))

    ls = ([n >> (s + 1) for s in range(logn)] if not inverse
          else [1 << s for s in range(logn)])
    for s, l in enumerate(ls):
        mask = _stage_mask(n, l, S)[None, :, :]
        w = (
            tw_ref[0, s, 0, 0, :].reshape(1, S, 128),
            tw_ref[0, s, 0, 1, :].reshape(1, S, 128),
        )
        ws = (
            tw_ref[0, s, 1, 0, :].reshape(1, S, 128),
            tw_ref[0, s, 1, 1, :].reshape(1, S, 128),
        )
        fwd, bwd = _partners(lo, hi, l)
        xr = _sel(mask, (lo, hi), bwd)   # block's x input at every position
        yr = _sel(mask, fwd, (lo, hi))   # block's y input at every position
        if not inverse:
            # Harvey CT butterfly: x=reduce1(x,2p); t=y*w (lazy Shoup);
            # x'=x+t; y'=x+2p-t   (native.rs:256-269)
            xred = zq.reduce1(xr, p2_pair)
            t = zq.lazy_mul_shoup(yr, w, ws, p_pair)
            out_x = u64.add64(xred, t)
            out_y = u64.sub64(u64.add64(xred, p2_pair), t)
        else:
            # GS inverse butterfly: x'=reduce1(x+y,2p);
            # y'=(x+2p-y)*z (lazy Shoup)   (native.rs:288-300)
            out_x = zq.reduce1(u64.add64(xr, yr), p2_pair)
            diff = u64.sub64(u64.add64(xr, p2_pair), yr)
            out_y = zq.lazy_mul_shoup(diff, w, ws, p_pair)
        lo, hi = _sel(mask, out_x, out_y)

    if inverse:
        ni = (jnp.uint32(ninv & 0xFFFFFFFF), jnp.uint32(ninv >> 32))
        nis = (jnp.uint32(ninv_shoup & 0xFFFFFFFF),
               jnp.uint32(ninv_shoup >> 32))
        lo, hi = zq.mul_shoup((lo, hi), ni, nis, p_pair)
    elif not lazy:
        lo, hi = zq.reduce1(zq.reduce1((lo, hi), p2_pair), p_pair)

    out = jnp.stack([lo.reshape(Bt, n), hi.reshape(Bt, n)], axis=1)
    o_ref[...] = out[:, None, :, :]


def _pick_bt(batch: int, n: int) -> int:
    """Batch tile: keep x-tile + twiddle tables within ~8 MB of VMEM."""
    budget = 6 * 1024 * 1024
    per_row = 2 * n * 4 * 3  # in + out + headroom
    bt = max(1, budget // per_row)
    bt = min(bt, batch, 256)
    while batch % bt:
        bt -= 1
    return bt


@lru_cache(maxsize=None)
def _ntt_call(n: int, k: int, batch: int, lazy: bool, inverse: bool,
              moduli: tuple, ninvs: tuple, ninv_shoups: tuple,
              interpret: bool):
    logn = n.bit_length() - 1
    bt = _pick_bt(batch, n)
    grid = (k, batch // bt)

    def make_kernel(limb):
        return partial(
            _ntt_kernel, n=n, lazy=lazy, inverse=inverse, p=moduli[limb],
            ninv=ninvs[limb], ninv_shoup=ninv_shoups[limb],
        )

    # p differs per limb: dispatch one pallas_call per limb slice, stacked.
    # The limb loop is static (k is small); each call grids over the batch.
    def run(x, tables):
        outs = []
        for limb in range(k):
            xi = x[:, limb : limb + 1]
            ti = tables[limb : limb + 1]
            out = pl.pallas_call(
                make_kernel(limb),
                out_shape=jax.ShapeDtypeStruct((batch, 1, 2, n), jnp.uint32),
                grid=(batch // bt,),
                in_specs=[
                    pl.BlockSpec((bt, 1, 2, n), lambda b: (b, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, logn, 2, 2, n), lambda b: (0, 0, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((bt, 1, 2, n), lambda b: (b, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                interpret=interpret,
            )(xi, ti)
            outs.append(out)
        return jnp.concatenate(outs, axis=1) if k > 1 else outs[0]

    return run


def ntt_pallas(x, tables, moduli, ninvs, ninv_shoups, lazy=False,
               inverse=False, interpret=False):
    """Run the fused NTT kernel.

    x: (B, k, 2, N) uint32; tables: (k, n_stages, 2, 2, N) uint32 stage
    twiddle vectors (build_stage_tables per limb, stacked).
    """
    batch, k, _, n = x.shape
    run = _ntt_call(
        n, k, batch, lazy, inverse, tuple(moduli), tuple(ninvs),
        tuple(ninv_shoups), interpret,
    )
    return run(x, tables)
