"""Fused negacyclic NTT as a single Pallas TPU kernel.

The XLA-graph NTT (ops/ntt.py) materializes every butterfly stage through
HBM; this kernel keeps the whole transform resident in VMEM and runs all
log2(N) stages back-to-back on the VPU.

Design:
- data (B, k, 2, N) uint32; ONE pallas_call with grid (k, B/Bt), limb axis
  outer so each limb's twiddle block stays resident across the batch sweep;
- per-limb scalars (p, n^{-1}, shoup(n^{-1})) arrive via scalar prefetch and
  are read by program_id, so a single compiled kernel serves every limb;
- every stage uses per-lane twiddle VECTORS (host-precomputed,
  (k, n_stages, 2, 2, N): [limb][stage][value|shoup][lo|hi][coeff]) so the
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


def build_limb_scalars(ops) -> np.ndarray:
    """(k, 6) uint32: p, n^{-1}, shoup(n^{-1}) as lo/hi pairs per limb."""
    rows = []
    for op in ops:
        p, ni, nis = op.q.p, op.size_inv, op.size_inv_shoup
        rows.append([
            p & 0xFFFFFFFF, p >> 32,
            ni & 0xFFFFFFFF, ni >> 32,
            nis & 0xFFFFFFFF, nis >> 32,
        ])
    return np.array(rows, dtype=np.uint32)


def _roll(x, shift: int, axis: int):
    size = x.shape[axis]
    return pltpu.roll(x, shift % size, axis=axis)


def _stage_mask(l: int, S: int):
    """(S, 128) bool: True where the position is the x-part of its block."""
    row = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    idx = row * 128 + lane
    return (idx & (2 * l - 1)) < l


def _partners(lo, hi, l: int):
    """Both roll directions at distance l on (Bt, S, 128) planes."""
    if l >= 128:
        ax, sh = 1, l // 128
    else:
        ax, sh = 2, l
    fwd = (_roll(lo, -sh, ax), _roll(hi, -sh, ax))
    bwd = (_roll(lo, sh, ax), _roll(hi, sh, ax))
    return fwd, bwd


def _sel(mask, a, b):
    return (jnp.where(mask, a[0], b[0]), jnp.where(mask, a[1], b[1]))


def _ntt_kernel(scal_ref, x_ref, tw_ref, o_ref, *, n: int, lazy: bool,
                inverse: bool):
    S = n // 128
    logn = n.bit_length() - 1
    li = pl.program_id(0)
    p_pair = (scal_ref[li, 0], scal_ref[li, 1])

    x = x_ref[...]  # (Bt, 1, 2, S, 128)
    Bt = x.shape[0]
    lo = x[:, 0, 0]
    hi = x[:, 0, 1]

    p2_pair = u64.add64(p_pair, p_pair)

    ls = ([n >> (s + 1) for s in range(logn)] if not inverse
          else [1 << s for s in range(logn)])
    # NOTE: a "half-compute" variant that sliced x/y sublane halves and ran
    # each butterfly once was tried and measured 1.7x SLOWER end-to-end:
    # Mosaic lowers the strided sublane slices and the interleaving
    # write-back to copies that cost more than the saved multiplies. The
    # full-width roll+select butterfly below is the fast form.
    for s, l in enumerate(ls):
        mask = _stage_mask(l, S)[None, :, :]
        w = (tw_ref[0, s, 0, 0][None], tw_ref[0, s, 0, 1][None])
        ws = (tw_ref[0, s, 1, 0][None], tw_ref[0, s, 1, 1][None])
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
        ni = (scal_ref[li, 2], scal_ref[li, 3])
        nis = (scal_ref[li, 4], scal_ref[li, 5])
        lo, hi = zq.mul_shoup((lo, hi), ni, nis, p_pair)
    elif not lazy:
        lo, hi = zq.reduce1(zq.reduce1((lo, hi), p2_pair), p_pair)

    o_ref[...] = jnp.stack([lo, hi], axis=1)[:, None]


def _pick_bt(batch: int, n: int) -> int:
    """Batch tile: keep live kernel temporaries within the VMEM budget.

    The scoped-VMEM stack holds the in/out blocks (double-buffered by the
    grid pipeline), the twiddle block, and ~16 live uint32 planes of kernel
    temporaries per batch row; 16 MiB is the hard per-core limit on v5e/v5p,
    so budget conservatively.
    """
    budget = 4 * 1024 * 1024
    logn = n.bit_length() - 1
    tables = logn * 4 * n * 4 * 2  # double-buffered twiddle block
    per_row = 2 * n * 4 * 8  # ~16 live uint32 planes of length n
    bt = max(1, (budget - tables) // per_row)
    bt = min(bt, batch, 256)
    while batch % bt:
        bt -= 1
    return bt


@lru_cache(maxsize=None)
def _ntt_call(n: int, k: int, batch: int, lazy: bool, inverse: bool,
              interpret: bool):
    logn = n.bit_length() - 1
    S = n // 128
    bt = _pick_bt(batch, n)
    grid = (k, batch // bt)

    kernel = partial(_ntt_kernel, n=n, lazy=lazy, inverse=inverse)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, 1, 2, S, 128),
                         lambda li, bi, *_: (bi, li, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, logn, 2, 2, S, 128),
                         lambda li, bi, *_: (li, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, 1, 2, S, 128),
                               lambda li, bi, *_: (bi, li, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, k, 2, S, 128), jnp.uint32),
        grid_spec=grid_spec,
        interpret=interpret,
    )
    return call


def ntt_pallas(x, tables, scalars, lazy=False, inverse=False,
               interpret=False):
    """Run the fused NTT kernel.

    x: (B, k, 2, S, 128) uint32 lane-folded; tables: (k, n_stages, 2, 2, S,
    128) stage twiddle vectors; scalars: (k, 6) uint32 per-limb constants
    (build_limb_scalars).
    """
    batch, k, _, S, L = x.shape
    call = _ntt_call(S * L, k, batch, lazy, inverse, interpret)
    return call(scalars, x, tables)
