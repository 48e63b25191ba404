"""Fused negacyclic NTT Pallas kernel for narrow (< 2^30) moduli.

Single-lane variant of ntt_kernel.py: one residue per uint32 lane, Shoup
constants scaled by 2^32 (ops/zq32.py), so the Harvey butterfly costs ~6
lane multiplies instead of ~28. Data is (B, k, S, 128) uint32 lane-folded
(no lo/hi plane axis); tables are (k, n_stages, 2, S, 128) with
[value | shoup32] planes; per-limb scalars (k, 3) = p, n^{-1},
shoup32(n^{-1}).

Bit-exact against ops/ntt.py forward32/backward32 (same twiddles, same
bit-reversed output order).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufhe.ops import zq32


def build_stage_tables32(op, inverse: bool) -> np.ndarray:
    """(n_stages, 2, N) uint32 per-lane [w | shoup32(w)] stage vectors."""
    n = op.size
    logn = n.bit_length() - 1
    q = op.q
    table = np.empty((logn, 2, n), dtype=np.uint32)
    if not inverse:
        vals = op.omegas
        ls = [n >> (s + 1) for s in range(logn)]
        offsets = [n // (2 * l) for l in ls]
    else:
        vals = op.zetas_inv
        ls = [1 << s for s in range(logn)]
        offsets = []
        acc = 0
        for l in ls:
            offsets.append(acc)
            acc += n // (2 * l)
    shoups = np.array([q.shoup32(int(v)) for v in vals], dtype=np.uint64)
    for s, (l, off) in enumerate(zip(ls, offsets)):
        blocks = np.arange(n) // (2 * l)
        table[s, 0] = vals[off + blocks].astype(np.uint32)
        table[s, 1] = shoups[off + blocks].astype(np.uint32)
    return table


def build_limb_scalars32(ops) -> np.ndarray:
    """(k, 3) uint32: p, n^{-1}, shoup32(n^{-1}) per limb."""
    rows = []
    for op in ops:
        rows.append([
            op.q.p, op.size_inv, op.q.shoup32(int(op.size_inv)),
        ])
    return np.array(rows, dtype=np.uint32)


def _stage_mask(l: int, S: int):
    row = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    idx = row * 128 + lane
    return (idx & (2 * l - 1)) < l


def _roll(x, shift: int, l: int):
    if l >= 128:
        return pltpu.roll(x, shift * (l // 128) % x.shape[1], axis=1)
    return pltpu.roll(x, shift * l % 128, axis=2)


def _ntt32_kernel(scal_ref, x_ref, tw_ref, o_ref, *, n: int, lazy: bool,
                  inverse: bool):
    S = n // 128
    logn = n.bit_length() - 1
    li = pl.program_id(0)
    p = scal_ref[li, 0]
    p2 = p + p

    x = x_ref[...][:, 0]  # (Bt, S, 128)

    ls = ([n >> (s + 1) for s in range(logn)] if not inverse
          else [1 << s for s in range(logn)])
    for s, l in enumerate(ls):
        mask = _stage_mask(l, S)[None, :, :]
        w = tw_ref[0, s, 0][None]
        ws = tw_ref[0, s, 1][None]
        fwd = _roll(x, -1, l)
        bwd = _roll(x, 1, l)
        xr = jnp.where(mask, x, bwd)   # the block's x input at every position
        yr = jnp.where(mask, fwd, x)   # the block's y input at every position
        if not inverse:
            xred = zq32.reduce1_32(xr, p2)
            t = zq32.lazy_mul_shoup32(yr, w, ws, p)
            out_x = xred + t
            out_y = xred + p2 - t
        else:
            out_x = zq32.reduce1_32(xr + yr, p2)
            out_y = zq32.lazy_mul_shoup32(xr + p2 - yr, w, ws, p)
        x = jnp.where(mask, out_x, out_y)

    if inverse:
        x = zq32.mul_shoup32(x, scal_ref[li, 1], scal_ref[li, 2], p)
    elif not lazy:
        x = zq32.reduce1_32(zq32.reduce1_32(x, p2), p)

    o_ref[...] = x[:, None]


def _pick_bt(batch: int, n: int) -> int:
    budget = 4 * 1024 * 1024
    logn = n.bit_length() - 1
    tables = logn * 2 * n * 4 * 2
    per_row = n * 4 * 8
    bt = max(1, (budget - tables) // per_row)
    bt = min(bt, batch, 256)
    while batch % bt:
        bt -= 1
    return bt


@lru_cache(maxsize=None)
def _ntt32_call(n: int, k: int, batch: int, lazy: bool, inverse: bool,
                interpret: bool):
    logn = n.bit_length() - 1
    S = n // 128
    bt = _pick_bt(batch, n)
    grid = (k, batch // bt)

    kernel = partial(_ntt32_kernel, n=n, lazy=lazy, inverse=inverse)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, 1, S, 128),
                         lambda li, bi, *_: (bi, li, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, logn, 2, S, 128),
                         lambda li, bi, *_: (li, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, 1, S, 128),
                               lambda li, bi, *_: (bi, li, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, k, S, 128), jnp.uint32),
        grid_spec=grid_spec,
        interpret=interpret,
    )


def ntt32_pallas(x, tables, scalars, lazy=False, inverse=False,
                 interpret=False):
    """x: (B, k, S, 128) uint32; tables: (k, n_stages, 2, S, 128);
    scalars: (k, 3) (build_limb_scalars32)."""
    batch, k, S, L = x.shape
    call = _ntt32_call(S * L, k, batch, lazy, inverse, interpret)
    return call(scalars, x, tables)
