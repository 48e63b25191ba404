"""Fused BFV tensor product (c0,c1,c2) as one Pallas TPU kernel.

The XLA-graph tensor stage (pipeline.py step(): 6 Barrett muls + 2 adds
over the extended basis) is correct but leaves HBM traffic on the table:
XLA materializes each of c0/c1/c2 as its own fusion, re-reading the four
operand polys from HBM (8 reads + 3 writes of the (B, k_mul, 2, S, 128)
arrays), and the async slice/copy staging it emits around those fusions
showed up at ~25% of the headline trace (benches/logs/trace_r2b.log).
This kernel reads each operand exactly once per (limb, batch-tile) cell:

    a0, a1, b0, b1 blocks -> VMEM ->
        c0 = a0*b0; c1 = a0*b1 + a1*b0; c2 = a1*b1 -> 3 writes

All arithmetic is the same u64-pair Barrett machinery as the graph path
(ops/zq.py mul_mod/add_mod), so results are bit-identical.

Reference behavior: the O(k^2) tensor loop of fhe.rs
crates/fhe/src/bfv/ops/mod.rs:318-325 (k=2 ciphertexts: 3 output parts).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufhe.ops import zq


def tensor_karatsuba(a0, a1, b0, b1, bl, bh, p):
    """(c0, c1, c2) with THREE wide muls + THREE Barrett reduces.

    Karatsuba identity on the middle part: since the 128-bit products
    are exact integers, (a0+a1)(b0+b1) - a0*b0 - a1*b1 = a0*b1 + a1*b0
    with no wraparound (a0+a1 < 2p < 2^63 so the cross product fits
    u128, and the subtrahends are genuine sub-terms). Replaces the
    4-mul/4-reduce schoolbook form; canonical outputs are bit-identical.
    """
    from tpufhe.ops import u64

    t0 = u64.mul64_wide(a0, b0)
    t2 = u64.mul64_wide(a1, b1)
    sa = u64.add64(a0, a1)  # < 2^63: no overflow for p < 2^62
    sb = u64.add64(b0, b1)
    tm = u64.mul64_wide(sa, sb)
    m1 = u64.mp_sub(u64.mp_sub(tm, t0), t2)  # exact, >= 0
    c0 = zq.reduce_u128(t0, bl, bh, p)
    c1 = zq.reduce_u128(m1, bl, bh, p)
    c2 = zq.reduce_u128(t2, bl, bh, p)
    return c0, c1, c2


def _tensor_kernel(scal_ref, a0_ref, a1_ref, b0_ref, b1_ref, t_ref, *,
                   kara: bool):
    """One (limb, batch-tile) cell: input blocks are (bt, 1, 2, S, 128)
    uint32; the output block is (3, bt, 1, 2, S, 128) — the stacked
    (c0, c1, c2) the down-scale iNTT consumes, written in place (no
    jnp.stack copy downstream)."""
    li = pl.program_id(0)
    p = (scal_ref[li, 0], scal_ref[li, 1])
    bl = (scal_ref[li, 2], scal_ref[li, 3])
    bh = (scal_ref[li, 4], scal_ref[li, 5])

    def pairs(ref):
        x = ref[...]
        return x[:, 0, 0], x[:, 0, 1]

    a0, a1, b0, b1 = pairs(a0_ref), pairs(a1_ref), pairs(b0_ref), pairs(b1_ref)

    if kara:
        c0, c1, c2 = tensor_karatsuba(a0, a1, b0, b1, bl, bh, p)
    else:
        def mul(x, y):
            return zq.mul_mod(x, y, bl, bh, p)

        c0 = mul(a0, b0)
        c1 = zq.add_mod(mul(a0, b1), mul(a1, b0), p)
        c2 = mul(a1, b1)

    def planes(v):
        return jnp.stack([v[0], v[1]], axis=1)[:, None]

    t_ref[...] = jnp.stack([planes(c0), planes(c1), planes(c2)])


@lru_cache(maxsize=None)
def _tensor_call(k: int, batch: int, n_sub: int, bt: int, interpret: bool,
                 kara: bool):
    grid = (k, batch // bt)
    blk = (bt, 1, 2, n_sub, 128)
    idx = lambda li, bi, *_: (bi, li, 0, 0, 0)
    spec = pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[spec] * 4,
        out_specs=pl.BlockSpec(
            (3,) + blk, lambda li, bi, *_: (0, bi, li, 0, 0, 0),
            memory_space=pltpu.VMEM),
    )
    out_shape = jax.ShapeDtypeStruct((3, batch, k, 2, n_sub, 128),
                                     jnp.uint32)
    return pl.pallas_call(
        partial(_tensor_kernel, kara=kara),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )


@lru_cache(maxsize=None)
def _scal_table(ctx):
    """(k, 6) uint32: p, barrett_lo, barrett_hi as (lo, hi) pairs."""
    d = ctx.dev
    cols = [d.p[0], d.p[1], d.barrett_lo[0], d.barrett_lo[1],
            d.barrett_hi[0], d.barrett_hi[1]]
    return np.stack([np.asarray(c) for c in cols], axis=1).astype(np.uint32)


def tensor_product_pallas(ctx, a0, a1, b0, b1, interpret: bool = False):
    """Stacked (c0, c1, c2) tensor product over lane-folded residues.

    Inputs: (..., k, 2, S, 128) uint32, values < p (canonical); returns
    (3, ..., k, 2, S, 128) — parts pre-stacked for the down-scale iNTT.
    """
    import os

    lead = a0.shape[:-4]
    k, _, n_sub, lanes = a0.shape[-4:]
    assert lanes == 128
    n_rows = 1
    for d in lead:
        n_rows *= d

    def flat(x):
        return x.reshape((n_rows, k, 2, n_sub, 128))

    bt = int(os.environ.get("TPUFHE_TENSOR_BT", 8))
    while n_rows % bt:
        bt -= 1
    kara = os.environ.get("TPUFHE_TENSOR_KARA", "") == "1"
    call = _tensor_call(k, n_rows, n_sub, bt, interpret, kara)
    scal = jnp.asarray(_scal_table(ctx))
    t = call(scal, flat(a0), flat(a1), flat(b0), flat(b1))
    return t.reshape((3,) + lead + t.shape[2:])
