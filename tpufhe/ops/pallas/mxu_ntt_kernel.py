"""Fused four-step MXU NTT as a single Pallas TPU kernel.

The XLA-graph four-step path (ops/ntt_mxu.py) materializes the int32
digit-plane products, the folded u64 values, and the twiddled operands
through HBM between its two einsums; the trace shows the resulting layout
copies and DMA stalls costing as much as the matmuls. This kernel keeps
one (limb, batch-tile) cell entirely in VMEM:

    extract planes -> M1 dot (MXU) -> fold/Barrett -> Shoup twiddle
    -> extract -> M2 dot (MXU) -> fold/Barrett -> write

Constants are pre-flattened per limb so each stage is ONE int8 dot:
  M1flat (B*n1, A*n1): out row (b*n1+i1), contraction col (a*n1+j1);
  M2flat (A*128, B*128): contraction row (a*128+j2), out col (b*128+i2);
with A the data-plane count (9 for inputs < 2^63, 10 for any u64) and
B = 9 matrix planes. The data planes are built by sublane-concatenation
(M1 stage) or lane-concatenation (M2 stage) of (n1, 128) blocks, so no
in-kernel transposes are needed. The grid runs limbs on the OUTER axis so
each limb's constant blocks stay resident across the batch sweep.

Bit-exactness: same digit planes, same fold, same Barrett/Shoup
arithmetic as ops/ntt_mxu.py — outputs are bit-identical (tested in
tests/test_mxu_pallas.py), hence interchangeable with the butterfly path
per the CLAUDE.md convention.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufhe.ops import u64, zq
from tpufhe.ops.ntt_mxu import DIGIT_BITS, DIGIT_MASK, MAT_PLANES, MxuNttPlan
from tpufhe.ops.u64 import U32

B_PLANES = MAT_PLANES  # 9


def build_mxu4_consts(plan: MxuNttPlan, inverse: bool, in_planes: int):
    """Per-limb flattened constants for the kernel.

    Returns (m_sub, tw, m_lane, scal):
      m_sub  (k, B*n1, Ax*n1) i8 — the sublane-contracting matrix
              (M1f for forward, M1b for inverse; Ax = in_planes fwd, 9 inv)
      tw     (k, 2, 2, n1, 128) u32 — [val|shoup][lo|hi] twiddles
      m_lane (k, Ay*128, B*128) i8 — the lane-contracting matrix
              (M2f fwd with Ay=9, M2b inv with Ay = in_planes)
      scal   (k, 6) u32 — p, barrett_lo, barrett_hi as lo/hi pairs
    """
    from tpufhe.ops.ntt_mxu import _flat_consts

    m1f, m1b, m2f, m2b = _flat_consts(plan)
    n1, n2 = plan.n1, plan.n2
    if not inverse:
        m_sub = m1f[:, :, : in_planes * n1]
        m_lane = m2f[:, : 9 * n2]
        tw_v, tw_s = plan.tf, plan.tf_shoup
    else:
        m_sub = m1b[:, :, : 9 * n1]
        m_lane = m2b[:, : in_planes * n2]
        tw_v, tw_s = plan.tb, plan.tb_shoup
    tw = np.stack([tw_v, tw_s], axis=1)  # (k, 2, 2, n1, n2)
    k = m_sub.shape[0]
    scal = np.zeros((k, 6), dtype=np.uint32)
    scal[:, 0] = plan.p_pair[0]
    scal[:, 1] = plan.p_pair[1]
    scal[:, 2] = plan.barrett_lo[0]
    scal[:, 3] = plan.barrett_lo[1]
    scal[:, 4] = plan.barrett_hi[0]
    scal[:, 5] = plan.barrett_hi[1]
    return (
        np.ascontiguousarray(m_sub),
        np.ascontiguousarray(tw),
        np.ascontiguousarray(m_lane),
        scal,
    )


def _extract_sub(lo, hi, n_planes):
    """(n1, L) u64 pair -> (n_planes*n1, L) i8, planes stacked on sublanes."""
    planes = []
    for a in range(n_planes):
        sh = DIGIT_BITS * a
        if sh < 32:
            v = lo >> U32(sh)
            if sh + DIGIT_BITS > 32:
                v = v | (hi << U32(32 - sh))
        else:
            v = hi >> U32(sh - 32)
        planes.append((v & U32(DIGIT_MASK)).astype(jnp.int8))
    return jnp.concatenate(planes, axis=0)


def _extract_lane(lo, hi, n_planes):
    """(n1, L) u64 pair -> (n1, n_planes*L) i8, planes stacked on lanes."""
    planes = []
    for a in range(n_planes):
        sh = DIGIT_BITS * a
        if sh < 32:
            v = lo >> U32(sh)
            if sh + DIGIT_BITS > 32:
                v = v | (hi << U32(32 - sh))
        else:
            v = hi >> U32(sh - 32)
        planes.append((v & U32(DIGIT_MASK)).astype(jnp.int8))
    return jnp.concatenate(planes, axis=1)


def _fold_slices(take, consts, lazy):
    """Fold 9 int32 planes (via take(b) -> (n1, L) u32) mod p."""
    bl, bh, p = consts
    zero = jnp.zeros_like(take(0))
    cols = [zero] * 6
    for b in range(B_PLANES):
        cb = take(b)
        d0 = cb & U32(0xFFFF)
        d1 = cb >> U32(16)
        qc, rc = divmod(DIGIT_BITS * b, 16)
        cols[qc] = cols[qc] + (d0 << U32(rc))
        cols[qc + 1] = cols[qc + 1] + (d1 << U32(rc))
    v0, v1, v2 = u64.cols_to_limbs(cols, 3)
    r = zq.lazy_reduce_u128((v0, v1, v2, jnp.zeros_like(v2)), bl, bh, p)
    if not lazy:
        r = zq.reduce1(r, p)
    return r


def _mxu4_kernel(scal_ref, x_ref, msub_ref, tw_ref, mlane_ref, o_ref, *,
                 n1: int, bt: int, in_planes: int, lazy: bool,
                 inverse: bool):
    li = pl.program_id(0)
    p = (scal_ref[li, 0], scal_ref[li, 1])
    bl = (scal_ref[li, 2], scal_ref[li, 3])
    bh = (scal_ref[li, 4], scal_ref[li, 5])
    consts = (bl, bh, p)

    m_sub = msub_ref[0]  # (B*n1, Ax*n1) i8
    m_lane = mlane_ref[0]  # (Ay*128, B*128) i8
    twv = (tw_ref[0, 0, 0], tw_ref[0, 0, 1])
    tws = (tw_ref[0, 1, 0], tw_ref[0, 1, 1])

    outs = []
    for r in range(bt):
        lo = x_ref[r, 0, 0]  # (n1, 128)
        hi = x_ref[r, 0, 1]
        if not inverse:
            # stage 1: sublane contraction (M1)
            x1 = _extract_sub(lo, hi, in_planes)  # (Ax*n1, 128)
            c1 = jax.lax.dot_general(
                m_sub, x1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (B*n1, 128)
            s = _fold_slices(
                lambda b: c1[b * n1 : (b + 1) * n1].astype(jnp.uint32),
                consts, lazy=True,
            )
            # twiddle (Shoup, output < 2p)
            s = zq.lazy_mul_shoup(s, twv, tws, p)
            # stage 2: lane contraction (M2)
            x2 = _extract_lane(s[0], s[1], 9)  # (n1, 9*128)
            c2 = jax.lax.dot_general(
                x2, m_lane, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (n1, B*128)
            out = _fold_slices(
                lambda b: c2[:, b * 128 : (b + 1) * 128].astype(jnp.uint32),
                consts, lazy=lazy,
            )
        else:
            # inverse: lane contraction (M2b) first
            x2 = _extract_lane(lo, hi, in_planes)  # (n1, Ax*128)
            c2 = jax.lax.dot_general(
                x2, m_lane, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            s = _fold_slices(
                lambda b: c2[:, b * 128 : (b + 1) * 128].astype(jnp.uint32),
                consts, lazy=True,
            )
            s = zq.lazy_mul_shoup(s, twv, tws, p)
            x1 = _extract_sub(s[0], s[1], 9)  # (9*n1, 128)
            c1 = jax.lax.dot_general(
                m_sub, x1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            out = _fold_slices(
                lambda b: c1[b * n1 : (b + 1) * n1].astype(jnp.uint32),
                consts, lazy=False,
            )
        outs.append(jnp.stack([out[0], out[1]], axis=0)[None, None])
    o_ref[...] = jnp.concatenate(outs, axis=0)


def _pick_bt(batch: int, n1: int) -> int:
    """Batch tile under the VMEM budget: constants (~1.8 MiB at N=8192)
    plus ~24 live (n1, 128..1152) planes per row. TPUFHE_MXU4_BT
    overrides for tuning."""
    import os as _os

    forced = _os.environ.get("TPUFHE_MXU4_BT", "")
    if forced:
        bt = min(int(forced), batch)
        while batch % bt:
            bt -= 1
        return bt
    # Measured on v5e at N=8192/L=3/B=64: bt=2 -> 2498, bt=8 -> 2681,
    # bt=16 -> 2632 mul+relin/s; prefer 8 when VMEM allows.
    budget = 12 * 1024 * 1024
    consts = (9 * n1) * (10 * n1) + (10 * 128) * (9 * 128) + 4 * n1 * 128 * 4
    per_row = n1 * 128 * 4 * 12 + n1 * 1152 * 2
    bt = max(1, (budget - 2 * consts) // per_row)
    bt = min(bt, batch, 8)
    while batch % bt:
        bt -= 1
    return bt


@lru_cache(maxsize=None)
def _mxu4_call(n1: int, k: int, batch: int, in_planes: int, lazy: bool,
               inverse: bool, interpret: bool):
    bt = _pick_bt(batch, n1)
    grid = (k, batch // bt)
    ax = in_planes if not inverse else 9
    ay = 9 if not inverse else in_planes

    kernel = partial(_mxu4_kernel, n1=n1, bt=bt, in_planes=in_planes,
                     lazy=lazy, inverse=inverse)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, 1, 2, n1, 128),
                         lambda li, bi, *_: (bi, li, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B_PLANES * n1, ax * n1),
                         lambda li, bi, *_: (li, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 2, n1, 128),
                         lambda li, bi, *_: (li, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ay * 128, B_PLANES * 128),
                         lambda li, bi, *_: (li, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, 1, 2, n1, 128),
                               lambda li, bi, *_: (bi, li, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, k, 2, n1, 128), jnp.uint32),
        grid_spec=grid_spec,
        interpret=interpret,
    )


def mxu4_pallas(x, consts, lazy=False, inverse=False, interpret=False):
    """Run the fused four-step kernel.

    x: (B, k, 2, n1, 128) uint32 lane-folded (B = flattened leading dims);
    consts: build_mxu4_consts(plan, inverse, in_planes) tuple.
    """
    m_sub, tw, m_lane, scal = consts
    batch, k, _, n1, _ = x.shape
    in_planes = (m_sub.shape[-1] // n1) if not inverse else (
        m_lane.shape[-2] // 128)
    call = _mxu4_call(n1, k, batch, in_planes, lazy, inverse, interpret)
    return call(scal, x, m_sub, tw, m_lane)
