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


def _bc_on(b8: bool) -> bool:
    """Bitcast digit extraction (b8 only): balanced base-256 digits ARE
    the bytes of (x + 0x80..80) with the sign bit flipped, so the int8
    data planes come from a dtype bitcast (plus one add64 and two xors)
    instead of ~5 shift/mask VPU ops per plane. The plane index then sits
    byte-minor INSIDE each word position instead of plane-major across
    positions; the matrices' contraction axes are permuted to match
    (_bc_perm, host-side, free), so outputs are bit-identical.
    Default ON since round 4 (v5e A/B at N=8192/L=3/B=64: 6353 -> 6506
    mul+relin/s); TPUFHE_BC_EXTRACT=0 reverts."""
    import os as _os

    return b8 and _os.environ.get("TPUFHE_BC_EXTRACT", "1") != "0"


def _bc_perm(n_pos: int) -> np.ndarray:
    """Contraction-axis permutation for bitcast-extracted data planes.

    Old index: a * n_pos + j (plane-major, a in 0..7). New index: byte-
    minor within each 32-bit word, lo-limb block then hi-limb block:
    j*4 + a for a < 4, and 4*n_pos + j*4 + (a-4) for a >= 4. Returns
    `perm` with new_matrix[..., dst] = old_matrix[..., src]: perm[dst] =
    src."""
    perm = np.empty(8 * n_pos, dtype=np.int64)
    for a in range(8):
        for j in range(n_pos):
            src = a * n_pos + j
            dst = (j * 4 + a) if a < 4 else (4 * n_pos + j * 4 + (a - 4))
            perm[dst] = src
    return perm


def build_mxu4_consts(plan: MxuNttPlan, inverse: bool, in_planes: int,
                      b8: bool = False, bc: bool = False):
    """Per-limb flattened constants for the kernel.

    Returns (m_sub, tw, m_lane, scal):
      m_sub  (k, B*n1, Ax*n1) i8 — the sublane-contracting matrix
              (M1f for forward, M1b for inverse; Ax = in_planes fwd, a2 inv)
      tw     (k, 2, 2, n1, 128) u32 — [val|shoup][lo|hi] twiddles
      m_lane (k, Ay*128, B*128) i8 — the lane-contracting matrix
              (M2f fwd with Ay=a2, M2b inv with Ay = in_planes)
      scal   (k, 6) u32 — p, barrett_lo, barrett_hi as lo/hi pairs
    b8 selects the balanced 8-bit planes (in_planes must be 8; inputs
    must be canonical < 2^62 — see ntt_mxu.py B8 notes).
    """
    from tpufhe.ops.ntt_mxu import _flat_consts, _flat_consts_b8

    if b8:
        assert in_planes == 8
        m1f, m1b, m2f, m2b = _flat_consts_b8(plan)
    else:
        m1f, m1b, m2f, m2b = _flat_consts(plan)
    a2 = 8 if b8 else 9
    n1, n2 = plan.n1, plan.n2
    if not inverse:
        m_sub = m1f[:, :, : in_planes * n1]
        m_lane = m2f[:, : a2 * n2]
        tw_v, tw_s = plan.tf, plan.tf_shoup
    else:
        m_sub = m1b[:, :, : a2 * n1]
        m_lane = m2b[:, : in_planes * n2]
        tw_v, tw_s = plan.tb, plan.tb_shoup
    if bc:
        # bitcast-extracted data planes (sublane stage ONLY — Mosaic's
        # pltpu.bitcast scales sublanes, there is no lane-expanding
        # bitcast): permute m_sub's contraction axis to the byte-minor
        # order; m_lane keeps the plane-major order (its extract stays
        # shift/mask). Requires 8 planes (b8).
        assert b8 and in_planes == 8
        m_sub = m_sub[:, :, _bc_perm(n1)]
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


def _digit_planes_jnp(lo, hi, n_planes, b8):
    """(n1, L) u64 pair -> list of n_planes (n1, L) i8 digit planes.

    b8: balanced base-256 via the offset identity (inputs must be < 2^62;
    see ntt_mxu.py B8 notes). Otherwise unsigned 7-bit digits (any u64).
    """
    planes = []
    if b8:
        lo, hi = u64.add64((lo, hi), (U32(0x80808080), U32(0x80808080)))
        for a in range(n_planes):
            sh = 8 * a
            v = (lo >> U32(sh)) if sh < 32 else (hi >> U32(sh - 32))
            planes.append(
                ((v & U32(0xFF)).astype(jnp.int32) - 128).astype(jnp.int8))
        return planes
    for a in range(n_planes):
        sh = DIGIT_BITS * a
        if sh < 32:
            v = lo >> U32(sh)
            if sh + DIGIT_BITS > 32:
                v = v | (hi << U32(32 - sh))
        else:
            v = hi >> U32(sh - 32)
        planes.append((v & U32(DIGIT_MASK)).astype(jnp.int8))
    return planes


def _extract_sub(lo, hi, n_planes, b8=False, bc=False, bc_interp=False):
    """(n1, L) u64 pair -> (n_planes*n1, L) i8, planes stacked on sublanes
    (bc=False, plane-major) or byte-minor within words (bc=True; matrices
    built with build_mxu4_consts(bc=True) match).

    bc: pltpu.bitcast sublane-expands u32 -> i8 with row order 4*i + b
    (byte b of word row i — verified on v5e), so the extract is one add64
    + two xors + a register reinterpret instead of ~5 shift/mask ops per
    plane. bc_interp uses a jnp emulation with the identical order (the
    Mosaic bitcast has no interpret-mode lowering)."""
    if bc:
        lo, hi = _bc_bytes(lo, hi)
        if bc_interp:
            def cast(v):
                b = jax.lax.bitcast_convert_type(v, jnp.int8)  # (n1, L, 4)
                return jnp.transpose(b, (0, 2, 1)).reshape(-1, v.shape[-1])
        else:
            def cast(v):
                return pltpu.bitcast(v, jnp.int8)
        return jnp.concatenate([cast(lo), cast(hi)], axis=0)  # (8*n1, L)
    return jnp.concatenate(_digit_planes_jnp(lo, hi, n_planes, b8), axis=0)


def _extract_lane(lo, hi, n_planes, b8=False):
    """(n1, L) u64 pair -> (n1, n_planes*L) i8, planes stacked on lanes.
    (No bc variant: Mosaic's bitcast scales sublanes, not lanes.)"""
    return jnp.concatenate(_digit_planes_jnp(lo, hi, n_planes, b8), axis=1)


def _bc_bytes(lo, hi):
    """u64 pair -> u32 pair whose BYTES are the balanced base-256 digits
    (as int8 after reinterpret): add the 0x80-per-byte offset, then flip
    each byte's sign bit (u ^ 0x80 reinterpreted as i8 == u - 128)."""
    lo, hi = u64.add64((lo, hi), (U32(0x80808080), U32(0x80808080)))
    return lo ^ U32(0x80808080), hi ^ U32(0x80808080)


def _opt_lz(scal) -> int:
    """Static NFLlib-opt shift for a per-limb scal table, or 0.

    Nonzero iff every limb's modulus supports the optimized reduction
    (primes.rs:10-24) and they share one leading_zeros value (true for
    any same-bit-width generated prime set, e.g. all-62-bit). Gated by
    TPUFHE_OPT_RED (default on; =0 reverts to generic Barrett)."""
    import os as _os

    if _os.environ.get("TPUFHE_OPT_RED", "") == "0":
        return 0
    from tpufhe.utils.primes import supports_opt

    ps = [int(lo) | (int(hi) << 32) for lo, hi in scal[:, :2]]
    lzs = {64 - p.bit_length() for p in ps}
    if len(lzs) != 1:
        return 0
    lz = lzs.pop()
    if not (0 < lz < 32) or not all(supports_opt(p) for p in ps):
        return 0
    return lz


def _fold_slices(take, consts, lazy, b8=False, opt_lz=0):
    """Fold int32 planes (via take(b) -> (n1, L)) mod p.

    b8: 8 signed planes at 8-bit spacing; a static +2^24 offset per plane
    keeps the 16-bit column sums unsigned, and the closed-form constant
    K*0x0101010101010101 is subtracted once after the fold (exact).
    opt_lz: nonzero routes the reduce through the NFLlib-optimized
    single-multiply Barrett (valid: fold values < 2^90 << p^2)."""
    from tpufhe.ops.ntt_mxu import B8_FOLD_CORR, B8_FOLD_K, B8_PLANES

    bl, bh, p = consts
    zero = jnp.zeros_like(take(0)).astype(jnp.uint32)
    cols = [zero] * 6
    n_planes = B8_PLANES if b8 else B_PLANES
    spacing = 8 if b8 else DIGIT_BITS
    for b in range(n_planes):
        cb = take(b)
        if b8:
            cb = (cb + jnp.int32(B8_FOLD_K)).astype(jnp.uint32)
        else:
            cb = cb.astype(jnp.uint32)
        d0 = cb & U32(0xFFFF)
        d1 = cb >> U32(16)
        qc, rc = divmod(spacing * b, 16)
        cols[qc] = cols[qc] + (d0 << U32(rc))
        cols[qc + 1] = cols[qc + 1] + (d1 << U32(rc))
    v0, v1, v2 = u64.cols_to_limbs(cols, 3)
    if b8:
        # signed balanced data digits can make the true fold value T
        # negative (|T| < p * 2^17 for contraction length <= 8*128); add
        # the congruent-to-zero D = p << 17 alongside removing the static
        # plane offset so the 96-bit value stays nonnegative
        corr = B8_FOLD_CORR
        d0 = p[0] << U32(17)
        d1 = (p[0] >> U32(15)) | (p[1] << U32(17))
        d2 = p[1] >> U32(15)
        v0, v1, v2 = u64.mp_add((v0, v1, v2), (d0 + jnp.zeros_like(v0),
                                               d1 + jnp.zeros_like(v1),
                                               d2 + jnp.zeros_like(v2)))
        v0, v1, v2 = u64.mp_sub(
            (v0, v1, v2),
            (U32(corr & 0xFFFFFFFF), U32((corr >> 32) & 0xFFFFFFFF),
             U32(corr >> 64)),
        )
    a128 = (v0, v1, v2, jnp.zeros_like(v2))
    if opt_lz:
        r = zq.lazy_reduce_opt_u128(a128, bl, opt_lz, p)
    else:
        r = zq.lazy_reduce_u128(a128, bl, bh, p)
    if not lazy:
        r = zq.reduce1(r, p)
    return r


def _swpipe_on() -> bool:
    """Software-pipeline the per-chunk dot->fold chains inside a kernel:
    emit the NEXT chunk's first-stage MXU dot before the CURRENT chunk's
    VPU fold/twiddle work, and the second-stage dot before the PREVIOUS
    chunk's final fold, so Mosaic's scheduler can keep the MXU busy under
    the VPU stages (the kernels otherwise serialize MXU+VPU stage-by-
    stage — ROOFLINE.md round-3 analysis). Arithmetic is untouched:
    emission order only, outputs bit-identical. TPUFHE_SWPIPE=0 reverts.

    CAVEAT (round-4 mulrelin16384 repro): pipelining keeps TWO chunks'
    int32 product planes live at once. When the chunk size was chosen
    ELECTIVELY (the whole row batch fits VMEM and was split just to
    pipeline), that is VMEM-neutral vs the single-dot form; when the
    chunking is VMEM-FORCED (N=16384 tail/tensor kernels), doubling the
    live scratch overflows the 16 MiB scope and the compile fails — the
    call builders therefore pass swpipe=False whenever their auto-chunk
    is budget-limited."""
    import os as _os

    return _os.environ.get("TPUFHE_SWPIPE", "1") != "0"


def _emit_chunks(chunks, first, mid, last, swpipe: bool):
    """Emit two-dot chains per chunk, sequentially or software-pipelined.

    first(c) -> stage-1 int32 product planes (MXU dot)
    mid(c, planes) -> stage-2 product planes (VPU fold/twiddle + MXU dot)
    last(c, planes) -> None (final VPU fold, stores row outputs)
    """
    if not swpipe or len(chunks) == 1:
        for c in chunks:
            last(c, mid(c, first(c)))
        return
    d_prev = first(chunks[0])
    pend = None
    for i, c in enumerate(chunks):
        d_cur = d_prev
        if i + 1 < len(chunks):
            d_prev = first(chunks[i + 1])
        c2 = mid(c, d_cur)
        if pend is not None:
            last(chunks[i - 1], pend)
        pend = c2
    last(chunks[-1], pend)


def _mxu4_kernel(scal_ref, x_ref, msub_ref, tw_ref, mlane_ref, o_ref, *,
                 n1: int, bt: int, in_planes: int, lazy: bool,
                 inverse: bool, b8: bool = False, opt_lz: int = 0,
                 bc: bool = False, bc_interp: bool = False,
                 chunk: int = 0, swpipe: bool = False):
    """Batched formulation: the chunk batch rows of one dot are
    concatenated into a SINGLE dot per stage — M1 contracts sublanes so
    rows stack on lanes as (Ax*n1, nr*128); M2 contracts lanes so rows
    stack on sublanes as (nr*n1, Ay*128). One (576, 576)@(576, nr*128)-
    shaped MXU op per stage amortizes the weight-tile loads nr times
    better than nr separate 128-column dots (the per-row loop measured
    21% MXU utilization; see ROOFLINE.md). `chunk` splits the bt rows of
    a cell into independent dot->fold chains emitted software-pipelined
    (_emit_chunks) so one chunk's MXU dot runs under another's VPU fold.
    Integer arithmetic is order-independent here, so outputs stay
    bit-identical to the per-row loop and ops/ntt_mxu.py."""
    li = pl.program_id(0)
    p = (scal_ref[li, 0], scal_ref[li, 1])
    bl = (scal_ref[li, 2], scal_ref[li, 3])
    bh = (scal_ref[li, 4], scal_ref[li, 5])
    consts = (bl, bh, p)

    m_sub = msub_ref[0]  # (B*n1, Ax*n1) i8
    m_lane = mlane_ref[0]  # (Ay*128, B*128) i8
    twv = (tw_ref[0, 0, 0], tw_ref[0, 0, 1])
    tws = (tw_ref[0, 1, 0], tw_ref[0, 1, 1])

    # stage-2 planes: b8 after an in-kernel reduce1 makes the twiddled
    # values canonical (< p < 2^62); otherwise 9 unsigned 7-bit planes
    # cover the lazy (< 2p < 2^63) twiddle outputs
    a2 = 8 if b8 else 9

    if chunk <= 0:
        chunk = bt
    rows_idx = list(range(bt))
    row_outs = [None] * bt
    chunks = [(base, rows_idx[base : base + chunk])
              for base in range(0, bt, chunk)]

    if not inverse:
        def first(c):
            _, sub = c
            # stage 1 (M1, sublane contraction): rows lane-concatenated
            x1 = jnp.concatenate(
                [_extract_sub(x_ref[r, 0, 0], x_ref[r, 0, 1], in_planes,
                              b8, bc, bc_interp)
                 for r in sub],
                axis=1,
            )  # (Ax*n1, nr*128)
            return jax.lax.dot_general(
                m_sub, x1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (B*n1, nr*128)

        def mid(c, c1):
            nr = len(c[1])
            s = _fold_slices(lambda b: c1[b * n1 : (b + 1) * n1],
                consts, lazy=True, b8=b8, opt_lz=opt_lz)
            # twiddle (Shoup, output < 2p); tiles are loop-invariant
            twv_t = (jnp.concatenate([twv[0]] * nr, axis=1),
                     jnp.concatenate([twv[1]] * nr, axis=1))
            tws_t = (jnp.concatenate([tws[0]] * nr, axis=1),
                     jnp.concatenate([tws[1]] * nr, axis=1))
            s = zq.lazy_mul_shoup(s, twv_t, tws_t, p)
            if b8:
                s = zq.reduce1(s, p)
            # stage 2 (M2, lane contraction): rows sublane-concatenated
            x2 = jnp.concatenate(
                [_extract_lane(s[0][:, i * 128 : (i + 1) * 128],
                               s[1][:, i * 128 : (i + 1) * 128], a2, b8)
                 for i in range(nr)],
                axis=0,
            )  # (nr*n1, a2*128)
            return jax.lax.dot_general(
                x2, m_lane, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (nr*n1, B*128)

        def last(c, c2):
            base, sub = c
            out = _fold_slices(lambda b: c2[:, b * 128 : (b + 1) * 128],
                consts, lazy=lazy, b8=b8, opt_lz=opt_lz)
            for i in range(len(sub)):
                row_outs[base + i] = (out[0][i * n1 : (i + 1) * n1],
                                      out[1][i * n1 : (i + 1) * n1])

        _emit_chunks(chunks, first, mid, last, swpipe)
    else:
        def first(c):
            _, sub = c
            # inverse: lane contraction (M2b) first, rows on sublanes
            x2 = jnp.concatenate(
                [_extract_lane(x_ref[r, 0, 0], x_ref[r, 0, 1], in_planes,
                               b8)
                 for r in sub],
                axis=0,
            )  # (nr*n1, Ax*128)
            return jax.lax.dot_general(
                x2, m_lane, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (nr*n1, B*128)

        def mid(c, c2):
            nr = len(c[1])
            s = _fold_slices(lambda b: c2[:, b * 128 : (b + 1) * 128],
                consts, lazy=True, b8=b8, opt_lz=opt_lz)
            twv_t = (jnp.concatenate([twv[0]] * nr, axis=0),
                     jnp.concatenate([twv[1]] * nr, axis=0))
            tws_t = (jnp.concatenate([tws[0]] * nr, axis=0),
                     jnp.concatenate([tws[1]] * nr, axis=0))
            s = zq.lazy_mul_shoup(s, twv_t, tws_t, p)
            if b8:
                s = zq.reduce1(s, p)
            # M1 stage: rows lane-concatenated
            x1 = jnp.concatenate(
                [_extract_sub(s[0][i * n1 : (i + 1) * n1],
                              s[1][i * n1 : (i + 1) * n1], a2, b8, bc,
                              bc_interp)
                 for i in range(nr)],
                axis=1,
            )  # (a2*n1, nr*128)
            return jax.lax.dot_general(
                m_sub, x1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (B*n1, nr*128)

        def last(c, c1):
            base, sub = c
            out = _fold_slices(lambda b: c1[b * n1 : (b + 1) * n1],
                consts, lazy=False, b8=b8, opt_lz=opt_lz)
            for i in range(len(sub)):
                row_outs[base + i] = (out[0][:, i * 128 : (i + 1) * 128],
                                      out[1][:, i * 128 : (i + 1) * 128])

        _emit_chunks(chunks, first, mid, last, swpipe)

    o_ref[...] = jnp.stack(
        [
            jnp.stack([row_outs[r][0] for r in range(bt)], axis=0),
            jnp.stack([row_outs[r][1] for r in range(bt)], axis=0),
        ],
        axis=1,
    )[:, None]


def _relin_tail_kernel(scal_ref, x_ref, msub_ref, tw_ref, mlane_ref,
                       ksk_ref, o_ref, *, n1: int, bt: int, n_polys: int,
                       in_planes: int, b8: bool = False, opt_lz: int = 0,
                       chunk: int = 0, mode: str = "relin",
                       bc: bool = False, bc_interp: bool = False,
                       swpipe: bool = False):
    """Merged forward NTT + key-switch accumulate + final add, one cell.

    mode="relin" (pipeline.build_mul_relin_step):
      x_ref rows are [c0, c1, d_0..d_{k-1}] canonical power-basis rows of
      one limb (the down-scaled ciphertext parts + garner decomposition
      rows); ALL rows transform; o = (c0 + ks0, c1 + ks1).
    mode="rotate" (pipeline._rotate_step, galois_key.rs:90-124):
      x_ref rows are [s0, d_0..d_{k-1}] where s0 is the substituted c0
      ALREADY in NTT domain (passthrough, no transform) and the d_i are
      the substituted-c1 decomposition rows; o = (s0 + ks0, ks1).
    mode="ks_only" (key_switching_key.rs:214-241 standalone):
      x_ref rows are [d_0..d_{k-1}]; o = (ks0, ks1).

    ksk_ref: (1, k_rows, 4, 2, n1, 128) — this limb's ksk constants as
    [c0, c0_shoup, c1, c1_shoup] value/Shoup u64 pairs.
    o_ref: (2, bt, 1, 2, n1, 128).

    All transformed rows of the cell share ONE dot per NTT stage (lanes
    for M1, sublanes for M2), so the MXU batch is n_polys x larger than
    the plain kernel's; the key-switch Shoup accumulation runs in VMEM on
    the transform outputs, eliminating the XLA-level accumulate fusion and
    its HBM staging of the (k x batch) lifted rows (ROOFLINE r2: copies
    were ~50% of device time).
    """
    li = pl.program_id(0)
    p = (scal_ref[li, 0], scal_ref[li, 1])
    bl = (scal_ref[li, 2], scal_ref[li, 3])
    bh = (scal_ref[li, 4], scal_ref[li, 5])
    consts = (bl, bh, p)
    t_start = {"relin": 0, "rotate": 1, "ks_only": 0}[mode]
    d_start = {"relin": 2, "rotate": 1, "ks_only": 0}[mode]
    k_rows = n_polys - d_start

    m_sub = msub_ref[0]
    m_lane = mlane_ref[0]
    twv = (tw_ref[0, 0, 0], tw_ref[0, 0, 1])
    tws = (tw_ref[0, 1, 0], tw_ref[0, 1, 1])
    a2 = 8 if b8 else 9
    rows = (n_polys - t_start) * bt
    if chunk <= 0:
        chunk = rows

    # With an opt modulus of >= 2 leading zeros (p < 2^62, all generated
    # 62-bit primes) the whole epilogue runs on LAZY (< 2p)
    # representatives: lazy_mul_shoup takes any u64 first argument, lazy
    # pairs sum to < 4p < 2^64, and one u64 lazy_reduce_opt restores the
    # < 2p invariant — the only canonicalization is the final reduce1 on
    # the two output rows. At lz = 1 the u64 sum could overflow, so that
    # case keeps the canonical add_mod chain (outputs are bit-identical
    # either way: canonical).
    lazy_epi = opt_lz >= 2

    # `chunk` splits the NTT row batch into independent dot->fold chains
    # (bit-identical: the fold math is per-row) so the live int32 product
    # planes stay under the VMEM scoped limit at large n1 — at N=16384
    # (n1=128, k=6, n_polys=8) the single-dot form allocates 23.4 MiB of
    # scratch vs the 16 MiB cap (the round-3 mulrelin16384 compile
    # failure, VERDICT r4 item 2).
    qr = [(q, r) for q in range(t_start, n_polys) for r in range(bt)]
    row_outs = [None] * rows
    chunks = [(base, qr[base : base + chunk])
              for base in range(0, rows, chunk)]

    def first(c):
        _, sub = c
        # stage 1 (M1, sublane contraction): rows lane-concatenated
        x1 = jnp.concatenate(
            [_extract_sub(x_ref[q, r, 0, 0], x_ref[q, r, 0, 1],
                          in_planes, b8, bc, bc_interp)
             for q, r in sub],
            axis=1,
        )  # (Ax*n1, nr*128)
        return jax.lax.dot_general(
            m_sub, x1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def mid(c, c1):
        nr = len(c[1])
        s = _fold_slices(lambda b: c1[b * n1 : (b + 1) * n1], consts,
                         lazy=True, b8=b8, opt_lz=opt_lz)
        twv_t = (jnp.concatenate([twv[0]] * nr, axis=1),
                 jnp.concatenate([twv[1]] * nr, axis=1))
        tws_t = (jnp.concatenate([tws[0]] * nr, axis=1),
                 jnp.concatenate([tws[1]] * nr, axis=1))
        s = zq.lazy_mul_shoup(s, twv_t, tws_t, p)
        if b8:
            s = zq.reduce1(s, p)
        # stage 2 (M2, lane contraction): rows sublane-concatenated
        x2 = jnp.concatenate(
            [_extract_lane(s[0][:, i * 128 : (i + 1) * 128],
                           s[1][:, i * 128 : (i + 1) * 128], a2, b8)
             for i in range(nr)],
            axis=0,
        )  # (nr*n1, a2*128)
        return jax.lax.dot_general(
            x2, m_lane, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def last(c, c2):
        base, sub = c
        out = _fold_slices(lambda b: c2[:, b * 128 : (b + 1) * 128],
                           consts, lazy=lazy_epi, b8=b8, opt_lz=opt_lz)
        for i in range(len(sub)):
            row_outs[base + i] = (out[0][i * n1 : (i + 1) * n1],
                                  out[1][i * n1 : (i + 1) * n1])

    _emit_chunks(chunks, first, mid, last, swpipe)

    def row(q, r):
        return row_outs[(q - t_start) * bt + r]

    # epilogue: ks{0,1} = sum_i d_i * ksk_c{0,1}[i]; add the mode's carries
    for r in range(bt):
        acc0 = acc1 = None
        for i in range(k_rows):
            di = row(d_start + i, r)
            if lazy_epi:
                t0 = zq.lazy_mul_shoup(
                    di, (ksk_ref[0, i, 0, 0], ksk_ref[0, i, 0, 1]),
                    (ksk_ref[0, i, 1, 0], ksk_ref[0, i, 1, 1]), p)
                t1 = zq.lazy_mul_shoup(
                    di, (ksk_ref[0, i, 2, 0], ksk_ref[0, i, 2, 1]),
                    (ksk_ref[0, i, 3, 0], ksk_ref[0, i, 3, 1]), p)
                if acc0 is None:
                    acc0, acc1 = t0, t1
                else:
                    acc0 = zq.lazy_reduce_opt(
                        u64.add64(acc0, t0), opt_lz, p)
                    acc1 = zq.lazy_reduce_opt(
                        u64.add64(acc1, t1), opt_lz, p)
            else:
                t0 = zq.mul_shoup(
                    di, (ksk_ref[0, i, 0, 0], ksk_ref[0, i, 0, 1]),
                    (ksk_ref[0, i, 1, 0], ksk_ref[0, i, 1, 1]), p)
                t1 = zq.mul_shoup(
                    di, (ksk_ref[0, i, 2, 0], ksk_ref[0, i, 2, 1]),
                    (ksk_ref[0, i, 3, 0], ksk_ref[0, i, 3, 1]), p)
                if acc0 is None:
                    acc0, acc1 = t0, t1
                else:
                    acc0 = zq.add_mod(acc0, t0, p)
                    acc1 = zq.add_mod(acc1, t1, p)
        if mode == "relin":
            c0r, c1r = row(0, r), row(1, r)
        elif mode == "rotate":
            # s0 rides along untransformed: canonical NTT-domain values
            c0r = (x_ref[0, r, 0, 0], x_ref[0, r, 0, 1])
            c1r = None
        else:  # ks_only
            c0r = c1r = None
        if lazy_epi:
            if c0r is not None:
                acc0 = zq.lazy_reduce_opt(u64.add64(c0r, acc0), opt_lz, p)
            if c1r is not None:
                acc1 = zq.lazy_reduce_opt(u64.add64(c1r, acc1), opt_lz, p)
            o0 = zq.reduce1(acc0, p)
            o1 = zq.reduce1(acc1, p)
        else:
            o0 = acc0 if c0r is None else zq.add_mod(c0r, acc0, p)
            o1 = acc1 if c1r is None else zq.add_mod(c1r, acc1, p)
        o_ref[0, r, 0] = jnp.stack([o0[0], o0[1]])
        o_ref[1, r, 0] = jnp.stack([o1[0], o1[1]])


@lru_cache(maxsize=None)
def _relin_tail_call(n1: int, k: int, batch: int, n_polys: int,
                     in_planes: int, interpret: bool, b8: bool,
                     opt_lz: int = 0, mode: str = "relin",
                     bc: bool = False):
    # n_polys rows transform per batch row; budget bt so the live int32
    # product planes (the VMEM peak) stay ~3 MiB as in the plain kernel
    import os as _os

    # measured on v5e (N=8192/L=3/B=64, opt+tintt on): bt=1 -> 5513,
    # bt=2 -> 5529 mul+relin/s
    forced = _os.environ.get("TPUFHE_TAIL_BT", "")
    bt = int(forced) if forced else max(1, 16 // n_polys)
    bt = min(bt, batch)
    while batch % bt:
        bt -= 1
    # VMEM scope budget (the v5e scoped limit is 16 MiB): the dominant
    # scratch is the two int32 product-plane buffers, ~2 * bp*n1 * 128*4
    # bytes per NTT row; the fixed blocks (x, ksk, matrices, row_outs)
    # cost ~(n_polys*bt + 4*(n_polys-2) + 2*bt + 2) u64 rows plus 2 MiB
    # of int8 matrices. Chunk the row batch so scratch fits (bit-exact;
    # see _relin_tail_kernel). At N=8192 the defaults already fit and
    # chunk stays off.
    bp = 8 if b8 else B_PLANES
    t_start = {"relin": 0, "rotate": 1, "ks_only": 0}[mode]
    d_start = {"relin": 2, "rotate": 1, "ks_only": 0}[mode]
    k_rows = n_polys - d_start
    budget = int(_os.environ.get("TPUFHE_TAIL_VMEM", str(13 * 2**20)))
    chunk_env = _os.environ.get("TPUFHE_TAIL_CHUNK", "")
    row_u64 = 2 * n1 * 128 * 4  # one u64-pair row in bytes
    # per-row chunk scratch: 2 int32 plane buffers + ~6 u64 temps
    per_row = 2 * bp * n1 * 128 * 4 + 6 * row_u64

    def _auto_chunk(bt_):
        rows_ = (n_polys - t_start) * bt_
        fixed = (n_polys * bt_ + rows_ + 4 * k_rows + 2 * bt_ + 2) \
            * row_u64 + 2 * (bp * n1) * (bp * n1) + (2 * bp + 8) * n1 * 128
        c = (budget - fixed) // per_row
        return rows_ if c >= rows_ else max(0, c)

    rows_all = (n_polys - t_start) * bt
    if chunk_env:
        chunk = int(chunk_env)
        # pipeline only when ELECTIVE: two live chunks of scratch must
        # fit the VMEM budget; a VMEM-forced chunk stays sequential
        swpipe = (_swpipe_on() and 0 < chunk < rows_all
                  and _auto_chunk(bt) >= min(rows_all, 2 * chunk))
    else:
        # shrink bt before chunking below 2 rows per dot (tiny dots waste
        # the MXU; measured in the r3 TINTT chunk sweep)
        while not forced and bt > 1 and _auto_chunk(bt) < 2:
            bt -= 1
            while batch % bt:
                bt -= 1
        rows_all = (n_polys - t_start) * bt
        chunk = max(1, _auto_chunk(bt))
        # elective split only (see _swpipe_on caveat): a VMEM-forced
        # chunk stays sequential
        swpipe = _swpipe_on() and chunk >= rows_all
        if swpipe:
            chunk = (rows_all + 1) // 2
    grid = (k, batch // bt)
    a2 = 8 if b8 else 9

    kernel = partial(_relin_tail_kernel, n1=n1, bt=bt, n_polys=n_polys,
                     in_planes=in_planes, b8=b8, opt_lz=opt_lz,
                     chunk=chunk, mode=mode, bc=bc, bc_interp=interpret,
                     swpipe=swpipe)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_polys, bt, 1, 2, n1, 128),
                         lambda li, bi, *_: (0, bi, li, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bp * n1, in_planes * n1),
                         lambda li, bi, *_: (li, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 2, n1, 128),
                         lambda li, bi, *_: (li, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a2 * 128, bp * 128),
                         lambda li, bi, *_: (li, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_rows, 4, 2, n1, 128),
                         lambda li, bi, *_: (li, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, bt, 1, 2, n1, 128),
                               lambda li, bi, *_: (0, bi, li, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2, batch, k, 2, n1, 128),
                                       jnp.uint32),
        grid_spec=grid_spec,
        interpret=interpret,
    )


def _tensor_intt_kernel(scal_ref, x_ref, msub_ref, tw_ref, mlane_ref,
                        o_ref, *, n1: int, bt: int, in_planes: int,
                        b8: bool = False, opt_lz: int = 0,
                        chunk: int = 0, bc: bool = False,
                        bc_interp: bool = False, swpipe: bool = False):
    """Fused tensor product + inverse NTT for one (limb, batch-tile) cell.

    x_ref: (4, bt, 1, 2, n1, 128) NTT-domain extended operands
    [a0, a1, b0, b1] of one multiplication-basis limb. The prologue
    computes the degree-2 tensor (c0, c1, c2) = (a0*b0, a0*b1 + a1*b0,
    a1*b1) mod p in VMEM (ops/mod.rs:318-325), then the 3*bt rows share
    one inverse transform (M2b lane dot -> twiddle -> M1b sublane dot).
    o_ref: (3, bt, 1, 2, n1, 128) power-basis rows. Removes the XLA-level
    tensor fusion and the full 7-limb tensor's HBM round trip between it
    and the down-scale iNTT.
    """
    li = pl.program_id(0)
    p = (scal_ref[li, 0], scal_ref[li, 1])
    bl = (scal_ref[li, 2], scal_ref[li, 3])
    bh = (scal_ref[li, 4], scal_ref[li, 5])
    consts = (bl, bh, p)

    m_sub = msub_ref[0]
    m_lane = mlane_ref[0]
    twv = (tw_ref[0, 0, 0], tw_ref[0, 0, 1])
    tws = (tw_ref[0, 1, 0], tw_ref[0, 1, 1])
    a2 = 8 if b8 else 9
    rows = 3 * bt
    if chunk <= 0:
        chunk = rows

    # prologue: tensor product rows, canonical < p. With a supports_opt
    # modulus each product a*b < p^2 takes the NFLlib single-multiply
    # reduce (2 wide muls vs the generic Barrett's 4); c1's two lazy
    # terms sum to < 4p < 2^64, which lazy_reduce_opt (u64 form) brings
    # back under 2p with one low multiply. Computed lazily per batch row:
    # under the software-pipelined schedule the rows chunk i+1 needs are
    # emitted while chunk i's first dot is in flight.
    tens = {}

    def tens_row(r):
        if r in tens:
            return tens[r]
        a0 = (x_ref[0, r, 0, 0], x_ref[0, r, 0, 1])
        a1 = (x_ref[1, r, 0, 0], x_ref[1, r, 0, 1])
        b0 = (x_ref[2, r, 0, 0], x_ref[2, r, 0, 1])
        b1 = (x_ref[3, r, 0, 0], x_ref[3, r, 0, 1])
        if opt_lz:
            c0 = zq.mul_mod_opt(a0, b0, bl, opt_lz, p)
            s01 = u64.add64(zq.lazy_mul_opt(a0, b1, bl, opt_lz, p),
                            zq.lazy_mul_opt(a1, b0, bl, opt_lz, p))
            c1 = zq.reduce1(zq.lazy_reduce_opt(s01, opt_lz, p), p)
            c2 = zq.mul_mod_opt(a1, b1, bl, opt_lz, p)
        else:
            c0 = zq.mul_mod(a0, b0, bl, bh, p)
            c1 = zq.add_mod(zq.mul_mod(a0, b1, bl, bh, p),
                            zq.mul_mod(a1, b0, bl, bh, p), p)
            c2 = zq.mul_mod(a1, b1, bl, bh, p)
        tens[r] = (c0, c1, c2)
        return tens[r]

    # inverse: lane contraction (M2b) first, rows on sublanes; row order
    # is part-major (c0 rows, c1 rows, c2 rows) to match o_ref layout.
    # `chunk` splits the row batch into independent dot->fold chains: the
    # fold math is per-row, so chunked dots are bit-identical, and the
    # software-pipelined emission (_emit_chunks) overlaps one chunk's VPU
    # fold with the next chunk's MXU dot (chunk = rows: single-dot form).
    qr = [(q, r) for q in range(3) for r in range(bt)]
    row_outs = [None] * rows
    chunks = [(base, qr[base : base + chunk])
              for base in range(0, rows, chunk)]

    def first(c):
        _, sub = c
        x2 = jnp.concatenate(
            [_extract_lane(tens_row(r)[q][0], tens_row(r)[q][1],
                           in_planes, b8)
             for q, r in sub],
            axis=0,
        )  # (nr*n1, Ax*128)
        return jax.lax.dot_general(
            x2, m_lane, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def mid(c, c2m):
        nr = len(c[1])
        s = _fold_slices(lambda b: c2m[:, b * 128 : (b + 1) * 128], consts,
            lazy=True, b8=b8, opt_lz=opt_lz)
        twv_t = (jnp.concatenate([twv[0]] * nr, axis=0),
                 jnp.concatenate([twv[1]] * nr, axis=0))
        tws_t = (jnp.concatenate([tws[0]] * nr, axis=0),
                 jnp.concatenate([tws[1]] * nr, axis=0))
        s = zq.lazy_mul_shoup(s, twv_t, tws_t, p)
        if b8:
            s = zq.reduce1(s, p)
        x1 = jnp.concatenate(
            [_extract_sub(s[0][i * n1 : (i + 1) * n1],
                          s[1][i * n1 : (i + 1) * n1], a2, b8, bc,
                          bc_interp)
             for i in range(nr)],
            axis=1,
        )  # (a2*n1, nr*128)
        return jax.lax.dot_general(
            m_sub, x1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (B*n1, nr*128)

    def last(c, c1m):
        base, sub = c
        out = _fold_slices(lambda b: c1m[b * n1 : (b + 1) * n1], consts,
            lazy=False, b8=b8, opt_lz=opt_lz)
        for i in range(len(sub)):
            row_outs[base + i] = (out[0][:, i * 128 : (i + 1) * 128],
                                  out[1][:, i * 128 : (i + 1) * 128])

    _emit_chunks(chunks, first, mid, last, swpipe)
    o_ref[...] = jnp.stack(
        [
            jnp.stack([row_outs[r][0] for r in range(rows)], axis=0),
            jnp.stack([row_outs[r][1] for r in range(rows)], axis=0),
        ],
        axis=1,
    ).reshape(3, bt, 2, n1, 128)[:, :, None]


@lru_cache(maxsize=None)
def _tensor_intt_call(n1: int, k: int, batch: int, in_planes: int,
                      interpret: bool, b8: bool, opt_lz: int = 0,
                      bc: bool = False):
    import os as _os

    forced = _os.environ.get("TPUFHE_TINTT_BT", "")
    # Hardware-anchored defaults (the analytic VMEM model misjudges the
    # double-buffered block cost in both directions at the extremes):
    # n1 <= 64 (N <= 8192): bt=4 + pipelined chunk=4 PROVEN on v5e at
    # N=8192/L=3/B=64 (6,643 vs bt=2's 6,609, no OOM). n1 > 64: bt=4
    # OOMs the 16 MiB scope at N=16384 (16.77M, round-4 repro) — keep
    # the r4a-proven bt=2 + sequential auto-chunk.
    swp = _swpipe_on() and n1 <= 64
    bt = int(forced) if forced else (4 if swp else 2)
    bt = min(bt, batch)
    while batch % bt:
        bt -= 1
    bp = 8 if b8 else B_PLANES
    a2 = 8 if b8 else 9

    # VMEM scope budget, mirroring _relin_tail_call: chunk the 3*bt tensor
    # rows so the int32 product planes fit the 16 MiB scoped limit at
    # large n1 (N=16384). At N<=8192 the defaults fit and chunk stays 0
    # (single-dot form) unless TPUFHE_TINTT_CHUNK forces it.
    budget = int(_os.environ.get("TPUFHE_TINTT_VMEM", str(13 * 2**20)))
    row_u64 = 2 * n1 * 128 * 4
    per_row = 2 * bp * n1 * 128 * 4 + 6 * row_u64

    def _auto_chunk(bt_):
        rows_ = 3 * bt_
        fixed = (4 * bt_ + 2 * rows_ + 2) * row_u64 \
            + 2 * (bp * n1) * (bp * n1) + (2 * bp + 8) * n1 * 128
        c = (budget - fixed) // per_row
        return rows_ if c >= rows_ else max(0, c)

    chunk_env = _os.environ.get("TPUFHE_TINTT_CHUNK", "")
    if chunk_env:
        chunk = int(chunk_env)
        # pipeline only when ELECTIVE (two live chunks fit VMEM); a
        # VMEM-forced chunk must stay sequential — the round-4
        # mulrelin16384 OOM repro
        swpipe = (_swpipe_on() and 0 < chunk < 3 * bt
                  and _auto_chunk(bt) >= min(3 * bt, 2 * chunk))
    elif swp and _auto_chunk(bt) >= min(3 * bt, 8):
        # the hardware-proven pipelined point (three 4-row chains); the
        # guard keeps two live 4-row chunks inside the VMEM budget even
        # when bt was env-forced large (TPUFHE_TINTT_BT)
        chunk, swpipe = 4, True
    else:
        while not forced and bt > 1 and _auto_chunk(bt) < 2:
            bt -= 1
            while batch % bt:
                bt -= 1
        auto = _auto_chunk(bt)
        chunk = 0 if auto >= 3 * bt else max(1, auto)
        # sequential emission here: a VMEM-forced chunk must not be
        # pipelined (two live chunks overflow the scope — the round-4
        # mulrelin16384 HTTP-500 repro)
        swpipe = False
    grid = (k, batch // bt)
    kernel = partial(_tensor_intt_kernel, n1=n1, bt=bt,
                     in_planes=in_planes, b8=b8, opt_lz=opt_lz,
                     chunk=chunk, bc=bc, bc_interp=interpret,
                     swpipe=swpipe)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, bt, 1, 2, n1, 128),
                         lambda li, bi, *_: (0, bi, li, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bp * n1, a2 * n1),
                         lambda li, bi, *_: (li, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 2, n1, 128),
                         lambda li, bi, *_: (li, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, in_planes * 128, bp * 128),
                         lambda li, bi, *_: (li, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, bt, 1, 2, n1, 128),
                               lambda li, bi, *_: (0, bi, li, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, batch, k, 2, n1, 128),
                                       jnp.uint32),
        grid_spec=grid_spec,
        interpret=interpret,
    )


def tensor_intt_pallas(x, ntt_consts, interpret=False, b8=False, bc=None):
    """Fused tensor + inverse NTT: x (4, B, k, 2, n1, 128) NTT-domain
    extended operands [a0, a1, b0, b1] -> (3, B, k, 2, n1, 128)
    power-basis tensor rows. Taking the poly axis pre-stacked matters:
    the pipeline's `ext` concat already has it, so no re-stack copy.
    ntt_consts: build_mxu4_consts(plan, inverse=True, in_planes=9, b8).
    bc MUST match the flag the consts were built with (None = the
    _bc_on(b8) default, which rq.Context.dev.mxu4_consts also keys on)."""
    m_sub, tw, m_lane, scal = ntt_consts
    _, batch, k, _, n1, _ = x.shape
    in_planes = m_lane.shape[-2] // 128
    call = _tensor_intt_call(n1, k, batch, in_planes, interpret, b8,
                             _opt_lz(scal),
                             _bc_on(b8) if bc is None else bc)
    return call(scal, x, m_sub, tw, m_lane)


def relin_tail_pallas(x, ntt_consts, ksk_tail, interpret=False, b8=False,
                      bc=None):
    """Fused tail: x (n_polys, B, k, 2, n1, 128) canonical power-basis
    rows [c0, c1, d_0..d_{k-1}] -> (2, B, k, 2, n1, 128) relinearized
    ciphertext. ksk_tail: (k, k_rows, 4, 2, n1, 128) u32 per-limb ksk
    constants (build_ksk_tail_consts). bc must match the consts (None =
    the _bc_on(b8) default)."""
    m_sub, tw, m_lane, scal = ntt_consts
    n_polys, batch, k, _, n1, _ = x.shape
    in_planes = m_sub.shape[-1] // n1
    call = _relin_tail_call(n1, k, batch, n_polys, in_planes, interpret, b8,
                            _opt_lz(scal), "relin",
                            _bc_on(b8) if bc is None else bc)
    return call(scal, x, m_sub, tw, m_lane, ksk_tail)


def rotate_tail_pallas(x, ntt_consts, ksk_tail, interpret=False, b8=False,
                       bc=None):
    """Fused Galois key-switch tail (galois_key.rs:90-124): x
    (1 + k_rows, B, k, 2, n1, 128) rows [s0_ntt, d_0..d_{k-1}] where s0 is
    the substituted c0 (NTT domain, passthrough) and d_i are the
    substituted-c1 garner decomposition rows (canonical power basis) ->
    (2, B, k, 2, n1, 128) = (s0 + ks0, ks1)."""
    m_sub, tw, m_lane, scal = ntt_consts
    n_polys, batch, k, _, n1, _ = x.shape
    in_planes = m_sub.shape[-1] // n1
    call = _relin_tail_call(n1, k, batch, n_polys, in_planes, interpret, b8,
                            _opt_lz(scal), "rotate",
                            _bc_on(b8) if bc is None else bc)
    return call(scal, x, m_sub, tw, m_lane, ksk_tail)


def tail_kernel_fits(n1: int, n_polys: int, k_rows: int) -> bool:
    """Whether the fused tail kernel fits the 16 MiB VMEM scope at its
    minimum tiling (bt=1, chunk=1). The blocks themselves (x, the ksk
    constants, both int8 matrices, twiddles, out — each double-buffered
    by the Pallas pipeline) dominate at large n1: the measured anchor is
    N=16384/k=6 relin (n_polys=8, k_rows=6) allocating 16.81M > 16M even
    at minimum tiles. Callers fall back to the unfused composition
    (stacked forward NTT + XLA-level accumulate — bit-identical) when
    this returns False."""
    row = 2 * n1 * 128 * 4
    blocks = (n_polys * row              # x
              + k_rows * 4 * row         # ksk value/shoup pairs
              + 2 * (8 * n1) * (8 * n1)  # m_sub + m_lane (int8)
              + 2 * row                  # twiddles
              + 2 * row)                 # out (bt=1)
    est = 2 * blocks + n_polys * row + 2 * 8 * n1 * 128 * 4 + 6 * row
    return est <= 14 * 2**20


def build_ksk_tail_consts(ksk_c0, ksk_c1) -> np.ndarray:
    """(k_limbs, k_rows, 4, 2, n1, 128) u32: per limb, per decomposition
    row, [c0, c0_shoup, c1, c1_shoup] x [lo, hi] lane-folded planes.

    ksk_c0/ksk_c1: lists of (coeffs, coeffs_shoup) numpy pairs shaped
    (k, 2, n1, 128) as produced by pipeline._ksk_consts."""
    k_rows = len(ksk_c0)
    k = ksk_c0[0][0].shape[0]
    n1 = ksk_c0[0][0].shape[-2]
    out = np.zeros((k, k_rows, 4, 2, n1, 128), dtype=np.uint32)
    for i in range(k_rows):
        c0v, c0s = ksk_c0[i]
        c1v, c1s = ksk_c1[i]
        out[:, i, 0] = c0v
        out[:, i, 1] = c0s
        out[:, i, 2] = c1v
        out[:, i, 3] = c1s
    return out


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
    # Measured on v5e at N=8192/L=3/B=64: with the r2 kernels bt=8 beat
    # 16 (4079 vs 3721), but with the r3 b8 planes + opt reduction the
    # per-row VMEM footprint shrank and bt=16 wins (5777 vs 5616 combo
    # sweeps, benches/logs/sweep_r3{b,c,d}.log); prefer 16 when it fits.
    budget = 12 * 1024 * 1024
    consts = (9 * n1) * (10 * n1) + (10 * 128) * (9 * 128) + 4 * n1 * 128 * 4
    per_row = n1 * 128 * 4 * 12 + n1 * 1152 * 2
    bt = max(1, (budget - 2 * consts) // per_row)
    bt = min(bt, batch, 16)
    while batch % bt:
        bt -= 1
    return bt


@lru_cache(maxsize=None)
def _mxu4_call(n1: int, k: int, batch: int, in_planes: int, lazy: bool,
               inverse: bool, interpret: bool, b8: bool = False,
               opt_lz: int = 0, bc: bool = False):
    import os as _os

    bt = _pick_bt(batch, n1)
    grid = (k, batch // bt)
    a2 = 8 if b8 else 9
    bp = 8 if b8 else B_PLANES
    ax = in_planes if not inverse else a2
    ay = a2 if not inverse else in_planes

    forced_ck = _os.environ.get("TPUFHE_MXU4_CHUNK", "")
    if forced_ck:
        chunk = int(forced_ck)
        swpipe = _swpipe_on() and 0 < chunk < bt
    elif _swpipe_on() and bt >= 2:
        # elective split: _pick_bt budgeted the whole tile, and two
        # pipelined half-chunks cost ~the same live scratch as its
        # single-dot form
        chunk = (bt + 1) // 2
        swpipe = True
    else:
        chunk = 0
        swpipe = False

    kernel = partial(_mxu4_kernel, n1=n1, bt=bt, in_planes=in_planes,
                     lazy=lazy, inverse=inverse, b8=b8, opt_lz=opt_lz,
                     bc=bc, bc_interp=interpret, chunk=chunk,
                     swpipe=swpipe)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, 1, 2, n1, 128),
                         lambda li, bi, *_: (bi, li, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bp * n1, ax * n1),
                         lambda li, bi, *_: (li, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 2, n1, 128),
                         lambda li, bi, *_: (li, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ay * 128, bp * 128),
                         lambda li, bi, *_: (li, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, 1, 2, n1, 128),
                               lambda li, bi, *_: (bi, li, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    # TPUFHE_MXU4_ALIAS=1: alias the coefficient input buffer to the
    # output (same shape/layout; each grid cell reads exactly the block
    # it writes). Inside the chained bench program XLA can then update
    # the ciphertext in place instead of staging a fresh HBM buffer —
    # an A/B candidate against the 24% blocking-DMA share (ROOFLINE.md
    # lever 4). Input index 1 = x (index 0 is the scalar-prefetch scal).
    aliases = {1: 0} if _os.environ.get("TPUFHE_MXU4_ALIAS", "") == "1" \
        else {}
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, k, 2, n1, 128), jnp.uint32),
        grid_spec=grid_spec,
        interpret=interpret,
        input_output_aliases=aliases,
    )


def mxu4_pallas(x, consts, lazy=False, inverse=False, interpret=False,
                b8=False, bc=None):
    """Run the fused four-step kernel.

    x: (B, k, 2, n1, 128) uint32 lane-folded (B = flattened leading dims);
    consts: build_mxu4_consts(plan, inverse, in_planes, b8, bc) tuple.
    bc MUST match the flag the consts were built with (None = the
    _bc_on(b8) default, which rq.Context.dev.mxu4_consts also keys on).
    """
    m_sub, tw, m_lane, scal = consts
    batch, k, _, n1, _ = x.shape
    in_planes = (m_sub.shape[-1] // n1) if not inverse else (
        m_lane.shape[-2] // 128)
    call = _mxu4_call(n1, k, batch, in_planes, lazy, inverse, interpret,
                      b8, _opt_lz(scal), _bc_on(b8) if bc is None else bc)
    return call(scal, x, m_sub, tw, m_lane)
