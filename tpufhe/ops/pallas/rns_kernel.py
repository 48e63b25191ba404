"""Fused HPS RNS scaler as a single Pallas TPU kernel.

The XLA-graph MXU path (ops/rns.py, scale() with use_mxu) materializes the
full digit-plane product tensor C — (..., R, S, L) int32 with R up to ~81
rows, i.e. hundreds of MB per mul+relin application — through HBM between
the einsum and its ~40 fold/multiprecision consumers. This kernel keeps
one (batch-rows, sublane-tile) cell entirely in VMEM:

    extract digit planes -> ONE int8 MXU dot -> 16-bit column folds
    -> 256-bit v/w fixed-point arithmetic -> per-output-modulus
    Barrett/Shoup accumulation -> write

The scaler contraction is pointwise in the coefficient, so the weight
matrix is delta-expanded over the sublane tile: W[(r, s1), (a, i, s2)] =
w[r, a, i] * delta(s1, s2) with s in [0, st). That wastes a factor ~st of
MXU MACs on structural zeros, but the scaler's matmul volume is ~2% of
the NTT's (ROOFLINE.md), so the absolute cost is negligible next to the
HBM round trips it removes — and every fold keeps the native (8, 128)
VPU tile shape, which a flat (1, N) arrangement would destroy.

Bit-exactness: identical digit planes, fold bounds, and Barrett/Shoup
formulas as ops/rns.py scale(); all-integer arithmetic, so results are
bit-identical to the scale_host oracle (tested in tests/test_rns_pallas.py).

Reference behavior: fhe.rs crates/fhe-math/src/rns/scaler.rs:249-352.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufhe.ops import u64, zq
from tpufhe.ops.ntt_mxu import DIGIT_BITS, DIGIT_MASK, MAT_PLANES
from tpufhe.ops.u64 import U32

_THETA_DIGITS16 = 8  # thetas < 2^128: eight 16-bit digits
_BC_THETA_DIGITS = 16  # thetas < 2^127: sixteen balanced base-256 digits
_BC_DATA_PLANES = 8  # canonical residues < 2^62: eight byte planes
_BC_FOLD_K = 1 << 21  # per-row fold offset; |c_row| <= 8*k_in*128^2 < 2^21


def _balanced_digits(x: int, n: int) -> tuple[list[int], int]:
    """n balanced base-256 digits (each in [-128, 127]) of a signed
    integer, plus the residual left after n digits (0 iff exact)."""
    x = int(x)
    digs = []
    for _ in range(n):
        d = ((x + 128) % 256) - 128
        digs.append(d)
        x = (x - d) >> 8
    return digs, x


def _balanced_base256(x: int, n: int) -> list[int]:
    """Exact balanced base-256 digits of a signed integer; asserts |x|
    is representable in n digits."""
    digs, rem = _balanced_digits(x, n)
    assert rem == 0, "value does not fit in balanced base-256 digits"
    return digs


def _fits_balanced(x: int, n: int) -> bool:
    """Whether a signed integer has an exact n-digit balanced base-256
    representation. NOT simply |x| < 2^(8n-1): the balanced range is
    asymmetric (sum of d_i*256^i with d_i in [-128, 127])."""
    return _balanced_digits(x, n)[1] == 0


def _bc_thetas_fit(scaler) -> bool:
    """Gate for the balanced-byte scaler constants: every theta consumed
    by build_scaler_consts_bc must fit _BC_THETA_DIGITS balanced digits
    (theta_omega enters negated when its sign flag is set). Thetas are
    ~2^127 fixed-point values, and the balanced 16-digit range tops out
    just UNDER 2^127 — some parameter sets (hit by the round-4 mbfv
    bench at N=4096/L=2) overflow it, so this is checked, not assumed;
    overflow falls back to the 7-bit kernel (bit-identical results)."""
    vals = list(scaler.theta_garner)
    if not scaler.factor.is_one:
        for x, sgn in zip(scaler.theta_omega, scaler.theta_omega_sign):
            vals.append(-int(x) if sgn else int(x))
    return all(_fits_balanced(v, _BC_THETA_DIGITS) for v in vals)


def build_scaler_consts_bc(scaler, starting_index: int, size: int, st: int):
    """Balanced-byte (bitcast-extract) variant of build_scaler_consts.

    Data planes are the balanced base-256 digits of each residue — the
    BYTES of (r + 0x80..80) sign-flipped, produced in-kernel by one
    pltpu.bitcast instead of ~9 shift/mask extractions — so the weight
    blocks are re-derived at 8-bit spacing:
      - theta rows: conv structure w[a+b, a, i] = balanced digit b of
        (+/-)theta_i, 16 theta digits x 8 data planes -> 23 fold rows
        (vs 27 at 7-bit spacing), signs absorbed INTO the digits so the
        step-2 pos/neg dual fold collapses to one signed fold;
      - omega rows: balanced digits of (omega_ji * 2^(8a) mod p)
        (ntt_mxu._bal_digit_planes), consumed by the same b8 fold as the
        NTT kernels (8 rows per output modulus vs 9).
    Column order matches the bitcast block layout: per input limb i,
    [lo bytes, hi bytes], rows 4*s + b within each half.
    Returns (w_delta, scal) with the same scal table as the 7-bit form.
    """
    from tpufhe.ops.ntt_mxu import B8_PLANES, _bal_digit_planes

    k_in = scaler._k_in
    A = _BC_DATA_PLANES
    TB = _BC_THETA_DIGITS
    rows_t = A + TB - 1  # 23

    def theta_rows(vals, signs=None):
        w = np.zeros((rows_t, A, k_in), dtype=np.int8)
        for i, x in enumerate(vals):
            v = -int(x) if (signs is not None and signs[i]) else int(x)
            digs = _balanced_base256(v, TB)
            for a in range(A):
                for b in range(TB):
                    w[a + b, a, i] = digs[b]
        return w

    blocks = [theta_rows(scaler.theta_garner)]
    if not scaler.factor.is_one:
        blocks.append(
            theta_rows(scaler.theta_omega, scaler.theta_omega_sign))
    w_om = np.zeros((B8_PLANES, size, A, k_in), dtype=np.int8)
    for jl in range(size):
        j = starting_index + jl
        p = scaler.to_ctx.moduli[j].p
        obj = np.array([[scaler.omega[j][i] for i in range(k_in)]],
                       dtype=object)  # (1, k_in)
        planes = _bal_digit_planes(obj, p)  # (A, 8, 1, k_in)
        for a in range(A):
            for b in range(B8_PLANES):
                w_om[b, jl, a, :] = planes[a, b, 0, :]
    blocks.append(w_om.reshape(B8_PLANES * size, A, k_in))
    w = np.concatenate(blocks, axis=0)  # (R, A, k_in)
    r_tot = w.shape[0]

    # delta-expansion + bitcast column order (i, half, s, byte)
    w_delta = np.zeros((r_tot, st, k_in, 2, st, 4), dtype=np.int8)
    for i in range(k_in):
        for a in range(A):
            half, b4 = divmod(a, 4)
            for s in range(st):
                w_delta[:, s, i, half, s, b4] = w[:, a, i]
    w_delta = w_delta.reshape(r_tot * st, k_in * 8 * st)

    def pair(x: int):
        return (int(x) & 0xFFFFFFFF, (int(x) >> 32) & 0xFFFFFFFF)

    scal = np.zeros((size, 12), dtype=np.uint32)
    for jl in range(size):
        j = starting_index + jl
        q = scaler.to_ctx.moduli[j]
        vals = (pair(q.p) + pair(q.barrett_lo) + pair(q.barrett_hi)
                + pair(scaler.gamma[j]) + pair(scaler.gamma_shoup[j])
                + pair(2 * q.p))
        scal[jl] = vals
    return np.ascontiguousarray(w_delta), scal


def build_scaler_consts(scaler, starting_index: int, size: int, st: int,
                        in_planes: int):
    """Delta-expanded weight matrix + per-output-modulus scalar table.

    Returns (w_delta, scal):
      w_delta (R*st, in_planes*k_in*st) int8 — rows are
        [theta_garner fold rows s=0..rows_t-1]
        [theta_omega fold rows, signed]          (only if factor != 1)
        [omega planes, b-major then j_local]     (MAT_PLANES * size rows)
      scal (size, 12) uint32 — per output modulus j:
        p, barrett_lo, barrett_hi, gamma, gamma_shoup, 2p as lo/hi pairs.
    """
    k_in = scaler._k_in
    tp = scaler._THETA_PLANES
    rows_t = in_planes + tp - 1

    def theta_rows(vals, signs=None):
        w = np.zeros((rows_t, in_planes, k_in), dtype=np.int8)
        for i, x in enumerate(vals):
            sgn = -1 if (signs is not None and signs[i]) else 1
            for a in range(in_planes):
                for b in range(tp):
                    d = (int(x) >> (DIGIT_BITS * b)) & DIGIT_MASK
                    w[a + b, a, i] = sgn * d
        return w

    blocks = [theta_rows(scaler.theta_garner)]
    if not scaler.factor.is_one:
        blocks.append(
            theta_rows(scaler.theta_omega, scaler.theta_omega_sign))
    w_om = np.zeros((MAT_PLANES, size, in_planes, k_in), dtype=np.int8)
    for jl in range(size):
        j = starting_index + jl
        p = scaler.to_ctx.moduli[j].p
        for i in range(k_in):
            for a in range(in_planes):
                m = (scaler.omega[j][i] << (DIGIT_BITS * a)) % p
                for b in range(MAT_PLANES):
                    w_om[b, jl, a, i] = (m >> (DIGIT_BITS * b)) & DIGIT_MASK
    blocks.append(w_om.reshape(MAT_PLANES * size, in_planes, k_in))
    w = np.concatenate(blocks, axis=0)  # (R, in_planes, k_in)
    r_tot = w.shape[0]

    # delta-expansion over the sublane tile
    w_delta = np.zeros((r_tot, st, in_planes * k_in, st), dtype=np.int8)
    flat = w.reshape(r_tot, in_planes * k_in)
    for s in range(st):
        w_delta[:, s, :, s] = flat
    w_delta = w_delta.reshape(r_tot * st, in_planes * k_in * st)

    def pair(x: int):
        return (int(x) & 0xFFFFFFFF, (int(x) >> 32) & 0xFFFFFFFF)

    scal = np.zeros((size, 12), dtype=np.uint32)
    for jl in range(size):
        j = starting_index + jl
        q = scaler.to_ctx.moduli[j]
        vals = (pair(q.p) + pair(q.barrett_lo) + pair(q.barrett_hi)
                + pair(scaler.gamma[j]) + pair(scaler.gamma_shoup[j])
                + pair(2 * q.p))
        scal[jl] = vals
    return np.ascontiguousarray(w_delta), scal


def _fold_cols(planes, n_cols):
    """Same 16-bit column fold as RnsScaler._fold_cols, on 2D tiles."""
    zero = jnp.zeros_like(planes[0])
    cols = [zero] * n_cols
    for s, cb in enumerate(planes):
        d0 = cb & U32(0xFFFF)
        d1 = cb >> U32(16)
        qc, rc = divmod(DIGIT_BITS * s, 16)
        cols[qc] = cols[qc] + (d0 << U32(rc))
        cols[qc + 1] = cols[qc + 1] + (d1 << U32(rc))
    return cols


def _scale_kernel(scal_ref, x_ref, w_ref, o_ref, *, st: int, bt: int,
                  k_in: int, size: int, in_planes: int, rows_t: int,
                  factor_one: bool, tg_shift: int, tgamma_digits: tuple,
                  tgamma_sign: bool, opt_lz: int = 0):
    # X: (in_planes*k_in*st, bt*128) int8 — (a, i, s) on sublanes to match
    # the delta-expanded weight's column order; batch rows on lanes.
    cols_x = []
    for r in range(bt):
        blocks = []
        for a in range(in_planes):
            sh = DIGIT_BITS * a
            for i in range(k_in):
                lo = x_ref[r, i, 0]  # (st, 128)
                hi = x_ref[r, i, 1]
                if sh < 32:
                    v = lo >> U32(sh)
                    if sh + DIGIT_BITS > 32:
                        v = v | (hi << U32(32 - sh))
                else:
                    v = hi >> U32(sh - 32)
                blocks.append((v & U32(DIGIT_MASK)).astype(jnp.int8))
        cols_x.append(jnp.concatenate(blocks, axis=0))
    x1 = jnp.concatenate(cols_x, axis=1)
    c = jax.lax.dot_general(
        w_ref[...], x1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (R*st, bt*128)

    def crow(r):
        return c[r * st : (r + 1) * st]  # (st, bt*128)

    zero = jnp.zeros((st, bt * 128), jnp.uint32)

    # --- step 1: v = round(sum r_i * theta_garner_i / 2^shift) ---
    cols = _fold_cols(
        [crow(s).astype(jnp.uint32) for s in range(rows_t)], 15)
    acc = u64.cols_to_limbs(cols, 7)
    acc = u64.mp_shr(acc, tg_shift - 1)
    s4 = acc[:4]
    half = u64.mp_shr(s4, 1)
    v = u64.mp_add(half, (s4[0] & U32(1), zero, zero, zero))

    # --- step 2: w (only when the factor is not one) ---
    w_sign = None
    w_pairs = None
    if not factor_one:
        s2 = [crow(rows_t + s) for s in range(rows_t)]
        pos_cols = _fold_cols(
            [jnp.maximum(x, 0).astype(jnp.uint32) for x in s2], 17)
        neg_cols = _fold_cols(
            [jnp.maximum(-x, 0).astype(jnp.uint32) for x in s2], 17)
        vd = u64.digits16((v[0], v[1])) + u64.digits16((v[2], v[3]))
        u64.col_accumulate(
            pos_cols if tgamma_sign else neg_cols, vd, list(tgamma_digits))
        pos = u64.cols_to_limbs(pos_cols, 8)
        neg = u64.cols_to_limbs(neg_cols, 8)
        s = u64.mp_sub(pos, neg)
        w_sign = ((s[5] >> U32(31)) | s[6] | s[7]) != U32(0)
        s_not = tuple(~x for x in s)
        neg_shift = u64.mp_shr(s_not, 126)[:4]
        neg_p1 = u64.mp_add(
            neg_shift, (jnp.ones_like(zero), zero, zero, zero))
        w_neg = u64.mp_shr(neg_p1, 1)
        pos_shift = u64.mp_shr(s, 126)[:4]
        pos_half = u64.mp_shr(pos_shift, 1)
        w_pos = u64.mp_add(
            pos_half, (pos_shift[0] & U32(1), zero, zero, zero))
        w_pairs = tuple(
            jnp.where(w_sign, a, b) for a, b in zip(w_neg, w_pos))

    # --- step 3: per-output-modulus accumulation (scalar consts) ---
    ofs = rows_t * (1 if factor_one else 2)
    for j in range(size):
        p = (scal_ref[j, 0], scal_ref[j, 1])
        bl = (scal_ref[j, 2], scal_ref[j, 3])
        bh = (scal_ref[j, 4], scal_ref[j, 5])
        gam = (scal_ref[j, 6], scal_ref[j, 7])
        gs = (scal_ref[j, 8], scal_ref[j, 9])
        p2 = (scal_ref[j, 10], scal_ref[j, 11])

        # acc128 = y + term + o_term < 6p < 2^65 << p^2, so the NFLlib
        # single-multiply reduce applies to it; v's only proven bound is
        # < 2^128 (it must stay on the generic 128-bit Barrett)
        def _red128(x):
            if opt_lz:
                return zq.reduce1(
                    zq.lazy_reduce_opt_u128(x, bl, opt_lz, p), p)
            return zq.reduce_u128(x, bl, bh, p)

        v_red = zq.reduce_u128(v, bl, bh, p)
        t0 = zq.lazy_mul_shoup(v_red, gam, gs, p)
        y = u64.sub64(p2, t0)
        acc128 = (y[0], y[1], zero, zero)
        if not factor_one:
            w_lazy = zq.lazy_reduce_u128(w_pairs, bl, bh, p)
            neg_w = u64.sub64(p2, w_lazy)
            term = (jnp.where(w_sign, neg_w[0], w_lazy[0]),
                    jnp.where(w_sign, neg_w[1], w_lazy[1]))
            acc128 = u64.mp_add(acc128, (term[0], term[1], zero, zero))
        omega_planes = [
            crow(ofs + b * size + j).astype(jnp.uint32)
            for b in range(MAT_PLANES)
        ]
        cols6 = _fold_cols(omega_planes, 6)
        l0, l1, l2 = u64.cols_to_limbs(cols6, 3)
        a96 = (l0, l1, l2, jnp.zeros_like(l2))
        if opt_lz:
            # 96-bit fold value << p^2: NFLlib single-multiply reduce
            o_term = zq.lazy_reduce_opt_u128(a96, bl, opt_lz, p)
        else:
            o_term = zq.lazy_reduce_u128(a96, bl, bh, p)
        acc128 = u64.mp_add(acc128, (o_term[0], o_term[1], zero, zero))
        out = _red128(acc128)
        for r in range(bt):
            o_ref[r, j, 0] = out[0][:, r * 128 : (r + 1) * 128]
            o_ref[r, j, 1] = out[1][:, r * 128 : (r + 1) * 128]


def _scale_kernel_bc(scal_ref, x_ref, w_ref, o_ref, *, st: int, bt: int,
                     k_in: int, size: int, rows_t: int, factor_one: bool,
                     tg_shift: int, tgamma_digits: tuple,
                     tgamma_sign: bool, opt_lz: int = 0,
                     bc_interp: bool = False):
    """Balanced-byte variant of _scale_kernel (build_scaler_consts_bc):
    one bitcast per (limb, half) replaces the 9-plane shift/mask extract,
    the theta folds run on 23 signed rows with a +K offset and one exact
    constant correction, and the omega fold is the NTT kernels' b8 fold.
    Bit-exact vs the 7-bit kernel and scale_host (all-integer, same
    values)."""
    cast = _bc_cast(bc_interp)

    cols_x = []
    for r in range(bt):
        blocks = []
        for i in range(k_in):
            lo, hi = _bc_bytes_cast(x_ref[r, i, 0], x_ref[r, i, 1], cast)
            blocks.append(lo)
            blocks.append(hi)
        cols_x.append(jnp.concatenate(blocks, axis=0))
    x1 = jnp.concatenate(cols_x, axis=1)  # (k_in*8*st, bt*128) i8
    c = jax.lax.dot_general(
        w_ref[...], x1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (R*st, bt*128)

    def crow(r):
        return c[r * st : (r + 1) * st]  # (st, bt*128) int32, signed

    outs = _scale_core_bc(
        crow, scal_ref, (st, bt * 128), size=size, rows_t=rows_t,
        factor_one=factor_one, tg_shift=tg_shift,
        tgamma_digits=tgamma_digits, tgamma_sign=tgamma_sign,
        opt_lz=opt_lz)
    for j, out in enumerate(outs):
        for r in range(bt):
            o_ref[r, j, 0] = out[0][:, r * 128 : (r + 1) * 128]
            o_ref[r, j, 1] = out[1][:, r * 128 : (r + 1) * 128]


def _bc_cast(bc_interp: bool):
    """int8 bitcast for the balanced-byte extract (interpret-safe form)."""
    if bc_interp:
        def cast(v):
            b = jax.lax.bitcast_convert_type(v, jnp.int8)  # (st, 128, 4)
            return jnp.transpose(b, (0, 2, 1)).reshape(-1, v.shape[-1])
    else:
        def cast(v):
            return pltpu.bitcast(v, jnp.int8)
    return cast


def _bc_bytes_cast(lo, hi, cast):
    """Balanced base-256 byte planes of a u64 pair, as two i8 blocks."""
    from tpufhe.ops.pallas.mxu_ntt_kernel import _bc_bytes

    blo, bhi = _bc_bytes(lo, hi)
    return cast(blo), cast(bhi)


def _scale_core_bc(crow, scal_ref, tile_shape, *, size: int, rows_t: int,
                   factor_one: bool, tg_shift: int, tgamma_digits: tuple,
                   tgamma_sign: bool, opt_lz: int = 0):
    """The v/w/per-output-modulus accumulation of the balanced-byte HPS
    scaler, operating on the int8 dot result via `crow(r)` -> (st, cols)
    int32 rows. Returns [(lo, hi)] per output modulus j (canonical).
    Shared (bit-identical arithmetic) by _scale_kernel_bc and the fused
    iNTT+scale kernel (ops/pallas/intt_scale_kernel.py)."""
    from tpufhe.ops.pallas.mxu_ntt_kernel import _fold_slices

    zero = jnp.zeros(tile_shape, jnp.uint32)
    kofs = jnp.int32(_BC_FOLD_K)

    def fold_signed(rows, n_cols):
        cols = [zero] * n_cols
        for s, cb in enumerate(rows):
            cbu = (cb + kofs).astype(jnp.uint32)
            d0 = cbu & U32(0xFFFF)
            d1 = cbu >> U32(16)
            qc, rc = divmod(8 * s, 16)
            cols[qc] = cols[qc] + (d0 << U32(rc))
            cols[qc + 1] = cols[qc + 1] + (d1 << U32(rc))
        return cols

    corr = _BC_FOLD_K * sum(1 << (8 * s) for s in range(rows_t))

    def corr_limbs(n):
        return tuple(U32((corr >> (32 * t)) & 0xFFFFFFFF) + zero
                     for t in range(n))

    # --- step 1: v = round(sum r_i * theta_garner_i / 2^shift) ---
    cols = fold_signed([crow(s) for s in range(rows_t)], 13)
    acc = u64.cols_to_limbs(cols, 7)
    acc = u64.mp_sub(acc, corr_limbs(7))  # exact: true sum >= 0
    acc = u64.mp_shr(acc, tg_shift - 1)
    s4 = acc[:4]
    half = u64.mp_shr(s4, 1)
    v = u64.mp_add(half, (s4[0] & U32(1), zero, zero, zero))

    # --- step 2: w (only when the factor is not one) ---
    w_sign = None
    w_pairs = None
    if not factor_one:
        cols_w = fold_signed(
            [crow(rows_t + s) for s in range(rows_t)], 17)
        neg_cols = [zero] * 17
        vd = u64.digits16((v[0], v[1])) + u64.digits16((v[2], v[3]))
        u64.col_accumulate(
            cols_w if tgamma_sign else neg_cols, vd, list(tgamma_digits))
        pos = u64.cols_to_limbs(cols_w, 8)
        neg = u64.cols_to_limbs(neg_cols, 8)
        s = u64.mp_sub(u64.mp_sub(pos, corr_limbs(8)), neg)
        w_sign = ((s[5] >> U32(31)) | s[6] | s[7]) != U32(0)
        s_not = tuple(~x for x in s)
        neg_shift = u64.mp_shr(s_not, 126)[:4]
        neg_p1 = u64.mp_add(
            neg_shift, (jnp.ones_like(zero), zero, zero, zero))
        w_neg = u64.mp_shr(neg_p1, 1)
        pos_shift = u64.mp_shr(s, 126)[:4]
        pos_half = u64.mp_shr(pos_shift, 1)
        w_pos = u64.mp_add(
            pos_half, (pos_shift[0] & U32(1), zero, zero, zero))
        w_pairs = tuple(
            jnp.where(w_sign, a, b) for a, b in zip(w_neg, w_pos))

    # --- step 3: per-output-modulus accumulation (scalar consts) ---
    ofs = rows_t * (1 if factor_one else 2)
    outs = []
    for j in range(size):
        p = (scal_ref[j, 0], scal_ref[j, 1])
        bl = (scal_ref[j, 2], scal_ref[j, 3])
        bh = (scal_ref[j, 4], scal_ref[j, 5])
        gam = (scal_ref[j, 6], scal_ref[j, 7])
        gs = (scal_ref[j, 8], scal_ref[j, 9])
        p2 = (scal_ref[j, 10], scal_ref[j, 11])

        def _red128(x):
            if opt_lz:
                return zq.reduce1(
                    zq.lazy_reduce_opt_u128(x, bl, opt_lz, p), p)
            return zq.reduce_u128(x, bl, bh, p)

        v_red = zq.reduce_u128(v, bl, bh, p)
        t0 = zq.lazy_mul_shoup(v_red, gam, gs, p)
        y = u64.sub64(p2, t0)
        acc128 = (y[0], y[1], zero, zero)
        if not factor_one:
            w_lazy = zq.lazy_reduce_u128(w_pairs, bl, bh, p)
            neg_w = u64.sub64(p2, w_lazy)
            term = (jnp.where(w_sign, neg_w[0], w_lazy[0]),
                    jnp.where(w_sign, neg_w[1], w_lazy[1]))
            acc128 = u64.mp_add(acc128, (term[0], term[1], zero, zero))
        # the omega fold is the NTT kernels' balanced-byte (b8) fold:
        # signed planes, per-plane K offset, congruent p<<17 makeup and
        # one closed-form constant subtraction; |T| <= 8*k_in*128^2 *
        # 2^(8*7) < p * 2^17 for any p >= 2^59 (gated in the caller)
        o_term = _fold_slices(
            lambda b: crow(ofs + b * size + j), (bl, bh, p),
            lazy=True, b8=True, opt_lz=opt_lz)
        acc128 = u64.mp_add(acc128, (o_term[0], o_term[1], zero, zero))
        outs.append(_red128(acc128))
    return outs


@lru_cache(maxsize=None)
def _scale_call(n_rows: int, n_sub: int, st: int, bt: int, k_in: int,
                size: int, in_planes: int, rows_t: int, r_tot: int,
                factor_one: bool, tg_shift: int, tgamma_digits: tuple,
                tgamma_sign: bool, interpret: bool, opt_lz: int = 0,
                bcs: bool = False):
    if bcs:
        kernel = partial(
            _scale_kernel_bc, st=st, bt=bt, k_in=k_in, size=size,
            rows_t=rows_t, factor_one=factor_one, tg_shift=tg_shift,
            tgamma_digits=tgamma_digits, tgamma_sign=tgamma_sign,
            opt_lz=opt_lz, bc_interp=interpret,
        )
        w_cols = k_in * 8 * st
    else:
        kernel = partial(
            _scale_kernel, st=st, bt=bt, k_in=k_in, size=size,
            in_planes=in_planes, rows_t=rows_t, factor_one=factor_one,
            tg_shift=tg_shift, tgamma_digits=tgamma_digits,
            tgamma_sign=tgamma_sign, opt_lz=opt_lz,
        )
        w_cols = in_planes * k_in * st
    grid = (n_rows // bt, n_sub // st)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, k_in, 2, st, 128),
                         lambda bi, si, *_: (bi, 0, 0, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_tot * st, w_cols),
                         lambda bi, si, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, size, 2, st, 128),
                               lambda bi, si, *_: (bi, 0, 0, si, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n_rows, size, 2, n_sub, 128), jnp.uint32),
        grid_spec=grid_spec,
        interpret=interpret,
    )


def rns_scale_pallas(x, scaler, starting_index: int, size: int,
                     in_planes: int = 10, interpret: bool = False):
    """Fused scaler over lane-folded residues.

    x: (..., k_in, 2, S, 128) uint32; returns (..., size, 2, S, 128).
    Callers must guarantee inputs < 2^(7*in_planes).
    """
    import os

    lead = x.shape[:-4]
    k_in, _, n_sub, lanes = x.shape[-4:]
    assert lanes == 128
    # balanced-byte (bitcast-extract) mode: requires canonical inputs
    # (< 2^62, i.e. the in_planes <= 9 contract), thetas < 2^127 (16
    # balanced digits), and large output moduli so the omega b8 fold's
    # p<<17 makeup covers the signed fold value (|T| < k_in * 2^74).
    bcs = (
        in_planes <= 9
        and os.environ.get("TPUFHE_BC_SCALER", "1") != "0"
        and all((q.p << 17) > (k_in << 74)
                for q in scaler.to_ctx.moduli[
                    starting_index : starting_index + size])
        and all(q.p < (1 << 62) for q in scaler.from_ctx.moduli)
        and _bc_thetas_fit(scaler)
    )
    key = (starting_index, size, in_planes, bcs)
    cache = getattr(scaler, "_pallas_consts", None)
    if cache is None:
        cache = scaler._pallas_consts = {}
    st = int(os.environ.get("TPUFHE_RNS_ST", 8))
    if cache.get("st") != st:
        cache.clear()
        cache["st"] = st
    if key not in cache:
        if bcs:
            cache[key] = build_scaler_consts_bc(
                scaler, starting_index, size, st)
        else:
            cache[key] = build_scaler_consts(
                scaler, starting_index, size, st, in_planes)
    w_delta, scal = cache[key]
    r_tot = w_delta.shape[0] // st

    n_rows = 1
    for d in lead:
        n_rows *= d
    xb = x.reshape((n_rows, k_in, 2, n_sub, 128))
    # measured on v5e (N=8192/L=3/B=64 headline): bt=2 -> 4041,
    # bt=4 -> 4079, bt=8 -> 4115 mul+relin/s
    bt = int(os.environ.get("TPUFHE_RNS_BT", 8))
    while n_rows % bt:
        bt -= 1
    if bcs:
        rows_t = _BC_DATA_PLANES + _BC_THETA_DIGITS - 1
    else:
        rows_t = in_planes + scaler._THETA_PLANES - 1
    tg_digits = tuple(
        (int(scaler.theta_gamma) >> (16 * i)) & 0xFFFF
        for i in range(_THETA_DIGITS16)
    )
    from tpufhe.ops.pallas.mxu_ntt_kernel import _opt_lz

    call = _scale_call(
        n_rows, n_sub, st, bt, k_in, size, in_planes, rows_t, r_tot,
        bool(scaler.factor.is_one), int(scaler.theta_garner_shift),
        tg_digits, bool(scaler.theta_gamma_sign), interpret,
        _opt_lz(scal), bcs,
    )
    out = call(scal, xb, w_delta)
    return out.reshape(lead + (size, 2, n_sub, 128))
