"""Four-step negacyclic NTT on the MXU via int8 digit-plane matmuls.

The size-N transform computed by `tpufhe.ops.ntt` is the linear map

    out[i] = sum_j x[j] * psi^{(2*rev_N(i)+1) * j}  (mod p)

(psi a primitive 2N-th root, rev_N the bit-reversal; same twiddle tables
and output order as fhe-math/src/ntt/native.rs, so this path is
interchangeable with the butterfly kernels per the bit-exactness
convention). On the lane-folded layout (n1, n2) = (N/128, 128) with
j = j1*n2 + j2 and i = i1*n2 + i2 it factors into two *matrix products*
and one elementwise twiddle (Bailey four-step, with the negacyclic
pre-twist psi^j and both bit-reversals absorbed into the constant
matrices):

    A = M1 @ X           M1[i1,j1] = psi^{n2 j1} * w^{n2 j1 rev(i1)}
    B = A * T            T [i1,j2] = psi^{j2}    * w^{rev(i1) j2}
    out = B @ M2         M2[j2,i2] =               w^{n1 j2 rev(i2)}

with w = psi^2. The inverse transform mirrors it (right-multiply,
twiddle, left-multiply) with inverse roots and N^{-1} folded in.

The matmuls run on the MXU as exact int8 x int8 -> int32 contractions:
the u64 data splits into DATA_PLANES unsigned 7-bit digit planes x_a, and
for each a the matrix constants are pre-multiplied mod p and re-digitized,
M_a^{(b)} = digit_b(M * 2^{7a} mod p), so a single dot contracting over
(a, j) yields C_b = sum_a M_a^{(b)} @ x_a with

    sum_b C_b * 2^{7b}  ==  M @ x  (mod p),   bounded by 2^82.

The VPU only extracts digits, folds the 9 C_b planes into 96-bit column
sums, and Barrett-reduces (one reduce_u128 per element per matmul) —
O(N) work per step instead of the butterfly path's O(N log N) Shoup
multiplies, with the O(N * (n1 + n2)) multiply volume moved to the MXU.

Pre-twist/bit-reversal absorption means no transposes, gathers, or
sublane-strided ops anywhere: both matmuls contract natively over the
sublane (n1) and lane (n2) axes of the standard lane-folded layout.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import jax.numpy as jnp
import numpy as np

from tpufhe.ops import u64, zq
from tpufhe.ops.ntt import NttOperator, bitrev_indices
from tpufhe.ops.u64 import U32

# Unsigned 7-bit digits keep int8 matmul operands exact (<= 127) while an
# int32 accumulator holds sum over (DATA_PLANES * 128) terms with headroom.
DIGIT_BITS = 7
DIGIT_MASK = (1 << DIGIT_BITS) - 1
DATA_PLANES = 10  # covers any u64 input (lazy values < 4p included)
MAT_PLANES = 9  # matrix residues are canonical (< p < 2^62)


def _pow_table(base: int, p: int, n: int) -> list:
    """[base^0, ..., base^{n-1}] mod p (exact ints)."""
    out = [1] * n
    for i in range(1, n):
        out[i] = out[i - 1] * base % p
    return out


def _digit_planes(mat: np.ndarray, p: int) -> np.ndarray:
    """(r, c) object array of ints < p -> (DATA_PLANES, MAT_PLANES, r, c) i8.

    Plane [a, b] holds digit b of (mat * 2^(7a) mod p).
    """
    r, c = mat.shape
    out = np.zeros((DATA_PLANES, MAT_PLANES, r, c), dtype=np.int8)
    for a in range(DATA_PLANES):
        ma = (mat * (1 << (DIGIT_BITS * a))) % p
        for b in range(MAT_PLANES):
            out[a, b] = ((ma >> (DIGIT_BITS * b)) & DIGIT_MASK).astype(np.int8)
    return out


def _pairs_np(mat: np.ndarray) -> np.ndarray:
    """(...,) object ints -> (2, ...) uint32 (lo, hi) planes."""
    lo = (mat & np.uint64(0xFFFFFFFF)).astype(np.uint64).astype(np.uint32)
    hi = (mat >> 32).astype(np.uint64).astype(np.uint32)
    return np.stack([lo, hi])


@dataclass(frozen=True)
class MxuNttPlan:
    """Digit-plane matrices for a stack of limbs at one (N, n2) split.

    All arrays lead with the limb axis k; matmul planes are int8, twiddles
    and scalar constants are (lo, hi) uint32 pairs baked into jit programs.
    """

    n: int
    n1: int
    n2: int
    # forward
    m1f: np.ndarray  # (k, A, B, n1, n1) i8
    tf: np.ndarray  # (k, 2, n1, n2) u32
    tf_shoup: np.ndarray
    m2f: np.ndarray  # (k, A, B, n2, n2) i8
    # backward (N^{-1} folded into m1b)
    m2b: np.ndarray  # (k, A, B, n2, n2) i8
    tb: np.ndarray
    tb_shoup: np.ndarray
    m1b: np.ndarray  # (k, A, B, n1, n1) i8
    # per-limb constants, shape (k,) pairs
    p_pair: tuple
    p2_pair: tuple
    barrett_lo: tuple
    barrett_hi: tuple
    # host-only: per-limb (m1f, m2f, m2b, m1b) object matrices + moduli,
    # kept so alternate digit encodings (balanced 8-bit planes) can be
    # built without recomputing the power tables
    raw: tuple = None

    @staticmethod
    def new(ops: list[NttOperator], n2: int = 128) -> "MxuNttPlan":
        n = ops[0].size
        assert n % n2 == 0 and all(op.size == n for op in ops)
        n1 = n // n2
        rev1 = bitrev_indices(n1)
        rev2 = bitrev_indices(n2)

        m1f, tf, tfs, m2f = [], [], [], []
        m2b, tb, tbs, m1b = [], [], [], []
        raw = []
        p_lo, p_hi, p2_lo, p2_hi, bl_lo, bl_hi, bh_lo, bh_hi = ([] for _ in range(8))
        for op in ops:
            p = op.q.p
            # psi = omegas[rev^{-1}(1)] = omegas[n/2] (rev is an involution).
            psi = int(op.omegas[n // 2])
            w = psi * psi % p
            ipsi = op.q.inv(psi)
            iw = op.q.inv(w)
            ninv = op.size_inv

            psi_pow = _pow_table(psi, p, n2 * (n1 - 1) + n2)
            wt = _pow_table(w, p, (n1 - 1) * (n2 - 1) + 1)
            ipsi_pow = _pow_table(ipsi, p, n2 * (n1 - 1) + n2)
            iwt = _pow_table(iw, p, (n1 - 1) * (n2 - 1) + 1)

            obj_m1f = np.empty((n1, n1), dtype=object)
            for i1 in range(n1):
                for j1 in range(n1):
                    obj_m1f[i1, j1] = psi_pow[n2 * j1] * pow(w, n2 * j1 * int(rev1[i1]), p) % p
            m1f.append(_digit_planes(obj_m1f, p))

            t = np.empty((n1, n2), dtype=object)
            for i1 in range(n1):
                k1 = int(rev1[i1])
                for j2 in range(n2):
                    t[i1, j2] = psi_pow[j2] * wt[k1 * j2] % p
            tf.append(_pairs_np(t))
            tfs.append(_pairs_np(np.vectorize(op.q.shoup, otypes=[object])(t)))

            obj_m2f = np.empty((n2, n2), dtype=object)
            for j2 in range(n2):
                for i2 in range(n2):
                    obj_m2f[j2, i2] = pow(w, n1 * j2 * int(rev2[i2]), p)
            m2f.append(_digit_planes(obj_m2f, p))

            obj_m2b = np.empty((n2, n2), dtype=object)
            for i2 in range(n2):
                k2 = int(rev2[i2])
                for j2 in range(n2):
                    obj_m2b[i2, j2] = pow(iw, n1 * k2 * j2, p)
            m2b.append(_digit_planes(obj_m2b, p))

            t = np.empty((n1, n2), dtype=object)
            for i1 in range(n1):
                k1 = int(rev1[i1])
                for j2 in range(n2):
                    t[i1, j2] = ipsi_pow[j2] * iwt[k1 * j2] % p
            tb.append(_pairs_np(t))
            tbs.append(_pairs_np(np.vectorize(op.q.shoup, otypes=[object])(t)))

            obj_m1b = np.empty((n1, n1), dtype=object)
            for j1 in range(n1):
                for i1 in range(n1):
                    obj_m1b[j1, i1] = ninv * ipsi_pow[n2 * j1] * pow(iw, n2 * j1 * int(rev1[i1]), p) % p
            m1b.append(_digit_planes(obj_m1b, p))
            raw.append((obj_m1f, obj_m2f, obj_m2b, obj_m1b, p))

            for lst, val in (
                (p_lo, p & 0xFFFFFFFF), (p_hi, p >> 32),
                (p2_lo, (2 * p) & 0xFFFFFFFF), (p2_hi, (2 * p) >> 32),
                (bl_lo, op.q.barrett_lo & 0xFFFFFFFF),
                (bl_hi, op.q.barrett_lo >> 32),
                (bh_lo, op.q.barrett_hi & 0xFFFFFFFF),
                (bh_hi, op.q.barrett_hi >> 32),
            ):
                lst.append(val)

        def pair(lo, hi):
            return (np.array(lo, dtype=np.uint32), np.array(hi, dtype=np.uint32))

        return MxuNttPlan(
            n=n, n1=n1, n2=n2,
            m1f=np.stack(m1f), tf=np.stack(tf), tf_shoup=np.stack(tfs),
            m2f=np.stack(m2f),
            m2b=np.stack(m2b), tb=np.stack(tb), tb_shoup=np.stack(tbs),
            m1b=np.stack(m1b),
            p_pair=pair(p_lo, p_hi), p2_pair=pair(p2_lo, p2_hi),
            barrett_lo=pair(bl_lo, bl_hi), barrett_hi=pair(bh_lo, bh_hi),
            raw=tuple(raw),
        )


# ---------------------------------------------------------------------------
# Device path
# ---------------------------------------------------------------------------


def _extract_planes(lo, hi, n_planes: int = DATA_PLANES):
    """(..., r, c) u32 pair -> (..., A, r, c) int8 unsigned 7-bit digits."""
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
    return jnp.stack(planes, axis=-3)


def _fold_reduce(c, plan, lazy):
    """(..., B, r, c) int32 planes -> u64 pair, value sum_b c_b 2^{7b} mod p.

    Folds the nine int32 planes into 16-bit column sums (each provably
    < 2^32), carry-fixes to a 96-bit value, and Barrett-reduces. Output
    < 2p when lazy else < p. The limb axis is expected at position -4 of
    the leading dims (..., k, B, r, c) matching the per-limb constants.
    """
    zero = jnp.zeros(c.shape[:-3] + c.shape[-2:], dtype=jnp.uint32)
    cols = [zero] * 6
    for b in range(MAT_PLANES):
        cb = c[..., b, :, :].astype(jnp.uint32)  # < 2^25
        d0 = cb & U32(0xFFFF)
        d1 = cb >> U32(16)  # < 2^9
        sh = DIGIT_BITS * b
        qc, rc = divmod(sh, 16)
        cols[qc] = cols[qc] + (d0 << U32(rc))
        cols[qc + 1] = cols[qc + 1] + (d1 << U32(rc))
    v0, v1, v2 = u64.cols_to_limbs(cols, 3)
    a128 = (v0, v1, v2, jnp.zeros_like(v2))
    idx = (...,) + (None,) * 2
    bl = (plan.barrett_lo[0][idx], plan.barrett_lo[1][idx])
    bh = (plan.barrett_hi[0][idx], plan.barrett_hi[1][idx])
    p = (plan.p_pair[0][idx], plan.p_pair[1][idx])
    r = zq.lazy_reduce_u128(a128, bl, bh, p)
    if not lazy:
        r = zq.reduce1(r, p)
    return r


def _matmul_left(planes, mat):
    """C_b = sum_{a,j} mat[k,a,b,i,j] * planes[...,k,a,j,m] (int32)."""
    return jnp.einsum("kabij,...kajm->...kbim", jnp.asarray(mat), planes,
                      preferred_element_type=jnp.int32)


def _matmul_right(planes, mat):
    """C_b = sum_{a,j} planes[...,k,a,u,j] * mat[k,a,b,j,v] (int32)."""
    return jnp.einsum("kabjv,...kauj->...kbuv", jnp.asarray(mat), planes,
                      preferred_element_type=jnp.int32)


def _twiddle(x, t, t_shoup, plan):
    idx = (...,) + (None,) * 2
    p = (plan.p_pair[0][idx], plan.p_pair[1][idx])
    tw = (jnp.asarray(t[:, 0]), jnp.asarray(t[:, 1]))
    tws = (jnp.asarray(t_shoup[:, 0]), jnp.asarray(t_shoup[:, 1]))
    return zq.lazy_mul_shoup(x, tw, tws, p)


def forward_mxu(a, plan: MxuNttPlan, lazy: bool = False,
                in_bits: int = 64):
    """Forward negacyclic NTT on (..., k, 2, n1, n2) lane-folded data.

    Any u64 input (including lazy < 4p values); output < p, or < 2p when
    `lazy` (within the < 4p contract of the butterfly path's lazy mode).
    """
    if _use_flat():
        return forward_mxu_flat(a, plan, lazy=lazy, in_bits=in_bits)
    A1 = _planes_for_bits(in_bits)
    A2 = 9  # twiddle outputs < 2p < 2^63
    lo, hi = a[..., 0, :, :], a[..., 1, :, :]
    x = _extract_planes(lo, hi, A1)
    s1 = _fold_reduce(_matmul_left(x, plan.m1f[:, :A1]), plan, lazy=True)
    s2 = _twiddle(s1, plan.tf, plan.tf_shoup, plan)
    x = _extract_planes(*s2, A2)
    out = _fold_reduce(_matmul_right(x, plan.m2f[:, :A2]), plan, lazy=lazy)
    return jnp.stack(out, axis=-3)


def backward_mxu(a, plan: MxuNttPlan, in_bits: int = 64):
    """Inverse negacyclic NTT (with N^{-1} fold) on lane-folded data.

    Any u64 input; output < p.
    """
    if _use_flat():
        return backward_mxu_flat(a, plan, in_bits=in_bits)
    A1 = _planes_for_bits(in_bits)
    A2 = 9  # twiddle outputs < 2p < 2^63
    lo, hi = a[..., 0, :, :], a[..., 1, :, :]
    x = _extract_planes(lo, hi, A1)
    s1 = _fold_reduce(_matmul_right(x, plan.m2b[:, :A1]), plan, lazy=True)
    s2 = _twiddle(s1, plan.tb, plan.tb_shoup, plan)
    x = _extract_planes(*s2, A2)
    out = _fold_reduce(_matmul_left(x, plan.m1b[:, :A2]), plan, lazy=False)
    return jnp.stack(out, axis=-3)


# ---------------------------------------------------------------------------
# Narrow (w30 single-lane) variant
# ---------------------------------------------------------------------------

# Residues < 2^30 live in ONE uint32 lane; any u32 value (lazy < 4p
# included) splits into 5 unsigned 7-bit digit planes, and matrix residues
# (< p < 2^30) need 5 planes too — a quarter of the wide path's 10x9 plane
# product, with the fold collapsing to a single u64 Barrett reduce
# (zq32.lazy_reduce_u64_32).
DATA_PLANES32 = 5
MAT_PLANES32 = 5


def _digit_planes32(mat: np.ndarray, p: int) -> np.ndarray:
    """(r, c) ints < p < 2^30 -> (5, 5, r, c) int8 digit planes."""
    r, c = mat.shape
    out = np.zeros((DATA_PLANES32, MAT_PLANES32, r, c), dtype=np.int8)
    for a in range(DATA_PLANES32):
        ma = (mat * (1 << (DIGIT_BITS * a))) % p
        for b in range(MAT_PLANES32):
            out[a, b] = ((ma >> (DIGIT_BITS * b)) & DIGIT_MASK).astype(np.int8)
    return out


@dataclass(frozen=True)
class MxuNttPlan32:
    """Digit-plane four-step plan for narrow (p < 2^30) limb stacks."""

    n: int
    n1: int
    n2: int
    m1f: np.ndarray  # (k, 5, 5, n1, n1) i8
    tf: np.ndarray  # (k, n1, n2) u32
    tf_shoup: np.ndarray
    m2f: np.ndarray
    m2b: np.ndarray
    tb: np.ndarray
    tb_shoup: np.ndarray
    m1b: np.ndarray
    p32: np.ndarray  # (k,) u32
    mu0: np.ndarray
    mu1: np.ndarray

    @staticmethod
    def new(ops: list[NttOperator], n2: int = 128) -> "MxuNttPlan32":
        n = ops[0].size
        assert n % n2 == 0 and all(op.size == n for op in ops)
        n1 = n // n2
        rev1 = bitrev_indices(n1)
        rev2 = bitrev_indices(n2)

        m1f, tf, tfs, m2f = [], [], [], []
        m2b, tb, tbs, m1b = [], [], [], []
        p32, mu0, mu1 = [], [], []
        for op in ops:
            p = op.q.p
            assert p < (1 << 30)
            psi = int(op.omegas[n // 2])
            w = psi * psi % p
            ipsi = op.q.inv(psi)
            iw = op.q.inv(w)
            ninv = op.size_inv

            psi_pow = _pow_table(psi, p, n2 * (n1 - 1) + n2)
            wt = _pow_table(w, p, (n1 - 1) * (n2 - 1) + 1)
            ipsi_pow = _pow_table(ipsi, p, n2 * (n1 - 1) + n2)
            iwt = _pow_table(iw, p, (n1 - 1) * (n2 - 1) + 1)

            obj = np.empty((n1, n1), dtype=object)
            for i1 in range(n1):
                for j1 in range(n1):
                    obj[i1, j1] = (
                        psi_pow[n2 * j1] * pow(w, n2 * j1 * int(rev1[i1]), p)
                        % p
                    )
            m1f.append(_digit_planes32(obj, p))

            t = np.empty((n1, n2), dtype=object)
            for i1 in range(n1):
                k1 = int(rev1[i1])
                for j2 in range(n2):
                    t[i1, j2] = psi_pow[j2] * wt[k1 * j2] % p
            tf.append(t.astype(np.uint64).astype(np.uint32))
            tfs.append(
                np.vectorize(op.q.shoup32, otypes=[object])(t)
                .astype(np.uint64).astype(np.uint32)
            )

            obj = np.empty((n2, n2), dtype=object)
            for j2 in range(n2):
                for i2 in range(n2):
                    obj[j2, i2] = pow(w, n1 * j2 * int(rev2[i2]), p)
            m2f.append(_digit_planes32(obj, p))

            obj = np.empty((n2, n2), dtype=object)
            for i2 in range(n2):
                k2 = int(rev2[i2])
                for j2 in range(n2):
                    obj[i2, j2] = pow(iw, n1 * k2 * j2, p)
            m2b.append(_digit_planes32(obj, p))

            t = np.empty((n1, n2), dtype=object)
            for i1 in range(n1):
                k1 = int(rev1[i1])
                for j2 in range(n2):
                    t[i1, j2] = ipsi_pow[j2] * iwt[k1 * j2] % p
            tb.append(t.astype(np.uint64).astype(np.uint32))
            tbs.append(
                np.vectorize(op.q.shoup32, otypes=[object])(t)
                .astype(np.uint64).astype(np.uint32)
            )

            obj = np.empty((n1, n1), dtype=object)
            for j1 in range(n1):
                for i1 in range(n1):
                    obj[j1, i1] = (
                        ninv
                        * ipsi_pow[n2 * j1]
                        * pow(iw, n2 * j1 * int(rev1[i1]), p)
                        % p
                    )
            m1b.append(_digit_planes32(obj, p))

            p32.append(p)
            mu0.append(op.q.mu64 & 0xFFFFFFFF)
            mu1.append(op.q.mu64 >> 32)

        return MxuNttPlan32(
            n=n, n1=n1, n2=n2,
            m1f=np.stack(m1f), tf=np.stack(tf), tf_shoup=np.stack(tfs),
            m2f=np.stack(m2f),
            m2b=np.stack(m2b), tb=np.stack(tb), tb_shoup=np.stack(tbs),
            m1b=np.stack(m1b),
            p32=np.array(p32, dtype=np.uint32),
            mu0=np.array(mu0, dtype=np.uint32),
            mu1=np.array(mu1, dtype=np.uint32),
        )


def _extract_planes32(x):
    """(..., r, c) u32 -> (..., 5, r, c) int8 unsigned 7-bit digits."""
    planes = [
        ((x >> U32(DIGIT_BITS * a)) & U32(DIGIT_MASK)).astype(jnp.int8)
        for a in range(DATA_PLANES32)
    ]
    return jnp.stack(planes, axis=-3)


def _fold_reduce32(c, plan: MxuNttPlan32, lazy: bool):
    """(..., k, 5, r, c) int32 planes -> u32, sum_b c_b 2^{7b} mod p.

    The weighted sum is < 2^52 (each plane < 5*128*127^2 < 2^24), well
    inside lazy_reduce_u64_32's < 2^60 contract. Output < 2p when lazy
    (consumers accept any u32), else canonical < p.
    """
    from tpufhe.ops import zq32

    zero = jnp.zeros(c.shape[:-3] + c.shape[-2:], dtype=jnp.uint32)
    cols = [zero] * 4
    for b in range(MAT_PLANES32):
        cb = c[..., b, :, :].astype(jnp.uint32)  # < 2^24
        d0 = cb & U32(0xFFFF)
        d1 = cb >> U32(16)
        sh = DIGIT_BITS * b
        qc, rc = divmod(sh, 16)
        cols[qc] = cols[qc] + (d0 << U32(rc))
        cols[qc + 1] = cols[qc + 1] + (d1 << U32(rc))
    lo, hi = u64.cols_to_limbs(cols, 2)
    idx = (...,) + (None,) * 2
    p = plan.p32[idx]
    r = zq32.lazy_reduce_u64_32(lo, hi, plan.mu0[idx], plan.mu1[idx], p)
    r = jnp.where(r >= 2 * p, r - 2 * p, r)  # < 4p -> < 2p
    if not lazy:
        r = zq32.reduce1_32(r, p)
    return r


def _matmul_left32(planes, mat):
    return jnp.einsum("kabij,...kajm->...kbim", jnp.asarray(mat), planes,
                      preferred_element_type=jnp.int32)


def _matmul_right32(planes, mat):
    return jnp.einsum("kabjv,...kauj->...kbuv", jnp.asarray(mat), planes,
                      preferred_element_type=jnp.int32)


def _twiddle32(x, t, t_shoup, plan: MxuNttPlan32):
    from tpufhe.ops import zq32

    idx = (...,) + (None,) * 2
    return zq32.lazy_mul_shoup32(
        x, jnp.asarray(t), jnp.asarray(t_shoup), plan.p32[idx]
    )


def forward_mxu32(a, plan: MxuNttPlan32, lazy: bool = False):
    """Forward negacyclic NTT on (..., k, n1, n2) single-lane u32 data.

    Any u32 input (lazy < 4p values included); output < p, or < 2p when
    `lazy`. Bit-identical to the w30 butterfly path for canonical
    outputs (same twiddles, same bit-reversed order)."""
    if _use_flat():
        return forward_mxu32_flat(a, plan, lazy=lazy)
    x = _extract_planes32(a)
    s1 = _fold_reduce32(_matmul_left32(x, plan.m1f), plan, lazy=True)
    s2 = _twiddle32(s1, plan.tf, plan.tf_shoup, plan)  # < 2p any input
    x = _extract_planes32(s2)
    return _fold_reduce32(_matmul_right32(x, plan.m2f), plan, lazy=lazy)


def backward_mxu32(a, plan: MxuNttPlan32):
    """Inverse negacyclic NTT (N^{-1} folded into m1b); output < p."""
    if _use_flat():
        return backward_mxu32_flat(a, plan)
    x = _extract_planes32(a)
    s1 = _fold_reduce32(_matmul_right32(x, plan.m2b), plan, lazy=True)
    s2 = _twiddle32(s1, plan.tb, plan.tb_shoup, plan)
    x = _extract_planes32(s2)
    return _fold_reduce32(_matmul_left32(x, plan.m1b), plan, lazy=False)


# ---------------------------------------------------------------------------
# Flat 2D matmul formulation (TPUFHE_MXU_FLAT)
# ---------------------------------------------------------------------------

# The einsum "kabij,...kajm->...kbim" carries two contracting dims (a, j)
# and two free result dims; on-device traces show XLA lowering it to
# convolution fusions plus layout-fixing copies. The flat form pre-reshapes
# the constant to a single (k, P, Q) matrix and feeds the data planes with
# the contraction axes adjacent, so each stage is ONE plain batched matmul:
#   left : out[.., k, B*i, m] = M1[k, B*i, A*j] @ x[.., k, A*j, m]
#   right: out[.., k, u, B*v] = x[.., k, u, A*j] @ M2[k, A*j, B*v]
# Bit-identical math (same digit planes, same fold); only the lowering
# changes. Toggle with TPUFHE_MXU_FLAT (default ON for TPU backends).

_FLAT_CACHE: dict = {}


def _flat_consts(plan):
    key = id(plan)
    if key not in _FLAT_CACHE:
        if isinstance(plan, MxuNttPlan32):
            A, B = DATA_PLANES32, MAT_PLANES32
        else:
            A, B = DATA_PLANES, MAT_PLANES
        k = plan.m1f.shape[0]
        n1, n2 = plan.n1, plan.n2
        # (k,A,B,i,j) -> (k, B*i, A*j)
        m1f = np.ascontiguousarray(
            plan.m1f.transpose(0, 2, 3, 1, 4).reshape(k, B * n1, A * n1))
        m1b = np.ascontiguousarray(
            plan.m1b.transpose(0, 2, 3, 1, 4).reshape(k, B * n1, A * n1))
        # (k,A,B,j,v) -> (k, A*j, B*v)
        m2f = np.ascontiguousarray(
            plan.m2f.transpose(0, 1, 3, 2, 4).reshape(k, A * n2, B * n2))
        m2b = np.ascontiguousarray(
            plan.m2b.transpose(0, 1, 3, 2, 4).reshape(k, A * n2, B * n2))
        _FLAT_CACHE[key] = (m1f, m1b, m2f, m2b)
    return _FLAT_CACHE[key]


# ---------------------------------------------------------------------------
# Balanced 8-bit digit planes (TPUFHE_MXU_B8)
# ---------------------------------------------------------------------------

# With unsigned 7-bit digits, canonical (< p < 2^62) values need 9 data and
# 9 matrix planes: 81 plane-product units per matmul stage. Balanced base-256
# digits in [-128, 127] still fit int8 while covering 8 bits per plane, so
# canonical values need only 8x8 = 64 units — 21% less MXU volume — and every
# extract/fold loop runs 8 planes instead of 9. Host-side the matrix digits
# are balanced exactly (borrow propagation; top digit of a < 2^62 residue
# stays <= 64). Runtime data digits use the offset identity
#   x = sum_a ((x + 0x80..80 >> 8a & 0xFF) - 128) * 256^a   for x < 2^63-2^56
# (one u64 add + per-plane subtract; no borrow logic on device). Signed
# products make the int32 fold planes signed; the fold adds a static offset
# K = 2^24 per plane and subtracts the closed-form constant
# K * 0x0101010101010101 once after the column fold — linearity makes the
# correction exact. Outputs are bit-identical to the 7-bit path for
# canonical (non-lazy) results since both fold to the same integer class
# mod p and reduce fully; lazy (< 2p) representatives may differ, which
# downstream Shoup/Barrett ops are representation-oblivious to.

B8_BITS = 8
B8_PLANES = 8  # data and matrix planes for values < 2^62
B8_FOLD_K = 1 << 24  # per-plane fold offset; |C| < 128*127*1024 < 2^24
B8_FOLD_CORR = B8_FOLD_K * 0x0101010101010101  # sum_b K * 2^(8b)


def _bal_digit_planes(obj: np.ndarray, p: int,
                      data_planes: int = B8_PLANES) -> np.ndarray:
    """(r, c) object ints < p -> (A, 8, r, c) int8 balanced 8-bit planes.

    planes[a, b] = balanced digit b of (obj * 2^(8a) mod p).
    """
    r, c = obj.shape
    out = np.zeros((data_planes, B8_PLANES, r, c), dtype=np.int8)
    for a in range(data_planes):
        ma = (obj * (1 << (B8_BITS * a))) % p
        digs = np.zeros((B8_PLANES, r, c), dtype=np.int64)
        for b in range(B8_PLANES):
            digs[b] = ((ma >> (B8_BITS * b)) & 0xFF).astype(np.int64)
        for b in range(B8_PLANES - 1):
            hi = digs[b] >= 128
            digs[b] -= 256 * hi
            digs[b + 1] += hi
        assert digs[B8_PLANES - 1].max(initial=0) <= 127
        out[a] = digs.astype(np.int8)
    return out


_B8_FLAT_CACHE: dict = {}


def _flat_consts_b8(plan):
    """Balanced-8 analogues of _flat_consts, built from plan.raw.

    Same flattened orientations:
      m1f/m1b: (k, B*n1, A*n1) with flat[b*n1+i, a*n1+j] = planes[a,b,i,j]
      m2f/m2b: (k, A*n2, B*n2) with flat[a*j, b*v]      = planes[a,b,j,v]
    """
    key = id(plan)
    if key not in _B8_FLAT_CACHE:
        assert plan.raw is not None, "plan built without raw matrices"
        A = B = B8_PLANES
        n1, n2 = plan.n1, plan.n2
        m1f, m1b, m2f, m2b = [], [], [], []
        for obj_m1f, obj_m2f, obj_m2b, obj_m1b, p in plan.raw:
            pl1f = _bal_digit_planes(obj_m1f, p)
            pl1b = _bal_digit_planes(obj_m1b, p)
            pl2f = _bal_digit_planes(obj_m2f, p)
            pl2b = _bal_digit_planes(obj_m2b, p)
            m1f.append(pl1f.transpose(1, 2, 0, 3).reshape(B * n1, A * n1))
            m1b.append(pl1b.transpose(1, 2, 0, 3).reshape(B * n1, A * n1))
            m2f.append(pl2f.transpose(0, 2, 1, 3).reshape(A * n2, B * n2))
            m2b.append(pl2b.transpose(0, 2, 1, 3).reshape(A * n2, B * n2))
        _B8_FLAT_CACHE[key] = tuple(
            np.ascontiguousarray(np.stack(m))
            for m in (m1f, m1b, m2f, m2b)
        )
    return _B8_FLAT_CACHE[key]


def _use_flat() -> bool:
    """Measured SLOWER than the einsum lowering on v5e (1596 vs 2239
    mul+relin/s at N=8192/L=3/B=64): XLA's conv-fusion lowering of the
    two-contraction einsum beats the pre-flattened single matmul. Kept
    as an opt-in (TPUFHE_MXU_FLAT=1) for future backends."""
    return os.environ.get("TPUFHE_MXU_FLAT", "") == "1"


def _extract_planes_at(pair_or_u32, n_planes, axis, wide=True):
    """Digit planes stacked at `axis` (-3 for left, -2 for right stage)."""
    if wide:
        lo, hi = pair_or_u32
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
    else:
        x = pair_or_u32
        planes = [
            ((x >> U32(DIGIT_BITS * a)) & U32(DIGIT_MASK)).astype(jnp.int8)
            for a in range(n_planes)
        ]
    return jnp.stack(planes, axis=axis)


def _mm_left_flat(x, mat, n_planes, B, n1):
    """x: planes (..., k, A, n1, m) -> (..., k, B, n1, m) int32."""
    xf = x.reshape(x.shape[:-3] + (n_planes * n1,) + x.shape[-1:])
    out = jnp.einsum("kpq,...kqm->...kpm", jnp.asarray(mat), xf,
                     preferred_element_type=jnp.int32)
    return out.reshape(out.shape[:-2] + (B, n1) + out.shape[-1:])


def _mm_right_flat(x, mat, n_planes, B, n2):
    """x: planes (..., k, u, A, n2) -> (..., k, u, B, n2) int32."""
    xf = x.reshape(x.shape[:-2] + (n_planes * n2,))
    out = jnp.einsum("kqp,...kuq->...kup", jnp.asarray(mat), xf,
                     preferred_element_type=jnp.int32)
    return out.reshape(out.shape[:-1] + (B, n2))


def _fold_reduce_axis(c, plane_axis, n_planes, consts, lazy, wide=True):
    """Fold int32 digit planes at `plane_axis` into residues mod p.

    consts: (bl, bh, p) pair-tuples for wide, (mu0, mu1, p32) for narrow.
    plane_axis is -3 (planes, r, c) or -2 (r, planes, c)."""
    take = ((lambda i: c[..., i, :, :]) if plane_axis == -3
            else (lambda i: c[..., :, i, :]))
    zero = jnp.zeros(take(0).shape, dtype=jnp.uint32)
    ncols = 6 if wide else 4
    cols = [zero] * ncols
    for b in range(n_planes):
        cb = take(b).astype(jnp.uint32)
        d0 = cb & U32(0xFFFF)
        d1 = cb >> U32(16)
        qc, rc = divmod(DIGIT_BITS * b, 16)
        cols[qc] = cols[qc] + (d0 << U32(rc))
        cols[qc + 1] = cols[qc + 1] + (d1 << U32(rc))
    if wide:
        bl, bh, p = consts
        v0, v1, v2 = u64.cols_to_limbs(cols, 3)
        r = zq.lazy_reduce_u128((v0, v1, v2, jnp.zeros_like(v2)), bl, bh, p)
        if not lazy:
            r = zq.reduce1(r, p)
        return r
    from tpufhe.ops import zq32

    mu0, mu1, p = consts
    lo, hi = u64.cols_to_limbs(cols, 2)
    r = zq32.lazy_reduce_u64_32(lo, hi, mu0, mu1, p)
    r = jnp.where(r >= 2 * p, r - 2 * p, r)
    if not lazy:
        r = zq32.reduce1_32(r, p)
    return r


def _wide_consts(plan):
    idx = (...,) + (None,) * 2
    bl = (plan.barrett_lo[0][idx], plan.barrett_lo[1][idx])
    bh = (plan.barrett_hi[0][idx], plan.barrett_hi[1][idx])
    p = (plan.p_pair[0][idx], plan.p_pair[1][idx])
    return bl, bh, p


def _narrow_consts(plan):
    idx = (...,) + (None,) * 2
    return plan.mu0[idx], plan.mu1[idx], plan.p32[idx]


def _planes_for_bits(bits: int) -> int:
    """Digit planes needed to cover values < 2^bits (7-bit digits)."""
    return -((-int(bits)) // DIGIT_BITS)


def forward_mxu_flat(a, plan: MxuNttPlan, lazy: bool = False,
                     in_bits: int = 64):
    """forward_mxu via the flat matmul lowering (bit-identical outputs).

    `in_bits` bounds the input values (64 = any u64; the pipeline's
    inputs are canonical < p (62) or lazy-reduced < 2p (63), both of
    which need only 9 data planes instead of 10 — a 10% MXU saving on
    the first matmul; the post-twiddle stage is always < 2p = 9 planes).
    """
    m1f, _, m2f, _ = _flat_consts(plan)
    A1 = _planes_for_bits(in_bits)
    A2 = 9  # twiddle outputs < 2p < 2^63
    B = MAT_PLANES
    consts = _wide_consts(plan)
    x = _extract_planes_at(_pairs_mx(a), A1, -3, wide=True)
    s1 = _fold_reduce_axis(
        _mm_left_flat(x, m1f[:, :, : A1 * plan.n1], A1, B, plan.n1), -3, B,
        consts, lazy=True)
    s2 = _twiddle(s1, plan.tf, plan.tf_shoup, plan)
    x = _extract_planes_at(s2, A2, -2, wide=True)
    out = _fold_reduce_axis(
        _mm_right_flat(x, m2f[:, : A2 * plan.n2], A2, B, plan.n2), -2, B,
        consts, lazy=lazy)
    return jnp.stack(out, axis=-3)


def backward_mxu_flat(a, plan: MxuNttPlan, in_bits: int = 64):
    _, m1b, _, m2b = _flat_consts(plan)
    A1 = _planes_for_bits(in_bits)
    A2 = 9  # twiddle outputs < 2p
    B = MAT_PLANES
    consts = _wide_consts(plan)
    x = _extract_planes_at(_pairs_mx(a), A1, -2, wide=True)
    s1 = _fold_reduce_axis(
        _mm_right_flat(x, m2b[:, : A1 * plan.n2], A1, B, plan.n2), -2, B,
        consts, lazy=True)
    s2 = _twiddle(s1, plan.tb, plan.tb_shoup, plan)
    x = _extract_planes_at(s2, A2, -3, wide=True)
    out = _fold_reduce_axis(
        _mm_left_flat(x, m1b[:, :, : A2 * plan.n1], A2, B, plan.n1), -3, B,
        consts, lazy=False)
    return jnp.stack(out, axis=-3)


def forward_mxu32_flat(a, plan: MxuNttPlan32, lazy: bool = False):
    m1f, _, m2f, _ = _flat_consts(plan)
    A, B = DATA_PLANES32, MAT_PLANES32
    consts = _narrow_consts(plan)
    x = _extract_planes_at(a, A, -3, wide=False)
    s1 = _fold_reduce_axis(_mm_left_flat(x, m1f, A, B, plan.n1), -3, B,
                           consts, lazy=True, wide=False)
    s2 = _twiddle32(s1, plan.tf, plan.tf_shoup, plan)
    x = _extract_planes_at(s2, A, -2, wide=False)
    return _fold_reduce_axis(_mm_right_flat(x, m2f, A, B, plan.n2), -2, B,
                             consts, lazy=lazy, wide=False)


def backward_mxu32_flat(a, plan: MxuNttPlan32):
    _, m1b, _, m2b = _flat_consts(plan)
    A, B = DATA_PLANES32, MAT_PLANES32
    consts = _narrow_consts(plan)
    x = _extract_planes_at(a, A, -2, wide=False)
    s1 = _fold_reduce_axis(_mm_right_flat(x, m2b, A, B, plan.n2), -2, B,
                           consts, lazy=True, wide=False)
    s2 = _twiddle32(s1, plan.tb, plan.tb_shoup, plan)
    x = _extract_planes_at(s2, A, -3, wide=False)
    return _fold_reduce_axis(_mm_left_flat(x, m1b, A, B, plan.n1), -3, B,
                             consts, lazy=False, wide=False)


def _pairs_mx(a):
    return (a[..., 0, :, :], a[..., 1, :, :])
