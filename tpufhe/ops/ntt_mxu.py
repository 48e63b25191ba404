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

    @staticmethod
    def new(ops: list[NttOperator], n2: int = 128) -> "MxuNttPlan":
        n = ops[0].size
        assert n % n2 == 0 and all(op.size == n for op in ops)
        n1 = n // n2
        rev1 = bitrev_indices(n1)
        rev2 = bitrev_indices(n2)

        m1f, tf, tfs, m2f = [], [], [], []
        m2b, tb, tbs, m1b = [], [], [], []
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

            obj = np.empty((n1, n1), dtype=object)
            for i1 in range(n1):
                for j1 in range(n1):
                    obj[i1, j1] = psi_pow[n2 * j1] * pow(w, n2 * j1 * int(rev1[i1]), p) % p
            m1f.append(_digit_planes(obj, p))

            t = np.empty((n1, n2), dtype=object)
            for i1 in range(n1):
                k1 = int(rev1[i1])
                for j2 in range(n2):
                    t[i1, j2] = psi_pow[j2] * wt[k1 * j2] % p
            tf.append(_pairs_np(t))
            tfs.append(_pairs_np(np.vectorize(op.q.shoup, otypes=[object])(t)))

            obj = np.empty((n2, n2), dtype=object)
            for j2 in range(n2):
                for i2 in range(n2):
                    obj[j2, i2] = pow(w, n1 * j2 * int(rev2[i2]), p)
            m2f.append(_digit_planes(obj, p))

            obj = np.empty((n2, n2), dtype=object)
            for i2 in range(n2):
                k2 = int(rev2[i2])
                for j2 in range(n2):
                    obj[i2, j2] = pow(iw, n1 * k2 * j2, p)
            m2b.append(_digit_planes(obj, p))

            t = np.empty((n1, n2), dtype=object)
            for i1 in range(n1):
                k1 = int(rev1[i1])
                for j2 in range(n2):
                    t[i1, j2] = ipsi_pow[j2] * iwt[k1 * j2] % p
            tb.append(_pairs_np(t))
            tbs.append(_pairs_np(np.vectorize(op.q.shoup, otypes=[object])(t)))

            obj = np.empty((n1, n1), dtype=object)
            for j1 in range(n1):
                for i1 in range(n1):
                    obj[j1, i1] = ninv * ipsi_pow[n2 * j1] * pow(iw, n2 * j1 * int(rev1[i1]), p) % p
            m1b.append(_digit_planes(obj, p))

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
        )


# ---------------------------------------------------------------------------
# Device path
# ---------------------------------------------------------------------------


def _extract_planes(lo, hi):
    """(..., r, c) u32 pair -> (..., A, r, c) int8 unsigned 7-bit digits."""
    planes = []
    for a in range(DATA_PLANES):
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


def forward_mxu(a, plan: MxuNttPlan, lazy: bool = False):
    """Forward negacyclic NTT on (..., k, 2, n1, n2) lane-folded data.

    Any u64 input (including lazy < 4p values); output < p, or < 2p when
    `lazy` (within the < 4p contract of the butterfly path's lazy mode).
    """
    lo, hi = a[..., 0, :, :], a[..., 1, :, :]
    x = _extract_planes(lo, hi)
    s1 = _fold_reduce(_matmul_left(x, plan.m1f), plan, lazy=True)
    s2 = _twiddle(s1, plan.tf, plan.tf_shoup, plan)
    x = _extract_planes(*s2)
    out = _fold_reduce(_matmul_right(x, plan.m2f), plan, lazy=lazy)
    return jnp.stack(out, axis=-3)


def backward_mxu(a, plan: MxuNttPlan):
    """Inverse negacyclic NTT (with N^{-1} fold) on lane-folded data.

    Any u64 input; output < p.
    """
    lo, hi = a[..., 0, :, :], a[..., 1, :, :]
    x = _extract_planes(lo, hi)
    s1 = _fold_reduce(_matmul_right(x, plan.m2b), plan, lazy=True)
    s2 = _twiddle(s1, plan.tb, plan.tb_shoup, plan)
    x = _extract_planes(*s2)
    out = _fold_reduce(_matmul_left(x, plan.m1b), plan, lazy=False)
    return jnp.stack(out, axis=-3)
