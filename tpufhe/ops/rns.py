"""Residue Number System contexts and the fused HPS base-conversion/scaler.

Behavioral parity with fhe-math/src/rns/{mod.rs,scaler.rs} (Remark 3.2 of
eprint 2021/204): given residues x mod q (base `from`), compute
round(x * num / den) projected into base `to`, treating x as centered
(values above q/2 are negative). The runtime path is:

1. v = round(sum_i r_i * theta_garner_i / 2^shift)   — estimate of round(x/q)
2. w = round((sum_i ± r_i*theta_omega_i  -/+ v*theta_gamma) / 2^127)
3. per output modulus: y_j = sum_i r_i*omega_{j,i} - v*gamma_j + w  (mod q_j)

All precomputation happens host-side with exact Python ints; the device path
(``RnsScaler.scale``) is vectorized integer jnp on uint32 limbs: 224-bit and
256-bit accumulators are multiword tuples, Shoup products per output modulus
accumulate into 128-bit pairs exactly as the reference's u128 loop
(scaler.rs:316-351).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from math import gcd

import jax.numpy as jnp
import numpy as np

from tpufhe.ops import u64, zq
from tpufhe.ops.u64 import U32
from tpufhe.ops.zq import Modulus
from tpufhe.utils.misc import inverse
from tpufhe.errors import InvalidContext, TooFewValues

_M64 = (1 << 64) - 1
_M128 = (1 << 128) - 1


def _pallas_rns_on() -> tuple[bool, bool]:
    """(enabled, interpret) for the fused Pallas scaler kernel.

    TPUFHE_PALLAS_RNS=0 opts out, =1 forces (interpret mode off-TPU for
    parity tests). Default: on for TPU backends — the kernel keeps the
    digit-plane product tensor in VMEM instead of round-tripping hundreds
    of MB of int32 planes through HBM (see ops/pallas/rns_kernel.py).
    """
    flag = os.environ.get("TPUFHE_PALLAS_RNS", "")
    if flag == "0":
        return False, False
    try:
        import jax as _jax

        tpu = _jax.default_backend() == "tpu"
    except Exception:
        return False, False
    if flag == "1":
        return True, not tpu
    return tpu, False


def _mxu_rns_ok(k_in: int) -> bool:
    """Route wide-path scaling through the int8 digit-plane matmul.

    TPUFHE_MXU_RNS=0 opts out, =1 forces it on any backend (CPU parity
    tests). Default: TPU backends with k_in >= 5 — the int32 plane
    intermediates add HBM traffic, so the matmul only pays off when the
    per-coefficient contraction is wide enough (measured on v5e at
    N=8192: 7->3 scaling 5.34 -> 4.88 ms, but 3->4 slightly slower).
    """
    flag = os.environ.get("TPUFHE_MXU_RNS", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    if k_in < 5:
        return False
    try:
        import jax as _jax

        return _jax.default_backend() == "tpu"
    except Exception:
        return False


class RnsContext:
    """CRT context over pairwise-coprime moduli (rns/mod.rs:24-147)."""

    def __init__(self, moduli: list[int]):
        moduli = [int(m) for m in moduli]
        if not moduli:
            raise TooFewValues(0, 1)
        for i, mi in enumerate(moduli):
            for j, mj in enumerate(moduli):
                if i != j and gcd(mi, mj) != 1:
                    raise InvalidContext("The moduli are not coprime")
        self.moduli_u64 = moduli
        self.moduli = [Modulus(m) for m in moduli]
        self.product = 1
        for m in moduli:
            self.product *= m
        self.q_star = [self.product // m for m in moduli]
        self.q_tilde = [
            inverse(self.product // m, m) for m in moduli
        ]
        self.q_tilde_shoup = [
            q.shoup(t) for q, t in zip(self.moduli, self.q_tilde)
        ]
        self.garner = [s * t for s, t in zip(self.q_star, self.q_tilde)]

    def modulus(self) -> int:
        return self.product

    def project(self, a: int) -> list[int]:
        return [int(a) % m for m in self.moduli_u64]

    def lift(self, rests) -> int:
        acc = 0
        for r, g in zip(rests, self.garner):
            acc += g * int(r)
        return acc % self.product

    def get_garner(self, i: int) -> int | None:
        return self.garner[i] if i < len(self.garner) else None

    def __eq__(self, other):
        return isinstance(other, RnsContext) and self.moduli_u64 == other.moduli_u64

    def __hash__(self):
        return hash(tuple(self.moduli_u64))


@dataclass(frozen=True)
class ScalingFactor:
    """Rational scaling factor num/den (rns/scaler.rs:20-47)."""

    numerator: int
    denominator: int

    def __post_init__(self):
        assert self.denominator != 0

    @property
    def is_one(self) -> bool:
        return self.numerator == self.denominator

    @staticmethod
    def one() -> "ScalingFactor":
        return ScalingFactor(1, 1)


def _extract_projection_and_theta(
    ctx: RnsContext, inp: int, num: int, den: int, round_up: bool
):
    """gamma = round(num*inp/den) projected into ctx; theta = frac part scaled
    by 2^127 with a sign (rns/scaler.rs:183-229)."""
    gamma = (num * inp + (den >> 1)) // den
    projected = ctx.project(gamma)

    theta = (num * inp) % den
    theta_sign = False
    if den > 1:
        if den & 1 == 1:
            if theta > (den >> 1):
                theta_sign = True
                theta = den - theta
        else:
            if theta >= (den >> 1):
                theta_sign = True
                theta = den - theta
    if round_up:
        if theta_sign:
            theta = (theta << 127) // den
        else:
            theta = ((theta << 127) + den - 1) // den
    elif theta_sign:
        theta = ((theta << 127) + den - 1) // den
    else:
        theta = (theta << 127) // den
    return projected, theta & _M64, theta >> 64, theta_sign


def _u64_pair_col(vals) -> tuple:
    """list of ints -> (k, 1, 1) u64-pair NUMPY arrays (trace-safe constants,
    broadcastable against lane-folded (..., k, S, L) residues)."""
    arr = np.array([int(v) for v in vals], dtype=np.uint64).reshape(-1, 1, 1)
    return (
        (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (arr >> np.uint64(32)).astype(np.uint32),
    )


def _u128_limbs(x: int) -> list[np.uint32]:
    return [np.uint32((int(x) >> (32 * i)) & 0xFFFFFFFF) for i in range(4)]


class RnsScaler:
    """Fused RNS base conversion + rational scaling (rns/scaler.rs:52-352)."""

    def __init__(self, from_ctx: RnsContext, to_ctx: RnsContext, factor: ScalingFactor):
        self.from_ctx = from_ctx
        self.to_ctx = to_ctx
        self.factor = factor
        num, den = factor.numerator, factor.denominator

        gamma, tg_lo, tg_hi, tg_sign = _extract_projection_and_theta(
            to_ctx, from_ctx.product, num, den, False
        )
        self.gamma = gamma
        self.gamma_shoup = [q.shoup(g) for q, g in zip(to_ctx.moduli, gamma)]
        self.theta_gamma = tg_lo | (tg_hi << 64)
        self.theta_gamma_sign = tg_sign

        k_in = len(from_ctx.moduli)
        k_out = len(to_ctx.moduli)
        omegas = []
        self.theta_omega = []
        self.theta_omega_sign = []
        for g in from_ctx.garner:
            proj, to_lo, to_hi, to_sign = _extract_projection_and_theta(
                to_ctx, g, num, den, True
            )
            omegas.append(proj)
            self.theta_omega.append(to_lo | (to_hi << 64))
            self.theta_omega_sign.append(to_sign)
        # omega[j][i] = reduce(omegas[i][j]) per output modulus j
        self.omega = [
            [to_ctx.moduli[j].reduce(omegas[i][j]) for i in range(k_in)]
            for j in range(k_out)
        ]
        self.omega_shoup = [
            [to_ctx.moduli[j].shoup(self.omega[j][i]) for i in range(k_in)]
            for j in range(k_out)
        ]

        # shift so that sum of scaled theta_garner fits in 192 bits
        # (scaler.rs:130-142)
        def next_pow2_log(x: int) -> int:
            return (x - 1).bit_length() if x > 1 else 0

        self.theta_garner_shift = min(
            min(
                192 - 1 - next_pow2_log(qi * k_in)
                for qi in from_ctx.moduli_u64
            ),
            127,
        )
        self.theta_garner = [
            ((g << self.theta_garner_shift) + (from_ctx.product >> 1))
            // from_ctx.product
            for g in from_ctx.garner
        ]

        self._k_in = k_in
        self._k_out = k_out
        self._build_device_consts()

    # ------------------------------------------------------------------
    # Exact host implementation (golden reference; also used in tests)
    # ------------------------------------------------------------------

    def scale_host(self, rests, size: int | None = None, starting_index: int = 0):
        """Exact Python-int implementation mirroring scaler.rs:249-352."""
        k_in = self._k_in
        assert len(rests) == k_in
        size = self._k_out - starting_index if size is None else size

        sum_tg = 0
        for tg, r in zip(self.theta_garner, rests):
            sum_tg = (sum_tg + int(r) * tg) % (1 << 256)
        sum_tg >>= self.theta_garner_shift - 1
        # div_ceil(2) of the truncated u128
        s = sum_tg & _M128
        v = (s + 1) // 2 if s % 2 else s // 2

        w_sign = False
        w = 0
        if not self.factor.is_one:
            sum_to = 0
            for to, sign, r in zip(
                self.theta_omega, self.theta_omega_sign, rests
            ):
                prod = int(r) * to
                sum_to = (sum_to - prod if sign else sum_to + prod) % (1 << 256)
            v_tg = (v * self.theta_gamma) % (1 << 256)
            if self.theta_gamma_sign:
                sum_to = (sum_to + v_tg) % (1 << 256)
            else:
                sum_to = (sum_to - v_tg) % (1 << 256)
            w_sign = (sum_to >> 191) > 0
            if w_sign:
                w = ((((1 << 256) - 1 - sum_to) >> 126) & _M128) + 1
                w //= 2
            else:
                w = (sum_to >> 126) & _M128
                w = (w + 1) // 2 if w % 2 else w // 2

        out = []
        for idx in range(size):
            j = starting_index + idx
            qj = self.to_ctx.moduli[j]
            p = qj.p
            v_red = v % p
            # lazy_mul_shoup(v_red, gamma_j) exact value in [0, 2p)
            y = 2 * p - _lazy_shoup_host(v_red, self.gamma[j], self.gamma_shoup[j], p)
            if not self.factor.is_one:
                w_lazy = _lazy_barrett_host(w, p)
                y += (2 * p - w_lazy) if w_sign else w_lazy
            for i in range(self._k_in):
                y += _lazy_shoup_host(
                    int(rests[i]), self.omega[j][i], self.omega_shoup[j][i], p
                )
            out.append(y % p)
        return out

    # ------------------------------------------------------------------
    # Device implementation
    # ------------------------------------------------------------------

    def _build_device_consts(self):
        # numpy-only constants: safe to embed in any trace without leaking

        def digits(x: int, n: int = 8) -> list:
            return [(int(x) >> (16 * i)) & 0xFFFF for i in range(n)]

        c = {}
        c["tg_digits"] = [digits(tg) for tg in self.theta_garner]
        c["to_digits"] = [digits(to) for to in self.theta_omega]
        c["tgamma_digits"] = digits(self.theta_gamma)
        c["gamma"] = _u64_pair_col(self.gamma)  # (k_out, 1) pairs
        c["gamma_shoup"] = _u64_pair_col(self.gamma_shoup)
        k_out, k_in = self._k_out, self._k_in
        omega_cols = []
        for i in range(k_in):
            omega_cols.append(
                (
                    _u64_pair_col([self.omega[j][i] for j in range(k_out)]),
                    _u64_pair_col([self.omega_shoup[j][i] for j in range(k_out)]),
                )
            )
        c["omega_cols"] = omega_cols
        c["p"] = _u64_pair_col(self.to_ctx.moduli_u64)
        c["p2"] = _u64_pair_col([2 * m for m in self.to_ctx.moduli_u64])
        c["barrett_lo"] = _u64_pair_col([q.barrett_lo for q in self.to_ctx.moduli])
        c["barrett_hi"] = _u64_pair_col([q.barrett_hi for q in self.to_ctx.moduli])

        self._mxu_consts = None

        # single-lane (w30) constants when the target base is narrow
        self._narrow_ok = all(
            m < (1 << 30) for m in self.to_ctx.moduli_u64
        )
        if self._narrow_ok:
            def u32col(vals):
                return np.array([int(v) for v in vals],
                                dtype=np.uint32).reshape(-1, 1, 1)

            qs = self.to_ctx.moduli
            c["p32"] = u32col(self.to_ctx.moduli_u64)
            c["p232"] = u32col([2 * m for m in self.to_ctx.moduli_u64])
            c["mu0"] = u32col([q.mu64 & 0xFFFFFFFF for q in qs])
            c["mu1"] = u32col([q.mu64 >> 32 for q in qs])
            c["gamma32"] = u32col(self.gamma)
            c["gammas32"] = u32col(
                [q.shoup32(g) for q, g in zip(qs, self.gamma)])
            c["omega32"] = [
                (
                    u32col([self.omega[j][i] for j in range(k_out)]),
                    u32col([qs[j].shoup32(self.omega[j][i])
                            for j in range(k_out)]),
                )
                for i in range(k_in)
            ]
        self._device_consts = c

    # ------------------------------------------------------------------
    # MXU path: the three per-coefficient inner products over input limbs
    # (theta_garner for v, theta_omega for w, and the per-output-modulus
    # omega accumulation) are all contractions over (digit-plane, limb)
    # pairs with constant weights, so they fuse into ONE exact int8
    # digit-plane matmul (same machinery as tpufhe/ops/ntt_mxu.py):
    #   - rows 0..27:   S1_s = sum_{a,i} digit_{s-a}(tg_i) * r_plane[a,i]
    #                   with sum_s S1_s 2^{7s} == sum_i r_i * tg_i exactly;
    #   - rows 28..55:  same for theta_omega, signs folded into the weights
    #                   (signed int8), split pos/neg after the matmul;
    #   - last 9*k_out: C_b[j] = sum_{a,i} digit_b(omega_{j,i} 2^{7a} mod
    #                   p_j) * r_plane[a,i]; sum_b C_b 2^{7b} < 2^77 folds
    #                   with one Barrett u128 per output element.
    # ------------------------------------------------------------------

    _THETA_PLANES = 19  # thetas are < 2^127: ceil(127/7)

    def _build_mxu_consts(self):
        from tpufhe.ops.ntt_mxu import (
            DATA_PLANES, DIGIT_BITS, DIGIT_MASK, MAT_PLANES,
        )

        k_in, k_out = self._k_in, self._k_out
        tp = self._THETA_PLANES
        rows_t = DATA_PLANES + tp - 1

        def theta_block(vals, signs=None):
            w = np.zeros((rows_t, DATA_PLANES, k_in), dtype=np.int8)
            for i, x in enumerate(vals):
                sgn = -1 if (signs is not None and signs[i]) else 1
                for a in range(DATA_PLANES):
                    for b in range(tp):
                        d = (int(x) >> (DIGIT_BITS * b)) & DIGIT_MASK
                        w[a + b, a, i] = sgn * d
            return w

        blocks = [theta_block(self.theta_garner)]
        if not self.factor.is_one:
            blocks.append(
                theta_block(self.theta_omega, self.theta_omega_sign))
        w_om = np.zeros((MAT_PLANES, k_out, DATA_PLANES, k_in), dtype=np.int8)
        for j in range(k_out):
            p = self.to_ctx.moduli[j].p
            for i in range(k_in):
                for a in range(DATA_PLANES):
                    m = (self.omega[j][i] << (DIGIT_BITS * a)) % p
                    for b in range(MAT_PLANES):
                        w_om[b, j, a, i] = (m >> (DIGIT_BITS * b)) & DIGIT_MASK
        blocks.append(w_om.reshape(MAT_PLANES * k_out, DATA_PLANES, k_in))
        self._mxu_consts = {
            "w": np.concatenate(blocks, axis=0),
            "rows_t": rows_t,
        }

    @staticmethod
    def _fold_cols(planes, n_cols):
        """sum_s planes[..., s, :, :, :] * 2^{7s} as 16-bit column sums.

        planes: uint32 entries < 2^21, stacked on axis -4 (or -3 for the
        per-output omega fold). Exact while every column stays < 2^32.
        """
        zero = jnp.zeros_like(planes[0])
        cols = [zero] * n_cols
        for s, cb in enumerate(planes):
            d0 = cb & U32(0xFFFF)
            d1 = cb >> U32(16)
            qc, rc = divmod(7 * s, 16)
            cols[qc] = cols[qc] + (d0 << U32(rc))
            cols[qc + 1] = cols[qc + 1] + (d1 << U32(rc))
        return cols

    def scale(self, rests, starting_index: int = 0, size: int | None = None):
        """Device scaling.

        rests: (..., k_in, 2, S, L) uint32 lane-folded residues.
        Returns (..., size, 2, S, L) uint32 — residues in the `to` base
        starting at `starting_index`.
        """
        size = self._k_out - starting_index if size is None else size
        k_in = self._k_in
        assert rests.shape[-4] == k_in
        narrow = rests.shape[-3] == 1
        assert not narrow or self._narrow_ok
        c = self._device_consts

        # fused Pallas kernel (TPU default): residues are canonical
        # (< p < 2^62), so 9 digit planes cover every input
        if not narrow and size > 0:
            on, interp = _pallas_rns_on()
            st = int(os.environ.get("TPUFHE_RNS_ST", 8))
            if on and rests.shape[-2] % st == 0:
                from tpufhe.ops.pallas.rns_kernel import rns_scale_pallas

                return rns_scale_pallas(
                    rests, self, starting_index, size, in_planes=9,
                    interpret=interp,
                )

        use_mxu = not narrow and _mxu_rns_ok(k_in)
        C = rows_t = None
        if use_mxu:
            if self._mxu_consts is None:
                self._build_mxu_consts()
            from tpufhe.ops.ntt_mxu import _extract_planes

            planes = _extract_planes(
                rests[..., :, 0, :, :], rests[..., :, 1, :, :]
            )  # (..., k_in, A, S, L) int8
            # NOTE: emitting channels last ("...uvr", the conv-native
            # layout) to skip the 83-channel transpose copy measured
            # SLOWER end-to-end (2221 vs 2258 ops/s): the strided-lane
            # fold reads cost more than the copy. Keep "...ruv".
            C = jnp.einsum(
                "rai,...iauv->...ruv",
                jnp.asarray(self._mxu_consts["w"]), planes,
                preferred_element_type=jnp.int32,
            )
            rows_t = self._mxu_consts["rows_t"]
            zero = jnp.zeros(C.shape[:-3] + C.shape[-2:], dtype=jnp.uint32)
        elif narrow:
            r_lanes = [rests[..., i, 0, :, :] for i in range(k_in)]
            m16 = U32(0xFFFF)
            r_digits = [[r & m16, r >> U32(16)] for r in r_lanes]
            zero = jnp.zeros_like(r_lanes[0])
        else:
            r_pairs = [
                (rests[..., i, 0, :, :], rests[..., i, 1, :, :])
                for i in range(k_in)
            ]
            r_digits = [u64.digits16(r) for r in r_pairs]
            zero = jnp.zeros_like(r_pairs[0][0])

        # --- step 1: v = round(sum r_i * theta_garner_i / 2^shift) ---
        # carry-free 16-bit column accumulation (the sum is < 2^195, so the
        # exact column value equals the reference's mod-2^224 accumulator)
        if use_mxu:
            cols = self._fold_cols(
                [C[..., s, :, :].astype(jnp.uint32) for s in range(rows_t)],
                15,
            )
        else:
            cols = [zero] * 15
            for rd, tgd in zip(r_digits, c["tg_digits"]):
                u64.col_accumulate(cols, rd, tgd)
        acc = u64.cols_to_limbs(cols, 7)
        acc = u64.mp_shr(acc, self.theta_garner_shift - 1)
        s4 = acc[:4]  # truncate to u128 (as_u128)
        half = u64.mp_shr(s4, 1)
        v = u64.mp_add(half, (s4[0] & U32(1), zero, zero, zero))  # div_ceil(2)

        # --- step 2: w (only when the factor is not one) ---
        w_sign = None
        w_pairs = None
        if not self.factor.is_one:
            if use_mxu:
                s2 = [C[..., rows_t + s, :, :] for s in range(rows_t)]
                pos_cols = self._fold_cols(
                    [jnp.maximum(x, 0).astype(jnp.uint32) for x in s2], 17)
                neg_cols = self._fold_cols(
                    [jnp.maximum(-x, 0).astype(jnp.uint32) for x in s2], 17)
            else:
                pos_cols = [zero] * 17
                neg_cols = [zero] * 17
                for rd, tod, sign in zip(
                    r_digits, c["to_digits"], self.theta_omega_sign
                ):
                    u64.col_accumulate(
                        neg_cols if sign else pos_cols, rd, tod
                    )
            # v * theta_gamma: 128x128 -> 256 bits, same column scheme
            vd = u64.digits16((v[0], v[1])) + u64.digits16((v[2], v[3]))
            u64.col_accumulate(
                pos_cols if self.theta_gamma_sign else neg_cols,
                vd, c["tgamma_digits"],
            )
            pos = u64.cols_to_limbs(pos_cols, 8)
            neg = u64.cols_to_limbs(neg_cols, 8)
            s = u64.mp_sub(pos, neg)  # wrapping 256-bit, 2's complement
            w_sign = ((s[5] >> U32(31)) | s[6] | s[7]) != U32(0)
            # negative branch: w = (((~s) >> 126).as_u128() + 1) / 2
            s_not = tuple(~x for x in s)
            neg_shift = u64.mp_shr(s_not, 126)[:4]
            neg_p1 = u64.mp_add(neg_shift, (jnp.ones_like(zero), zero, zero, zero))
            w_neg = u64.mp_shr(neg_p1, 1)
            # positive branch: w = ((s >> 126).as_u128()).div_ceil(2)
            pos_shift = u64.mp_shr(s, 126)[:4]
            pos_half = u64.mp_shr(pos_shift, 1)
            w_pos = u64.mp_add(pos_half, (pos_shift[0] & U32(1), zero, zero, zero))
            w_pairs = tuple(
                jnp.where(w_sign, a, b) for a, b in zip(w_neg, w_pos)
            )

        # --- step 3: per-output-modulus accumulation ---
        # constants are (k_out, 1, 1); slice the active window
        sl = slice(starting_index, starting_index + size)

        if narrow:
            from tpufhe.ops import zq32

            p32 = c["p32"][sl]
            p232 = c["p232"][sl]
            mu0 = c["mu0"][sl]
            mu1 = c["mu1"][sl]

            def horner_mod(limbs):
                """Exact (sum limbs[i] 2^(32 i)) mod p, limb-broadcastable."""
                r = zq32.reduce_u64_32(
                    limbs[-1], jnp.zeros_like(limbs[-1]), mu0, mu1, p32)
                for lv in reversed(limbs[:-1]):
                    r = zq32.reduce_u64_32(lv, r, mu0, mu1, p32)
                return r

            v_bl = [l[..., None, :, :] for l in v]
            v_red = horner_mod(v_bl)
            t0 = zq32.lazy_mul_shoup32(
                v_red, c["gamma32"][sl], c["gammas32"][sl], p32)
            acc = (p232 - t0)
            acc = (acc, jnp.zeros_like(acc))
            if not self.factor.is_one:
                w_red = horner_mod([l[..., None, :, :] for l in w_pairs])
                ws = w_sign[..., None, :, :]
                term = jnp.where(ws, p232 - w_red, w_red)
                acc = u64.add64(acc, (term, jnp.zeros_like(term)))
            for i in range(k_in):
                om32, oms32 = c["omega32"][i]
                term = zq32.lazy_mul_shoup32(
                    r_lanes[i][..., None, :, :], om32[sl], oms32[sl], p32)
                acc = u64.add64(acc, (term, jnp.zeros_like(term)))
            # total < (k_in + 3) * 2p < 2^36: one exact reduction
            out = zq32.reduce_u64_32(acc[0], acc[1], mu0, mu1, p32)
            return out[..., None, :, :]

        def slc(pair):
            return pair[0][sl], pair[1][sl]

        p_s = slc(c["p"])
        p2_s = slc(c["p2"])
        bl_s = slc(c["barrett_lo"])
        bh_s = slc(c["barrett_hi"])

        # v mod q_j for each j: reduce_u128 of the 4-limb v, (..., 1, S, L)
        v_b = tuple(l[..., None, :, :] for l in v)
        v_red = zq.reduce_u128(v_b, bl_s, bh_s, p_s)  # (..., size, N) pairs

        t0 = zq.lazy_mul_shoup(v_red, slc(c["gamma"]), slc(c["gamma_shoup"]), p_s)
        y = u64.sub64(p2_s, t0)  # 2p - t, in [0, 2p]
        zero_y = jnp.zeros_like(y[0])
        acc128 = (y[0], y[1], zero_y, zero_y)

        if not self.factor.is_one:
            w_b = tuple(l[..., None, :, :] for l in w_pairs)
            w_lazy = zq.lazy_reduce_u128(w_b, bl_s, bh_s, p_s)  # < 2p
            neg_w = u64.sub64(p2_s, w_lazy)
            ws = w_sign[..., None, :, :]
            term = (
                jnp.where(ws, neg_w[0], w_lazy[0]),
                jnp.where(ws, neg_w[1], w_lazy[1]),
            )
            acc128 = _acc128_add64(acc128, term)

        if use_mxu:
            from tpufhe.ops.ntt_mxu import MAT_PLANES

            ofs = rows_t * (1 if self.factor.is_one else 2)
            k_out = self._k_out
            omega_planes = [
                C[..., ofs + b * k_out + starting_index
                     : ofs + b * k_out + starting_index + size, :, :]
                .astype(jnp.uint32)
                for b in range(MAT_PLANES)
            ]
            cols6 = self._fold_cols(omega_planes, 6)
            l0, l1, l2 = u64.cols_to_limbs(cols6, 3)
            o_term = zq.lazy_reduce_u128(
                (l0, l1, l2, jnp.zeros_like(l2)), bl_s, bh_s, p_s)
            acc128 = _acc128_add64(acc128, o_term)
        else:
            for i in range(k_in):
                om, oms = c["omega_cols"][i]
                r = (r_pairs[i][0][..., None, :, :],
                     r_pairs[i][1][..., None, :, :])
                term = zq.lazy_mul_shoup(r, slc(om), slc(oms), p_s)
                acc128 = _acc128_add64(acc128, term)

        out = zq.reduce_u128(acc128, bl_s, bh_s, p_s)
        return jnp.stack([out[0], out[1]], axis=-3)


def _acc128_add64(acc, term):
    """acc(4-limb) += term(u64 pair), carries propagated."""
    zero = jnp.zeros_like(acc[0])
    return u64.mp_add(acc, (term[0] + zero, term[1] + zero, zero, zero))


def _lazy_shoup_host(a: int, b: int, b_shoup: int, p: int) -> int:
    q = (a * b_shoup) >> 64
    return (a * b - q * p) & _M64


def _lazy_barrett_host(a: int, p: int) -> int:
    """Exact value of lazy_reduce_u128 (zq/mod.rs:693-707) for a < 2^128."""
    barrett = (1 << 128) // p
    b_lo, b_hi = barrett & _M64, barrett >> 64
    a_lo, a_hi = a & _M64, a >> 64
    q = ((a_lo * b_hi + a_hi * b_lo + ((a_lo * b_lo) >> 64)) >> 64) + a_hi * b_hi
    return (a - q * p) & _M64
