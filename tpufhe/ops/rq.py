"""Polynomials in R_q[x] = Z_q[x]/(x^N + 1) with RNS coefficients.

Behavioral parity with fhe-math/src/rq/ (Context, Poly with
PowerBasis/Ntt/NttShoup representations, Galois substitution, modulus
switch-down, Scaler/Switcher, dot products), redesigned TPU-first:

- Coefficients live in a single uint32 array shaped (..., k, 2, S, L) with
  (S, L) = (N/128, 128): leading batch dims give batch-of-ciphertexts
  vectorization for free, k is the RNS limb axis (shardable over a mesh),
  plane axis = (lo, hi) 32-bit halves, and the degree axis is lane-folded so
  the TPU tiles every elementwise fusion at full (8, 128) occupancy.
- Polys are immutable pytrees; representation is a static tag checked at
  trace time (the reference's typestate, rq/mod.rs:50-84).
- Per-context device programs are jit-compiled once and cached (twiddles and
  Barrett/Shoup constants embedded as XLA constants).
- There is no constant-time/variable-time split: XLA integer code is
  data-oblivious, so everything is constant-time. `lazy` polys (coefficients
  in [0, 4p), the key-switch decomposition trick, rq/mod.rs:518-540) carry a
  static flag.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, replace
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from tpufhe.ops import ntt as ntt_mod
from tpufhe.ops import u64, zq
from tpufhe.ops.rns import RnsContext, RnsScaler, ScalingFactor
from tpufhe.ops.u64 import U32
from tpufhe.ops.zq import Modulus
from tpufhe.utils.rngs import expand_seed
from tpufhe.utils.sampling import sample_vec_cbd
from tpufhe.errors import InvalidContext, InvalidGaloisElement, NoMoreContext

POWER_BASIS = "power"
NTT = "ntt"
NTT_SHOUP = "ntt_shoup"

# TPU vector registers tile the last two dims as (8 sublanes, 128 lanes).
# Coefficient arrays therefore fold the degree axis into (N/128, 128) so
# every elementwise fusion runs at full sublane occupancy; with the flat
# (..., 2, N) trailing shape XLA tiles T(2,128) and wastes 6/8 sublanes.
LANES = 128


def lane_shape(n: int) -> tuple:
    """Folded trailing shape (S, L) of the degree axis."""
    return (n // LANES, LANES) if n % LANES == 0 else (1, n)


def pack_u64(mat: np.ndarray) -> np.ndarray:
    """uint64 array (..., N) -> uint32 (..., 2, S, L) lane-folded."""
    mat = np.asarray(mat, dtype=np.uint64)
    lo = (mat & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (mat >> np.uint64(32)).astype(np.uint32)
    arr = np.stack([lo, hi], axis=-2)
    return arr.reshape(arr.shape[:-1] + lane_shape(arr.shape[-1]))


def unpack_u64(arr) -> np.ndarray:
    """uint32 (..., 2|1, S, L) -> uint64 (..., N)."""
    arr = np.asarray(arr)
    arr = arr.reshape(arr.shape[:-2] + (arr.shape[-2] * arr.shape[-1],))
    if arr.shape[-2] == 1:  # narrow single-plane
        return arr[..., 0, :].astype(np.uint64)
    return arr[..., 0, :].astype(np.uint64) | (
        arr[..., 1, :].astype(np.uint64) << np.uint64(32)
    )


def _pl(a):
    """Plane split: (..., 2, S, L) -> ((..., S, L) lo, (..., S, L) hi)."""
    return a[..., 0, :, :], a[..., 1, :, :]


def _st(r):
    """Plane join: ((..., S, L), (..., S, L)) -> (..., 2, S, L)."""
    return jnp.stack([r[0], r[1]], axis=-3)


def _pairs_col(vals) -> tuple:
    """ints -> (k,) u64-pair numpy arrays (trace-safe constants)."""
    arr = np.array([int(v) for v in vals], dtype=np.uint64)
    return (
        (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (arr >> np.uint64(32)).astype(np.uint32),
    )


_CONTEXT_CACHE: dict = {}


class Context:
    """Modulus-chain node: per-limb Modulus + NttOperators + RNS context.

    Mirrors rq/context.rs:9-156. Cached globally by (moduli, degree, narrow).

    `narrow=True` opts into the single-lane w30 representation (all moduli
    must be < 2^30): coefficients are (..., k, 1, S, L) single-plane uint32
    and the fast paths use ops/zq32 + the 32-bit NTT kernels. Wide and
    narrow contexts over the same moduli are distinct objects.
    """

    def __new__(cls, moduli, degree: int, narrow: bool = False):
        key = (tuple(int(m) for m in moduli), int(degree), bool(narrow))
        if key in _CONTEXT_CACHE:
            return _CONTEXT_CACHE[key]
        self = super().__new__(cls)
        _CONTEXT_CACHE[key] = self
        self._init(key[0], key[1], key[2])
        return self

    def _init(self, moduli, degree, narrow):
        if degree < 8 or (degree & (degree - 1)) != 0:
            raise InvalidContext(
                "The degree is not a power of two larger or equal to 8")
        if narrow and any(m >= (1 << 30) for m in moduli):
            raise InvalidContext("narrow contexts need all moduli < 2^30")
        self.narrow = narrow
        self.moduli = moduli
        self.degree = degree
        self.rns = RnsContext(list(moduli))
        self.q = [Modulus(m) for m in moduli]
        self.ops = []
        for qi in self.q:
            op = ntt_mod.NttOperator.new(qi, degree)
            if op is None:
                raise InvalidContext("Impossible to construct a Ntt operator")
            self.ops.append(op)
        self.bitrev = ntt_mod.bitrev_indices(degree)
        q_last = moduli[-1]
        self.inv_last_qi_mod_qj = []
        self.inv_last_qi_mod_qj_shoup = []
        for qi in self.q[:-1]:
            inv = qi.inv(qi.reduce(q_last))
            self.inv_last_qi_mod_qj.append(inv)
            self.inv_last_qi_mod_qj_shoup.append(qi.shoup(inv))
        self.next_context = (
            Context(moduli[:-1], degree, narrow) if len(moduli) >= 2 else None
        )
        self._dev = None

    # -- chain navigation (rq/context.rs:120-156) --

    def niterations_to(self, other: "Context") -> int:
        if other is self:
            return 0
        n = 0
        cur = self
        while cur.next_context is not None:
            n += 1
            cur = cur.next_context
            if cur is other:
                return n
        raise InvalidContext("Invalid context (not in chain)")

    def context_at_level(self, i: int) -> "Context":
        cur = self
        for _ in range(i):
            cur = cur.next_context
            if cur is None:
                raise NoMoreContext()
        return cur

    def modulus(self) -> int:
        return self.rns.product

    @property
    def k(self) -> int:
        return len(self.moduli)

    @property
    def dev(self):
        """Device constants (built lazily, numpy-backed)."""
        if self._dev is None:
            self._dev = _DeviceConsts(self)
        return self._dev

    def __repr__(self):
        return f"Context(moduli={self.moduli}, degree={self.degree})"

    def __hash__(self):
        return hash((self.moduli, self.degree))

    def __eq__(self, other):
        return self is other


class _DeviceConsts:
    """Per-context device constant tables."""

    def __init__(self, ctx: Context):
        k, n = ctx.k, ctx.degree
        self.p = _pairs_col(ctx.moduli)  # (k,) numpy pairs
        self.p2 = _pairs_col([2 * m for m in ctx.moduli])
        self.barrett_lo = _pairs_col([q.barrett_lo for q in ctx.q])
        self.barrett_hi = _pairs_col([q.barrett_hi for q in ctx.q])
        # flat (k, 2, n) twiddles for the XLA NTT path
        def _flatpack(v):
            return pack_u64(v).reshape(2, -1)

        self.omegas = np.stack([_flatpack(o.omegas) for o in ctx.ops])
        self.omegas_shoup = np.stack([_flatpack(o.omegas_shoup) for o in ctx.ops])
        self.zetas_inv = np.stack([_flatpack(o.zetas_inv) for o in ctx.ops])
        self.zetas_inv_shoup = np.stack(
            [_flatpack(o.zetas_inv_shoup) for o in ctx.ops]
        )
        self.ninv = _pairs_col([o.size_inv for o in ctx.ops])
        self.ninv_shoup = _pairs_col([o.size_inv_shoup for o in ctx.ops])
        self._ctx = ctx
        self._stage_tables = {}
        if k >= 2:
            self.inv_last = _pairs_col(ctx.inv_last_qi_mod_qj)
            self.inv_last_shoup = _pairs_col(ctx.inv_last_qi_mod_qj_shoup)
        if ctx.narrow:
            u32c = lambda v: np.array([int(x) for x in v], dtype=np.uint32)
            self.p32 = u32c(ctx.moduli)
            self.p232 = u32c([2 * m for m in ctx.moduli])
            self.mu0 = u32c([q.mu64 & 0xFFFFFFFF for q in ctx.q])
            self.mu1 = u32c([q.mu64 >> 32 for q in ctx.q])
            self.om32 = np.stack(
                [o.omegas.astype(np.uint32) for o in ctx.ops])
            self.oms32 = np.stack([
                u32c([o.q.shoup32(int(v)) for v in o.omegas])
                for o in ctx.ops])
            self.zi32 = np.stack(
                [o.zetas_inv.astype(np.uint32) for o in ctx.ops])
            self.zis32 = np.stack([
                u32c([o.q.shoup32(int(v)) for v in o.zetas_inv])
                for o in ctx.ops])
            self.ninv32 = u32c([o.size_inv for o in ctx.ops])
            self.ninvs32 = u32c(
                [o.q.shoup32(int(o.size_inv)) for o in ctx.ops])
            self._stage_tables32 = {}

    def stage_tables32(self, inverse: bool):
        """(k, logN, 2, S, L) lane-folded w30 stage tables."""
        if inverse not in self._stage_tables32:
            from tpufhe.ops.pallas.ntt32_kernel import build_stage_tables32

            t = np.stack(
                [build_stage_tables32(op, inverse) for op in self._ctx.ops]
            )
            self._stage_tables32[inverse] = t.reshape(
                t.shape[:-1] + lane_shape(t.shape[-1])
            )
        return self._stage_tables32[inverse]

    def limb_scalars32(self):
        if not hasattr(self, "_limb_scalars32"):
            from tpufhe.ops.pallas.ntt32_kernel import build_limb_scalars32

            self._limb_scalars32 = build_limb_scalars32(self._ctx.ops)
        return self._limb_scalars32

    def stage_tables(self, inverse: bool):
        """Per-lane stage twiddle tables for the Pallas NTT,
        (k, logN, 2, 2, S, L) lane-folded."""
        if inverse not in self._stage_tables:
            from tpufhe.ops.pallas.ntt_kernel import build_stage_tables

            t = np.stack(
                [build_stage_tables(op, inverse) for op in self._ctx.ops]
            )
            self._stage_tables[inverse] = t.reshape(
                t.shape[:-1] + lane_shape(t.shape[-1])
            )
        return self._stage_tables[inverse]

    def limb_scalars(self):
        """(k, 6) per-limb kernel scalars (p, n^{-1}, shoup(n^{-1}))."""
        if not hasattr(self, "_limb_scalars"):
            from tpufhe.ops.pallas.ntt_kernel import build_limb_scalars

            self._limb_scalars = build_limb_scalars(self._ctx.ops)
        return self._limb_scalars

    def mxu_plan(self, sl: slice):
        """Cached four-step MXU digit-plane plan for a limb slice."""
        key = (sl.start, sl.stop, sl.step)
        if not hasattr(self, "_mxu_plans"):
            self._mxu_plans = {}
        if key not in self._mxu_plans:
            from tpufhe.ops.ntt_mxu import MxuNttPlan

            self._mxu_plans[key] = MxuNttPlan.new(self._ctx.ops[sl])
        return self._mxu_plans[key]

    def mxu4_consts(self, sl: slice, inverse: bool, in_planes: int,
                    b8: bool = False):
        """Cached fused-kernel constants (pallas/mxu_ntt_kernel.py).
        The bitcast-extract layout flag (_bc_on) is part of the cache key:
        it permutes the matrices' contraction axes."""
        from tpufhe.ops.pallas.mxu_ntt_kernel import _bc_on, build_mxu4_consts

        bc = _bc_on(b8)
        key = (sl.start, sl.stop, sl.step, inverse, in_planes, b8, bc)
        if not hasattr(self, "_mxu4_consts"):
            self._mxu4_consts = {}
        if key not in self._mxu4_consts:
            self._mxu4_consts[key] = build_mxu4_consts(
                self.mxu_plan(sl), inverse, in_planes, b8, bc)
        return self._mxu4_consts[key]

    def mxu_plan32(self, sl: slice):
        """Cached narrow (w30) four-step MXU plan for a limb slice."""
        key = (sl.start, sl.stop, sl.step)
        if not hasattr(self, "_mxu_plans32"):
            self._mxu_plans32 = {}
        if key not in self._mxu_plans32:
            from tpufhe.ops.ntt_mxu import MxuNttPlan32

            self._mxu_plans32[key] = MxuNttPlan32.new(self._ctx.ops[sl])
        return self._mxu_plans32[key]


# ---------------------------------------------------------------------------
# jitted per-context kernels
# ---------------------------------------------------------------------------




def _pallas_ok(ctx: Context) -> bool:
    """Use the fused Pallas NTT on TPU backends for large-enough degrees."""
    import jax as _jax

    if ctx.degree < 256 or ctx.degree % 128 != 0:
        return False
    try:
        return _jax.default_backend() == "tpu"
    except Exception:
        return False


def _mxu32_ok(ctx: Context) -> bool:
    """Route narrow (w30) NTTs through the four-step MXU path.

    Same gating as _mxu_ok but for single-lane limbs: the narrow plan
    contracts 5x5 digit planes (vs 10x9 wide) and folds through one u64
    Barrett reduce, so the MXU carries ~72% less multiply volume than the
    wide plan per limb. TPUFHE_MXU_NTT32=0 opts out, =1 forces (CPU
    parity tests)."""
    flag = os.environ.get("TPUFHE_MXU_NTT32", "")
    if flag == "0":
        return False
    if not ctx.narrow or ctx.degree < 1024 or ctx.degree % 128 != 0:
        return False
    if flag == "1":
        return True
    try:
        import jax as _jax

        return _jax.default_backend() == "tpu"
    except Exception:
        return False


def _mxu_pallas_ok(ctx: Context) -> bool:
    """Fused four-step Pallas kernel (pallas/mxu_ntt_kernel.py): the whole
    transform (digit extract, both MXU dots, folds, twiddle) in VMEM.
    Measured on v5e at N=8192/L=3/B=64: 2280 -> 2498 mul+relin/s over
    the XLA einsum lowering. Default on TPU; TPUFHE_MXU_PALLAS=0 opts
    out, =1 forces (CPU interpret-mode testing uses the kernel API
    directly instead)."""
    flag = os.environ.get("TPUFHE_MXU_PALLAS", "")
    if flag == "0":
        return False
    if ctx.narrow or ctx.degree < 1024 or ctx.degree % 128 != 0:
        return False
    if flag == "1":
        return True
    try:
        import jax as _jax

        return _jax.default_backend() == "tpu"
    except Exception:
        return False


def _mxu_b8_on() -> bool:
    """Balanced 8-bit digit planes in the fused kernels (canonical inputs
    only; see ntt_mxu.py B8 notes): 8x8 instead of 9x9 plane products.
    Default ON since round 3 (v5e A/B at N=8192/L=3/B=64: 5545 -> 5616
    mul+relin/s alone, part of the winning 5777 combo); TPUFHE_MXU_B8=0
    reverts."""
    return os.environ.get("TPUFHE_MXU_B8", "1") != "0"


def _mxu_ok(ctx: Context) -> bool:
    """Route wide-limb NTTs through the four-step MXU path.

    Requires the lane-folded (N/128, 128) split with at least 8 sublanes.
    Measured 1.2-1.6x faster than the Pallas butterfly kernel on v5e at
    N=8192/k=7 (benches/mxu_ntt_bench.py). TPUFHE_MXU_NTT=0 opts out,
    =1 forces it on any backend (CPU parity tests).
    """
    flag = os.environ.get("TPUFHE_MXU_NTT", "")
    if flag == "0":
        return False
    if ctx.narrow or ctx.degree < 1024 or ctx.degree % 128 != 0:
        return False
    if flag == "1":
        return True
    try:
        import jax as _jax

        return _jax.default_backend() == "tpu"
    except Exception:
        return False


def _unfold(coeffs):
    """(..., 2, S, L) -> (..., 2, N) for the flat XLA NTT path."""
    return coeffs.reshape(coeffs.shape[:-2] + (-1,))


def _fold(coeffs):
    return coeffs.reshape(coeffs.shape[:-1] + lane_shape(coeffs.shape[-1]))


def ntt_forward_any(ctx: Context, coeffs, lazy: bool = False,
                    limb_slice: slice | None = None, in_bits: int = 64):
    """Forward NTT on (..., k, 2|1, S, L), Pallas-fused on TPU, XLA otherwise.

    limb_slice restricts to a contiguous subset of the context's limbs
    (the Scaler's partial forward on rows ncm..k_out).
    """
    d = ctx.dev
    sl = limb_slice if limb_slice is not None else slice(None)
    if ctx.narrow:
        if _mxu32_ok(ctx):
            from tpufhe.ops.ntt_mxu import forward_mxu32

            out = forward_mxu32(coeffs[..., 0, :, :], d.mxu_plan32(sl),
                                lazy=lazy)
            return out[..., None, :, :]
        if _pallas_ok(ctx):
            from tpufhe.ops.pallas.ntt32_kernel import ntt32_pallas

            lead = coeffs.shape[:-4]
            x = coeffs[..., 0, :, :].reshape((-1,) + coeffs.shape[-4:-3]
                                             + coeffs.shape[-2:])
            out = ntt32_pallas(
                x, d.stage_tables32(False)[sl], d.limb_scalars32()[sl],
                lazy=lazy,
            )
            return out.reshape(lead + out.shape[-3:-2] + (1,)
                               + out.shape[-2:])
        flat = _unfold(coeffs[..., 0, :, :])
        out = ntt_mod.forward32(flat, d.om32[sl], d.oms32[sl], d.p32[sl],
                                d.p232[sl], lazy=lazy)
        return _fold(out)[..., None, :, :]
    if _mxu_pallas_ok(ctx):
        from tpufhe.ops.pallas.mxu_ntt_kernel import mxu4_pallas

        b8 = in_bits <= 62 and _mxu_b8_on()
        if b8:
            in_planes = 8
        else:
            in_planes = -((-min(in_bits, 63)) // 7) if in_bits < 64 else 10
        consts = d.mxu4_consts(sl, False, in_planes, b8)
        lead = coeffs.shape[:-4]
        x = coeffs.reshape((-1,) + coeffs.shape[-4:])
        out = mxu4_pallas(x, consts, lazy=lazy, b8=b8)
        return out.reshape(lead + out.shape[-4:])
    if _mxu_ok(ctx):
        from tpufhe.ops.ntt_mxu import forward_mxu

        return forward_mxu(coeffs, d.mxu_plan(sl), lazy=lazy,
                           in_bits=in_bits)
    if _pallas_ok(ctx):
        from tpufhe.ops.pallas.ntt_kernel import ntt_pallas

        lead = coeffs.shape[:-4]
        x = coeffs.reshape((-1,) + coeffs.shape[-4:])
        out = ntt_pallas(
            x, ctx.dev.stage_tables(False)[sl], ctx.dev.limb_scalars()[sl],
            lazy=lazy,
        )
        return out.reshape(lead + out.shape[-4:])
    return _fold(ntt_mod.forward(
        _unfold(coeffs), d.omegas[sl], d.omegas_shoup[sl],
        (d.p[0][sl], d.p[1][sl]), (d.p2[0][sl], d.p2[1][sl]), lazy=lazy,
    ))


def ntt_backward_any(ctx: Context, coeffs, in_bits: int = 64):
    """Inverse NTT on (..., k, 2|1, S, L), Pallas-fused on TPU, XLA otherwise."""
    d = ctx.dev
    if ctx.narrow:
        if _mxu32_ok(ctx):
            from tpufhe.ops.ntt_mxu import backward_mxu32

            out = backward_mxu32(coeffs[..., 0, :, :],
                                 d.mxu_plan32(slice(None)))
            return out[..., None, :, :]
        if _pallas_ok(ctx):
            from tpufhe.ops.pallas.ntt32_kernel import ntt32_pallas

            lead = coeffs.shape[:-4]
            x = coeffs[..., 0, :, :].reshape((-1,) + coeffs.shape[-4:-3]
                                             + coeffs.shape[-2:])
            out = ntt32_pallas(
                x, d.stage_tables32(True), d.limb_scalars32(), inverse=True,
            )
            return out.reshape(lead + out.shape[-3:-2] + (1,)
                               + out.shape[-2:])
        flat = _unfold(coeffs[..., 0, :, :])
        out = ntt_mod.backward32(flat, d.zi32, d.zis32, d.ninv32, d.ninvs32,
                                 d.p32, d.p232)
        return _fold(out)[..., None, :, :]
    if _mxu_pallas_ok(ctx):
        from tpufhe.ops.pallas.mxu_ntt_kernel import mxu4_pallas

        b8 = in_bits <= 62 and _mxu_b8_on()
        if b8:
            in_planes = 8
        else:
            in_planes = -((-min(in_bits, 63)) // 7) if in_bits < 64 else 10
        consts = d.mxu4_consts(slice(None), True, in_planes, b8)
        lead = coeffs.shape[:-4]
        x = coeffs.reshape((-1,) + coeffs.shape[-4:])
        out = mxu4_pallas(x, consts, inverse=True, b8=b8)
        return out.reshape(lead + out.shape[-4:])
    if _mxu_ok(ctx):
        from tpufhe.ops.ntt_mxu import backward_mxu

        return backward_mxu(coeffs, d.mxu_plan(slice(None)),
                            in_bits=in_bits)
    if _pallas_ok(ctx):
        from tpufhe.ops.pallas.ntt_kernel import ntt_pallas

        lead = coeffs.shape[:-4]
        x = coeffs.reshape((-1,) + coeffs.shape[-4:])
        out = ntt_pallas(
            x, ctx.dev.stage_tables(True), ctx.dev.limb_scalars(),
            inverse=True,
        )
        return out.reshape(lead + out.shape[-4:])
    return _fold(ntt_mod.backward(
        _unfold(coeffs), d.zetas_inv, d.zetas_inv_shoup, d.ninv, d.ninv_shoup,
        d.p, d.p2,
    ))


@lru_cache(maxsize=None)
def _fwd_fn(ctx: Context, lazy: bool):
    d = ctx.dev

    @jax.jit
    def f(coeffs):
        return ntt_forward_any(ctx, coeffs, lazy=lazy)

    return f


@lru_cache(maxsize=None)
def _bwd_fn(ctx: Context):
    d = ctx.dev

    @jax.jit
    def f(coeffs):
        return ntt_backward_any(ctx, coeffs)

    return f


def _exp2(pair):
    """Per-limb (k,) constants -> (k, 1, 1), broadcastable vs (..., k, S, L)."""
    return pair[0][..., None, None], pair[1][..., None, None]


def _c32(v):
    """(k,) uint32 numpy -> (k, 1, 1) broadcastable vs (..., k, S, L)."""
    return v[..., None, None]


def _ln(a):
    """Narrow lane view: (..., k, 1, S, L) -> (..., k, S, L)."""
    return a[..., 0, :, :]


def _sn(x):
    """(..., k, S, L) -> (..., k, 1, S, L)."""
    return x[..., None, :, :]


@lru_cache(maxsize=None)
def _binop_fn(ctx: Context, op: str):
    d = ctx.dev
    if ctx.narrow:
        from tpufhe.ops import zq32

        p32 = _c32(d.p32)
        mu0, mu1 = _c32(d.mu0), _c32(d.mu1)

        @jax.jit
        def f32(a, b):
            la, lb = _ln(a), _ln(b)
            if op == "add":
                r = zq32.add_mod32(la, lb, p32)
            elif op == "sub":
                r = zq32.sub_mod32(la, lb, p32)
            elif op == "mul":
                r = zq32.mul_mod32(la, lb, mu0, mu1, p32)
            else:
                raise ValueError(op)
            return _sn(r)

        return f32
    p = _exp2(d.p)
    bl, bh = _exp2(d.barrett_lo), _exp2(d.barrett_hi)

    @jax.jit
    def f(a, b):
        pa = _pl(a)
        pb = _pl(b)
        if op == "add":
            r = zq.add_mod(pa, pb, p)
        elif op == "sub":
            r = zq.sub_mod(pa, pb, p)
        elif op == "mul":
            r = zq.mul_mod(pa, pb, bl, bh, p)
        else:
            raise ValueError(op)
        return _st(r)

    return f


@lru_cache(maxsize=None)
def _mul_shoup_fn(ctx: Context, reduce_from_lazy: bool):
    """a (possibly lazy) * b (NttShoup) -> fully reduced product."""
    d = ctx.dev
    if ctx.narrow:
        from tpufhe.ops import zq32

        p32 = _c32(d.p32)

        @jax.jit
        def f32(a, b, b_shoup):
            r = zq32.mul_shoup32(_ln(a), _ln(b), _ln(b_shoup), p32)
            return _sn(r)

        return f32
    p = _exp2(d.p)

    @jax.jit
    def f(a, b, b_shoup):
        pa = _pl(a)
        pb = _pl(b)
        pbs = _pl(b_shoup)
        r = zq.mul_shoup(pa, pb, pbs, p)
        return _st(r)

    return f


@lru_cache(maxsize=None)
def _neg_fn(ctx: Context):
    d = ctx.dev
    if ctx.narrow:
        from tpufhe.ops import zq32

        p32 = _c32(d.p32)

        @jax.jit
        def f32(a):
            return _sn(zq32.neg_mod32(_ln(a), p32))

        return f32
    p = _exp2(d.p)

    @jax.jit
    def f(a):
        pa = _pl(a)
        r = zq.neg_mod(pa, p)
        return _st(r)

    return f


@lru_cache(maxsize=None)
def _shoup_of_fn(ctx: Context):
    """Compute Shoup duplicates floor(a * 2^64 / p) for a < p on device.

    Let q, r be quotient/remainder of a*2^64 by p. The lazy Barrett reduction
    of the 128-bit value a*2^64 yields r' = a*2^64 - q'*p in [0, 2p) with
    q = q' + (r' >= p). Since q'*p = a*2^64 - r' and p is odd (NTT prime),
    q' mod 2^64 = (-r' mod 2^64) * p^{-1} mod 2^64; q < 2^64 because a < p.
    """
    d = ctx.dev
    from tpufhe.utils.misc import inverse

    if ctx.narrow:
        from tpufhe.ops import zq32

        p32 = _c32(d.p32)
        mu0, mu1 = _c32(d.mu0), _c32(d.mu1)
        p_inv32 = _c32(np.array(
            [inverse(m, 1 << 32) for m in ctx.moduli], dtype=np.uint32))

        @jax.jit
        def f32(a):
            la = _ln(a)
            zero = jnp.zeros_like(la)
            # r = (a * 2^32) mod p exactly; q = (a*2^32 - r)/p mod 2^32
            r = zq32.reduce_u64_32(zero, la, mu0, mu1, p32)
            q = (zero - r) * p_inv32
            return _sn(q)

        return f32

    p = _exp2(d.p)
    bl, bh = _exp2(d.barrett_lo), _exp2(d.barrett_hi)
    p_inv_pair = _exp2(_pairs_col([inverse(m, 1 << 64) for m in ctx.moduli]))

    @jax.jit
    def f(a):
        pa = _pl(a)
        zero = jnp.zeros_like(pa[0])
        a128 = (zero, zero, pa[0], pa[1])  # a * 2^64
        r_lazy = zq.lazy_reduce_u128(a128, bl, bh, p)
        neg_r = u64.sub64((zero, zero), r_lazy)
        q_prime = u64.mul64_lo(neg_r, p_inv_pair)
        corr = u64.ge64(r_lazy, p).astype(U32)
        q = u64.add64(q_prime, (corr, zero))
        return _st(q)

    return f


@lru_cache(maxsize=None)
def _scalar_mul_fn(ctx: Context):
    """Per-limb scalar Shoup multiply (zq scalar_mul_vec, zq/mod.rs:349-355)."""
    d = ctx.dev
    if ctx.narrow:
        from tpufhe.ops import zq32

        p32 = _c32(d.p32)

        @jax.jit
        def f32(a, s, s_shoup32):
            # s, s_shoup32: (k,) uint32 arrays
            r = zq32.mul_shoup32(_ln(a), _c32(s), _c32(s_shoup32), p32)
            return _sn(r)

        return f32
    p = _exp2(d.p)

    @jax.jit
    def f(a, s, s_shoup):
        # s, s_shoup: (k,) pairs expanded to (k, 1)
        pa = _pl(a)
        r = zq.mul_shoup(pa, _exp2(s), _exp2(s_shoup), p)
        return _st(r)

    return f


@lru_cache(maxsize=None)
def _reduce_u64_fn(ctx: Context):
    """Reduce arbitrary u64 values mod each q_i (for conversions)."""
    d = ctx.dev
    p = _exp2(d.p)
    bl, bh = _exp2(d.barrett_lo), _exp2(d.barrett_hi)

    @jax.jit
    def f(a):
        pa = _pl(a)
        r = zq.reduce_u64(pa, bl, bh, p)
        out = _st(r)
        # narrow contexts: residues < p < 2^30 live entirely in the lo plane
        return out[..., :1, :, :] if ctx.narrow else out

    return f


@lru_cache(maxsize=None)
def _reduce_i64_fn(ctx: Context):
    """Reduce signed 64-bit values (two's complement pairs) mod each q_i."""
    d = ctx.dev
    p = _exp2(d.p)
    bl, bh = _exp2(d.barrett_lo), _exp2(d.barrett_hi)

    @jax.jit
    def f(a):
        pa = _pl(a)
        out = _st(zq.reduce_i64(pa[0], pa[1], bl, bh, p))
        return out[..., :1, :, :] if ctx.narrow else out

    return f


@lru_cache(maxsize=None)
def _lazy_reduce_fn(ctx: Context):
    """Lazy-reduce arbitrary u64 values into [0, 2p) per limb."""
    d = ctx.dev
    p = _exp2(d.p)
    bl, bh = _exp2(d.barrett_lo), _exp2(d.barrett_hi)

    @jax.jit
    def f(a):
        pa = _pl(a)
        r = zq.lazy_reduce(pa, bl, bh, p)
        return _st(r)

    return f


@lru_cache(maxsize=None)
def _switch_down_fn(ctx: Context):
    """Modulus switch-down: divide+round by q_last, drop the last limb.

    Algorithm 2 of eprint 2018/931 exactly as rq/mod.rs:390-449.
    """
    assert ctx.k >= 2
    d = ctx.dev
    q_last = ctx.moduli[-1]
    q_last_div_2 = q_last // 2
    km1 = ctx.k - 1
    if ctx.narrow:
        from tpufhe.ops import zq32

        p32 = _c32(d.p32[:km1])
        mu0, mu1 = _c32(d.mu0[:km1]), _c32(d.mu1[:km1])
        u32c = lambda v: np.array([int(x) for x in v], dtype=np.uint32)
        inv32 = _c32(u32c(ctx.inv_last_qi_mod_qj))
        invs32 = _c32(u32c([
            q.shoup32(v) for q, v in zip(ctx.q[:-1], ctx.inv_last_qi_mod_qj)
        ]))
        qld2_mod32 = _c32(u32c(
            [q.p - (q_last_div_2 % q.p) for q in ctx.q[:-1]]))
        p3_32 = _c32(u32c([3 * q.p for q in ctx.q[:-1]]))
        qlast_c = np.uint32(q_last)
        qld2_c = np.uint32(q_last_div_2)

        @jax.jit
        def f32(coeffs):
            rest = _ln(coeffs[..., :km1, :, :, :])
            last = _ln(coeffs[..., km1:, :, :, :])
            # add (q_last)/2 for rounding (still < q_last < 2^30)
            last = zq32.add_mod32(last, qld2_c, qlast_c)
            # exact residue mod each remaining q_i (any representative of
            # x_last works: the Shoup product below fully reduces)
            tmp = zq32.reduce_u64_32(last, jnp.zeros_like(last), mu0, mu1,
                                     p32)
            tmp = tmp + qld2_mod32          # < 2 q_i
            x = rest + (p3_32 - tmp)        # < 4 q_i < 2^32
            x = zq32.mul_shoup32(x, inv32, invs32, p32)
            return _sn(x)

        return f32
    # per remaining limb constants
    p_rest = (d.p[0][:km1], d.p[1][:km1])
    p_rest2 = _exp2(p_rest)
    bl = (_exp2((d.barrett_lo[0][:km1], d.barrett_lo[1][:km1])))
    bh = (_exp2((d.barrett_hi[0][:km1], d.barrett_hi[1][:km1])))
    inv = _exp2(d.inv_last)
    inv_shoup = _exp2(d.inv_last_shoup)
    # q_i - reduce(q_last/2, q_i) per limb
    qld2_mod = _pairs_col(
        [q.p - (q_last_div_2 % q.p) for q in ctx.q[:-1]]
    )
    qld2_mod = _exp2(qld2_mod)
    p3 = _pairs_col([3 * q.p for q in ctx.q[:-1]])
    p3 = _exp2(p3)
    q_last_pair = _exp2(_pairs_col([q_last]))
    qld2_pair = _exp2(_pairs_col([q_last_div_2]))

    @jax.jit
    def f(coeffs):
        rest = coeffs[..., :km1, :, :, :]
        last = coeffs[..., km1:, :, :, :]
        p_last = _pl(last)
        # add (q_last)/2 for rounding
        p_last = zq.add_mod(p_last, qld2_pair, q_last_pair)
        # per remaining limb: tmp = lazy_reduce(x_last) + (q_i - q_last/2 mod q_i)
        tmp = zq.lazy_reduce(p_last, bl, bh, p_rest2)  # broadcast (k-1, S, L)
        tmp = u64.add64(tmp, qld2_mod)  # < 3 q_i
        x = _pl(rest)
        x = u64.add64(x, u64.sub64(p3, tmp))  # < 4 q_i
        x = zq.mul_shoup(x, inv, inv_shoup, p_rest2)
        return _st(x)

    return f


@lru_cache(maxsize=None)
def _lazy_const_ntt_fn(ctx: Context):
    """Lift one row of u64 decomposition digits into a lazy-NTT poly.

    Mirrors create_constant_ntt_polynomial_with_lazy_coefficients
    (rq/mod.rs:518-540): broadcast digits to all limbs, lazy Barrett to
    [0, 2p), lazy forward NTT to [0, 4p).
    """
    d = ctx.dev
    if ctx.narrow:
        from tpufhe.ops import zq32

        p32 = _c32(d.p32)
        mu0, mu1 = _c32(d.mu0), _c32(d.mu1)

        @jax.jit
        def f32(digits):
            # digits: (..., 1, S, L) -> broadcast over the limb axis; exact
            # residues are within the lazy-NTT input bound (< p <= 4p)
            la = digits[..., 0, :, :][..., None, :, :]
            r = zq32.reduce_u64_32(la, jnp.zeros_like(la), mu0, mu1, p32)
            return ntt_forward_any(ctx, _sn(r), lazy=True)

        return f32
    p = _exp2(d.p)
    bl, bh = _exp2(d.barrett_lo), _exp2(d.barrett_hi)

    @jax.jit
    def f(digits):
        # digits: (..., 2, S, L) u32 -> broadcast over limb axis
        pa = (digits[..., None, 0, :, :], digits[..., None, 1, :, :])
        r = zq.lazy_reduce(pa, bl, bh, p)
        arr = _st(r)
        return ntt_forward_any(ctx, arr, lazy=True)

    return f


# ---------------------------------------------------------------------------
# Poly
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Poly:
    """An RNS polynomial. Immutable; ops return new polys.

    coeffs: (..., k, 2, N) uint32. `representation` and `lazy` are static.
    """

    ctx: Context
    representation: str
    coeffs: jnp.ndarray
    coeffs_shoup: jnp.ndarray | None = None
    lazy: bool = False

    def tree_flatten(self):
        children = (self.coeffs, self.coeffs_shoup)
        aux = (self.ctx, self.representation, self.lazy)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        ctx, representation, lazy = aux
        coeffs, coeffs_shoup = children
        return cls(ctx, representation, coeffs, coeffs_shoup, lazy)

    # Serialize / DeserializeWithContext trait surface
    # (fhe-traits/src/lib.rs:128-171, rq/serialize.rs:10-27)
    def to_bytes(self) -> bytes:
        from tpufhe.serialize.codecs import serialize_poly

        return serialize_poly(self)

    @classmethod
    def from_bytes(cls, data: bytes, ctx: Context,
                   expected_representation: str | None = None) -> "Poly":
        from tpufhe.serialize.codecs import deserialize_poly

        return deserialize_poly(data, ctx, expected_representation)

    # -- constructors --

    @staticmethod
    def zero(ctx: Context, representation: str = POWER_BASIS, batch=()) -> "Poly":
        planes = 1 if ctx.narrow else 2
        shape = tuple(batch) + (ctx.k, planes) + lane_shape(ctx.degree)
        coeffs = jnp.zeros(shape, dtype=jnp.uint32)
        shoup = coeffs if representation == NTT_SHOUP else None
        return Poly(ctx, representation, coeffs, shoup)

    @staticmethod
    def from_u64_matrix(
        mat, ctx: Context, representation: str = POWER_BASIS
    ) -> "Poly":
        """mat: (..., k, N) uint64 canonical residues."""
        packed = pack_u64(mat)
        if ctx.narrow:
            packed = packed[..., :1, :, :]  # residues < 2^30: lo plane only
        p = Poly(ctx, representation if representation != NTT_SHOUP else NTT,
                 jnp.asarray(packed))
        if representation == NTT_SHOUP:
            p = p.compute_shoup().with_representation(NTT_SHOUP)
        return p

    @staticmethod
    def random(ctx: Context, rng, representation: str = POWER_BASIS) -> "Poly":
        """Uniform polynomial, limbs sampled row by row (rq/mod.rs:226-237)."""
        rows = [q.random_vec(ctx.degree, rng) for q in ctx.q]
        return Poly.from_u64_matrix(np.stack(rows), ctx, representation)

    @staticmethod
    def random_from_seed(
        ctx: Context, seed: bytes, representation: str = NTT
    ) -> "Poly":
        """Deterministic expansion: ChaCha8(SHA-256(seed)) (rq/mod.rs:241-257)."""
        prng = expand_seed(seed)
        rows = [q.random_vec(ctx.degree, prng) for q in ctx.q]
        return Poly.from_u64_matrix(np.stack(rows), ctx, representation)

    @staticmethod
    def small(
        ctx: Context, variance: int, rng, representation: str = POWER_BASIS
    ) -> "Poly":
        """Centered-binomial small polynomial (rq/mod.rs:263-285)."""
        coeffs = sample_vec_cbd(ctx.degree, variance, rng)
        p = Poly.from_i64_coeffs(coeffs, ctx)
        if representation == NTT:
            p = p.into_ntt()
        elif representation == NTT_SHOUP:
            p = p.into_ntt().compute_shoup().with_representation(NTT_SHOUP)
        return p

    @staticmethod
    def from_i64_coeffs(coeffs, ctx: Context) -> "Poly":
        """Signed coefficients, centered-reduced into every limb
        (rq/convert.rs TryConvertFrom<&[i64]>)."""
        v = np.zeros(ctx.degree, dtype=np.int64)
        v[: len(coeffs)] = np.asarray(coeffs, dtype=np.int64)
        arr = np.broadcast_to(
            pack_u64(v.astype(np.uint64)),
            (ctx.k, 2) + lane_shape(ctx.degree),
        )
        return Poly(ctx, POWER_BASIS, _reduce_i64_fn(ctx)(jnp.asarray(arr)))

    @staticmethod
    def from_u64_coeffs(coeffs, ctx: Context) -> "Poly":
        """<= degree unsigned coefficients, reduced into every limb."""
        v = np.zeros(ctx.degree, dtype=np.uint64)
        cs = np.asarray(coeffs, dtype=np.uint64)
        v[: len(cs)] = cs
        arr = np.broadcast_to(pack_u64(v), (ctx.k, 2) + lane_shape(ctx.degree))
        return Poly(ctx, POWER_BASIS, _reduce_u64_fn(ctx)(jnp.asarray(arr)))

    @staticmethod
    def from_bigint_coeffs(coeffs, ctx: Context) -> "Poly":
        """Arbitrary-precision coefficients projected through the RNS."""
        rows = np.zeros((ctx.k, ctx.degree), dtype=np.uint64)
        for j, c in enumerate(coeffs):
            c = int(c)
            for i, m in enumerate(ctx.moduli):
                rows[i, j] = c % m
        return Poly.from_u64_matrix(rows, ctx)

    # -- representation moves --

    def with_representation(self, representation: str) -> "Poly":
        return replace(self, representation=representation)

    def compute_shoup(self) -> "Poly":
        shoup = _shoup_of_fn(self.ctx)(self.coeffs)
        return replace(self, coeffs_shoup=shoup)

    def into_ntt(self, lazy: bool = False) -> "Poly":
        assert self.representation == POWER_BASIS
        out = _fwd_fn(self.ctx, lazy)(self.coeffs)
        return Poly(self.ctx, NTT, out, lazy=lazy)

    def into_ntt_shoup(self) -> "Poly":
        if self.representation == POWER_BASIS:
            p = self.into_ntt()
        else:
            assert self.representation == NTT and not self.lazy
            p = self
        p = p.compute_shoup()
        return p.with_representation(NTT_SHOUP)

    def into_power_basis(self) -> "Poly":
        if self.representation == POWER_BASIS:
            return self
        assert not self.lazy
        out = _bwd_fn(self.ctx)(self.coeffs)
        return Poly(self.ctx, POWER_BASIS, out)

    def into_ntt_from_shoup(self) -> "Poly":
        assert self.representation == NTT_SHOUP
        return Poly(self.ctx, NTT, self.coeffs)

    # -- arithmetic --

    def _check(self, other: "Poly"):
        assert self.ctx is other.ctx, "Incompatible contexts"
        assert self.representation == other.representation

    def __add__(self, other: "Poly") -> "Poly":
        self._check(other)
        assert not (self.lazy or other.lazy)
        out = _binop_fn(self.ctx, "add")(self.coeffs, other.coeffs)
        return Poly(self.ctx, self.representation, out)

    def __sub__(self, other: "Poly") -> "Poly":
        self._check(other)
        assert not (self.lazy or other.lazy)
        out = _binop_fn(self.ctx, "sub")(self.coeffs, other.coeffs)
        return Poly(self.ctx, self.representation, out)

    def __neg__(self) -> "Poly":
        assert not self.lazy
        out = _neg_fn(self.ctx)(self.coeffs)
        return Poly(self.ctx, self.representation, out)

    def __mul__(self, other: "Poly") -> "Poly":
        if other.representation == NTT_SHOUP:
            # a may be lazy (any u64 value): Shoup mul handles it exactly
            out = _mul_shoup_fn(self.ctx, self.lazy)(
                self.coeffs, other.coeffs, other.coeffs_shoup
            )
            return Poly(self.ctx, NTT, out)
        assert self.representation == NTT and other.representation == NTT
        assert not (self.lazy or other.lazy)
        out = _binop_fn(self.ctx, "mul")(self.coeffs, other.coeffs)
        return Poly(self.ctx, NTT, out)

    def scalar_mul(self, scalar: int) -> "Poly":
        """Multiply by a big integer projected through the RNS
        (rq/ops.rs:297-352)."""
        s = [int(scalar) % m for m in self.ctx.moduli]
        if self.ctx.narrow:
            out = _scalar_mul_fn(self.ctx)(
                self.coeffs,
                np.array(s, dtype=np.uint32),
                np.array([q.shoup32(v) for q, v in zip(self.ctx.q, s)],
                         dtype=np.uint32),
            )
            return Poly(self.ctx, self.representation, out)
        s_shoup = [q.shoup(v) for q, v in zip(self.ctx.q, s)]
        out = _scalar_mul_fn(self.ctx)(
            self.coeffs, _pairs_col(s), _pairs_col(s_shoup)
        )
        return Poly(self.ctx, self.representation, out)

    # -- Galois substitution --

    def substitute(self, exp: "SubstitutionExponent") -> "Poly":
        assert exp.ctx is self.ctx

        def take_fold(arr, perm):
            return _fold(jnp.take(_unfold(arr), perm, axis=-1))

        if self.representation in (NTT, NTT_SHOUP):
            perm = jnp.asarray(exp.perm_ntt)
            out = take_fold(self.coeffs, perm)
            shoup = (
                take_fold(self.coeffs_shoup, perm)
                if self.coeffs_shoup is not None
                else None
            )
            return replace(self, coeffs=out, coeffs_shoup=shoup)
        # power basis: out[t] = sign[t] * in[src[t]]
        gathered = take_fold(self.coeffs, jnp.asarray(exp.perm_power))
        neg = _neg_fn(self.ctx)(gathered)
        sign = jnp.asarray(
            exp.sign_power.reshape(lane_shape(self.ctx.degree))
        )  # (S, L) bool, True = negate
        out = jnp.where(sign, neg, gathered)
        return Poly(self.ctx, POWER_BASIS, out)

    # -- modulus switching --

    def switch_down(self) -> "Poly":
        """Divide+round by the last modulus and drop it (rq/mod.rs:390-449)."""
        assert self.representation == POWER_BASIS
        if self.ctx.next_context is None:
            raise NoMoreContext()
        out = _switch_down_fn(self.ctx)(self.coeffs)
        return Poly(self.ctx.next_context, POWER_BASIS, out)

    def switch_down_to(self, target: Context) -> "Poly":
        n = self.ctx.niterations_to(target)
        p = self
        for _ in range(n):
            p = p.switch_down()
        return p

    def multiply_inverse_power_of_x(self, power: int) -> "Poly":
        """Negacyclic multiply by x^{-power} (rq/mod.rs:465-486)."""
        assert self.representation == POWER_BASIS
        n = self.ctx.degree
        shift = ((n << 1) - power) % (n << 1)
        # out[(shift + k) & (n-1)] = ± in[k]
        src = np.empty(n, dtype=np.int32)
        sign = np.empty(n, dtype=bool)
        for k in range(n):
            index = shift + k
            src[index & (n - 1)] = k
            sign[index & (n - 1)] = (index & n) != 0
        gathered = _fold(jnp.take(_unfold(self.coeffs), jnp.asarray(src), axis=-1))
        neg = _neg_fn(self.ctx)(gathered)
        out = jnp.where(jnp.asarray(sign.reshape(lane_shape(n))), neg, gathered)
        return Poly(self.ctx, POWER_BASIS, out)

    # -- data access --

    def to_u64_matrix(self) -> np.ndarray:
        """(..., k, N) uint64 canonical residues (host)."""
        return unpack_u64(np.asarray(self.coeffs))

    def lift_bigints(self) -> list:
        """CRT-lift each coefficient to an integer in [0, q)."""
        assert self.representation == POWER_BASIS
        mat = self.to_u64_matrix()
        assert mat.ndim == 2
        return [
            self.ctx.rns.lift([int(mat[i, j]) for i in range(self.ctx.k)])
            for j in range(self.ctx.degree)
        ]

    @property
    def batch_shape(self):
        return self.coeffs.shape[:-4]


class SubstitutionExponent:
    """Galois automorphism x -> x^exponent (rq/mod.rs:88-121).

    Precomputes gather permutations for both representations.
    """

    def __init__(self, ctx: Context, exponent: int):
        n = ctx.degree
        exponent = exponent % (2 * n)
        if exponent % 2 == 0:
            raise InvalidGaloisElement(
                exponent, "the exponent should be odd modulo 2 * degree")
        self.ctx = ctx
        self.exponent = exponent

        bitrev = ctx.bitrev
        mask = n - 1
        power = (exponent - 1) // 2
        power_bitrev = np.empty(n, dtype=np.int64)
        for i in range(n):
            power_bitrev[i] = bitrev[power & mask]
            power += exponent
        # NTT-domain: out[bitrev[j]] = in[power_bitrev[j]]
        # => out[t] = in[power_bitrev[bitrev[t]]] (bitrev is an involution)
        self.perm_ntt = power_bitrev[bitrev].astype(np.int32)

        # power basis: out[(j*exponent) & mask] (+/-) = in[j]
        src = np.empty(n, dtype=np.int32)
        sign = np.empty(n, dtype=bool)
        power = 0
        for j in range(n):
            src[power & mask] = j
            sign[power & mask] = (power & n) != 0
            power += exponent
        self.perm_power = src
        self.sign_power = sign


# ---------------------------------------------------------------------------
# Scaler / Switcher
# ---------------------------------------------------------------------------


class Scaler:
    """Context-to-context scaler with the common-moduli fast path
    (rq/scaler.rs:18-127)."""

    def __init__(self, from_ctx: Context, to_ctx: Context, factor: ScalingFactor):
        if from_ctx.degree != to_ctx.degree:
            raise InvalidContext("Incompatible degrees")
        self.from_ctx = from_ctx
        self.to_ctx = to_ctx
        self.factor = factor
        if factor.is_one:
            ncm = 0
            for qa, qb in zip(from_ctx.q, to_ctx.q):
                if qa.p != qb.p:
                    break
                ncm += 1
            self.number_common_moduli = ncm
        else:
            self.number_common_moduli = 0
        self.rns_scaler = RnsScaler(from_ctx.rns, to_ctx.rns, factor)

    def scale(self, p: Poly) -> Poly:
        assert p.ctx is self.from_ctx, "wrong context for scaler"
        assert not p.lazy
        ncm = self.number_common_moduli
        k_out = self.to_ctx.k
        rep = p.representation
        assert rep in (POWER_BASIS, NTT)

        parts = []
        if ncm > 0:
            parts.append(p.coeffs[..., :ncm, :, :, :])
        if ncm < k_out:
            pb = p if rep == POWER_BASIS else p.into_power_basis()
            scaled = self.rns_scaler.scale(
                pb.coeffs, starting_index=ncm, size=k_out - ncm
            )
            if rep != POWER_BASIS:
                # forward NTT with the target context's tables, rows ncm..k_out
                scaled = ntt_forward_any(
                    self.to_ctx, scaled, limb_slice=slice(ncm, k_out)
                )
            parts.append(scaled)
        out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-4)
        return Poly(self.to_ctx, rep, out)


class Switcher:
    """Arbitrary context switch: scale by to_modulus/from_modulus
    (rq/switcher.rs:11-27)."""

    def __init__(self, from_ctx: Context, to_ctx: Context):
        self.scaler = Scaler(
            from_ctx, to_ctx, ScalingFactor(to_ctx.modulus(), from_ctx.modulus())
        )

    def switch(self, p: Poly) -> Poly:
        return self.scaler.scale(p)


# ---------------------------------------------------------------------------
# Dot products with deferred reduction
# ---------------------------------------------------------------------------


def dot_product(ps: list, qs: list) -> Poly:
    """sum_i p_i * q_i for NTT polys with u128 lazy accumulation
    (rq/ops.rs:448-550). The reduction schedule differs from the reference
    (uniform threshold instead of per-limb) but the result is identical since
    intermediate reductions are exact mod p.
    """
    assert ps and qs
    count = min(len(ps), len(qs))
    ctx = ps[0].ctx
    d = ctx.dev
    p2 = _exp2(d.p)
    bl, bh = _exp2(d.barrett_lo), _exp2(d.barrett_hi)

    max_acc = min(
        1 << (2 * q.leading_zeros) for q in ctx.q
    )
    max_acc = max(max_acc, 2)

    zero = jnp.zeros_like(ps[0].coeffs[..., 0, :, :])
    acc = (zero, zero, zero, zero)
    num = 0
    for i in range(count):
        a, b = ps[i], qs[i]
        acc = u64.mp_mul_pair(acc, _pl(a.coeffs), _pl(b.coeffs))
        num += 1
        if num >= max_acc - 1:
            r = zq.reduce_u128(acc, bl, bh, p2)
            z = jnp.zeros_like(r[0])
            acc = (r[0], r[1], z, z)
            num = 1
    out = zq.reduce_u128(acc, bl, bh, p2)
    return Poly(ctx, NTT, _st(out))
