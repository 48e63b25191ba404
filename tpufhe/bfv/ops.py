"""Homomorphic operations on ciphertexts (fhe/src/bfv/ops/).

- element-wise add/sub/neg and plaintext add/mul (ops/mod.rs:15-257);
- ciphertext multiplication: extend both operands to the multiplication
  basis, O(k^2) tensor product, down-scale by t/q (ops/mod.rs:259-341);
- Multiplicator with configurable strategies (ops/mul.rs:22-227);
- dot_product_scalar with u128 lazy accumulation (ops/dot_product.rs:13-152).
"""

from __future__ import annotations

from tpufhe.bfv.ciphertext import Ciphertext
from tpufhe.bfv.parameters import BfvParameters, MultiplicationParameters
from tpufhe.bfv.plaintext import Plaintext
from tpufhe.ops import rq
from tpufhe.ops.rns import ScalingFactor
from tpufhe.ops.rq import Context, Poly, Scaler
from tpufhe.utils.primes import generate_prime
from tpufhe.errors import (
    ContextMismatch,
    DimensionMismatch,
    InvalidCiphertext,
    InvalidLevel,
    NoMoreContext,
    TooFewValues,
)


def ct_add(a: Ciphertext, b: Ciphertext) -> Ciphertext:
    assert a.par == b.par
    if not a.c:
        return b.clone()
    if not b.c:
        return a.clone()
    assert a.level == b.level and len(a) == len(b)
    return Ciphertext(a.par, [x + y for x, y in zip(a.c, b.c)], a.level)


def ct_sub(a: Ciphertext, b: Ciphertext) -> Ciphertext:
    assert a.par == b.par
    if not a.c:
        return ct_neg(b)
    if not b.c:
        return a.clone()
    assert a.level == b.level and len(a) == len(b)
    return Ciphertext(a.par, [x - y for x, y in zip(a.c, b.c)], a.level)


def ct_neg(a: Ciphertext) -> Ciphertext:
    return Ciphertext(a.par, [-x for x in a.c], a.level)


def ct_add_pt(a: Ciphertext, pt: Plaintext) -> Ciphertext:
    assert a.par == pt.par and a.c and a.level == pt.level
    c = list(a.c)
    c[0] = c[0] + pt.to_poly()
    return Ciphertext(a.par, c, a.level)


def ct_sub_pt(a: Ciphertext, pt: Plaintext) -> Ciphertext:
    assert a.par == pt.par and a.c and a.level == pt.level
    c = list(a.c)
    c[0] = c[0] - pt.to_poly()
    return Ciphertext(a.par, c, a.level)


def ct_mul_pt(a: Ciphertext, pt: Plaintext) -> Ciphertext:
    """Multiply every part by the plaintext's NTT polynomial
    (ops/mod.rs:229-238)."""
    assert a.par == pt.par
    if not a.c:
        return a.clone()
    assert a.level == pt.level
    return Ciphertext(a.par, [ci * pt.poly_ntt for ci in a.c], a.level)


def _ct_value_equal(a: Ciphertext, b: Ciphertext) -> bool:
    """Value equality, mirroring the reference's `ct0 == ct1` square
    detection (ops/mod.rs:259-341). Identity short-circuits; otherwise a
    host-side compare of the coefficient arrays (eager API only — the fused
    pipelines never call this)."""
    if a is b:
        return True
    if len(a) != len(b) or a.level != b.level:
        return False
    import numpy as np

    return all(
        x is y or np.array_equal(np.asarray(x.coeffs), np.asarray(y.coeffs))
        for x, y in zip(a.c, b.c)
    )


def ct_mul(a: Ciphertext, b: Ciphertext) -> Ciphertext:
    """Full HPS multiplication: extend -> tensor -> down-scale
    (ops/mod.rs:259-341)."""
    if not a.c:
        return a.clone()
    assert a.par == b.par and a.level == b.level
    ctx_lvl = a.par.context_level_at(a.level)
    mp = ctx_lvl.mul_params()

    a_ext = [mp.extender.scale(ci) for ci in a.c]
    b_ext = a_ext if _ct_value_equal(a, b) else [
        mp.extender.scale(ci) for ci in b.c
    ]

    nc = len(a_ext) + len(b_ext) - 1
    c = [None] * nc
    if b_ext is a_ext:
        # square: exploit symmetry, c[i+j] gains a_i*a_j twice for i != j
        for i in range(len(a_ext)):
            for j in range(i, len(a_ext)):
                prod = a_ext[i] * a_ext[j]
                if i != j:
                    prod = prod + prod
                c[i + j] = prod if c[i + j] is None else c[i + j] + prod
    else:
        for i in range(len(a_ext)):
            for j in range(len(b_ext)):
                prod = a_ext[i] * b_ext[j]
                c[i + j] = prod if c[i + j] is None else c[i + j] + prod
    c = [mp.down_scaler.scale(ci) for ci in c]
    return Ciphertext(a.par, c, a.level)


def ct_square(a: Ciphertext) -> Ciphertext:
    """Squaring fast path (ops/mod.rs:259-341 square branch)."""
    return ct_mul(a, a)


class Multiplicator:
    """Configurable multiplication strategy (ops/mul.rs:22-227)."""

    def __init__(self, lhs_scaling_factor: ScalingFactor,
                 rhs_scaling_factor: ScalingFactor, extended_basis,
                 post_mul_scaling_factor: ScalingFactor,
                 par: BfvParameters, level: int = 0):
        base_ctx = par.context_at_level(level)
        mul_ctx = Context(tuple(extended_basis), par.degree())
        self.par = par
        self.extender_lhs = Scaler(base_ctx, mul_ctx, lhs_scaling_factor)
        self.extender_rhs = Scaler(base_ctx, mul_ctx, rhs_scaling_factor)
        self.down_scaler = Scaler(mul_ctx, base_ctx, post_mul_scaling_factor)
        self.base_ctx = base_ctx
        self.mul_ctx = mul_ctx
        self.rk = None
        self.mod_switch = False
        self.level = level

    @staticmethod
    def default(rk) -> "Multiplicator":
        """The standard HPS strategy (ops/mul.rs:100-130)."""
        par = rk.ksk.par
        ctx = par.context_at_level(rk.ksk.ciphertext_level)
        modulus_size = sum(par.moduli_sizes[: ctx.k])
        n_moduli = -((-(modulus_size + 60)) // 62)
        extended_basis = list(ctx.moduli)
        upper_bound = 1 << 62
        while len(extended_basis) != ctx.k + n_moduli:
            upper_bound = generate_prime(62, 2 * par.degree(), upper_bound)
            if upper_bound not in extended_basis:
                extended_basis.append(upper_bound)
        m = Multiplicator(
            ScalingFactor.one(),
            ScalingFactor.one(),
            extended_basis,
            ScalingFactor(par.plaintext.value, ctx.modulus()),
            par,
            rk.ksk.ciphertext_level,
        )
        m.enable_relinearization(rk)
        return m

    @staticmethod
    def strategy2(rk, extension_primes: int = 2) -> "Multiplicator":
        """The SECOND multiplication strategy of eprint 2021/204 (the
        reference shows it test-side, ops/mul.rs:353-402): lhs extends
        exactly (factor 1), rhs is scaled by P/q into q (+) P, and the
        tensor is post-scaled by t/P. P is sized by the rhs-rounding
        NOISE bound (~N*t*q/(2P)) rather than the integer-tensor bound —
        a q*P tensor wrap shifts round(t*C/P) by t*m*q == 0 mod q (see
        pipeline.build_mul_relin_step) — so 1-2 extension primes suffice
        at moderate t. extension_primes=2 preserves depth-2 at L=3 for
        the default-128 shapes; =1 is the depth-1 serving point
        (ROOFLINE.md round-5 ledger: 8,231 vs 6,630 mul+relin/s)."""
        par = rk.ksk.par
        ctx = par.context_at_level(rk.ksk.ciphertext_level)
        basis = list(ctx.moduli)
        upper = 1 << 62
        p_prod = 1
        while len(basis) != ctx.k + extension_primes:
            upper = generate_prime(62, 2 * par.degree(), upper)
            if upper not in basis:
                basis.append(upper)
                p_prod *= upper
        m = Multiplicator(
            ScalingFactor.one(),
            ScalingFactor(p_prod, ctx.modulus()),
            basis,
            ScalingFactor(par.plaintext.value, p_prod),
            par,
            rk.ksk.ciphertext_level,
        )
        m.enable_relinearization(rk)
        return m

    def enable_relinearization(self, rk):
        rk_ctx = self.par.context_at_level(rk.ksk.ciphertext_level)
        if rk_ctx is not self.base_ctx:
            raise ContextMismatch("Invalid relinearization key context")
        self.rk = rk

    def enable_mod_switching(self):
        if self.par.context_at_level(self.par.max_level()) is self.base_ctx:
            raise NoMoreContext()
        self.mod_switch = True

    def multiply(self, lhs: Ciphertext, rhs: Ciphertext) -> Ciphertext:
        if lhs.par != self.par or rhs.par != self.par:
            raise ContextMismatch("Ciphertexts do not have the same parameters")
        if lhs.level != self.level or rhs.level != self.level:
            raise InvalidLevel(lhs.level, self.level, self.level)
        if len(lhs) != 2 or len(rhs) != 2:
            raise InvalidCiphertext("Multiplication requires size-2 ciphertexts")

        c00 = self.extender_lhs.scale(lhs[0])
        c01 = self.extender_lhs.scale(lhs[1])
        c10 = self.extender_rhs.scale(rhs[0])
        c11 = self.extender_rhs.scale(rhs[1])

        c0 = c00 * c10
        c1 = (c00 * c11) + (c01 * c10)
        c2 = c01 * c11

        c = [self.down_scaler.scale(x) for x in (c0, c1, c2)]
        ct = Ciphertext(self.par, c, self.level)

        if self.rk is not None:
            self.rk.relinearizes(ct)
        if self.mod_switch:
            ct.switch_down()
        return ct


def dot_product_scalar(cts: list, pts: list) -> Ciphertext:
    """sum_i ct_i * pt_i with lazy accumulation (ops/dot_product.rs:56-152)."""
    count = min(len(cts), len(pts))
    if count == 0:
        raise TooFewValues(0, 1)
    first = cts[0]
    nparts = len(first)
    for ct in cts:
        if len(ct) != nparts or ct.par != first.par:
            raise DimensionMismatch("dot_product_scalar requires uniform ciphertexts")
    c = [
        rq.dot_product(
            [ct[i] for ct in cts[:count]],
            [pt.poly_ntt for pt in pts[:count]],
        )
        for i in range(nparts)
    ]
    return Ciphertext(first.par, c, first.level)
