"""Fused, jit-compiled end-to-end BFV pipelines.

The object-level API (tpufhe.bfv) dispatches one XLA program per poly op,
which is convenient but leaves fusion on the table. This module builds
whole-operation programs — multiply+relinearize, encrypt, decrypt, rotate —
as single jitted functions over raw coefficient arrays with every constant
(twiddles, Barrett/Shoup tables, HPS omega matrices, keys) embedded. Leading
batch dimensions vectorize batches of ciphertexts; under a mesh, batch and
limb axes shard via jax.sharding and XLA inserts the collectives.

This is the production serving path and the unit the driver benchmarks
(SURVEY.md section 2.9, BASELINE north star).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpufhe.bfv.parameters import BfvParameters
from tpufhe.ops.rq import NTT, POWER_BASIS, Poly, _lazy_const_ntt_fn


def make_mul_relin(par: BfvParameters, rk, level: int = 0):
    """Jitted (a, b) -> a*b relinearized, on raw (..., k, 2, N) uint32 arrays.

    Implements extend -> tensor -> down-scale (ops/mod.rs:259-341) followed
    by the garner-decomposition key switch (key_switching_key.rs:214-241)
    in ONE XLA program.
    """
    ctx_lvl = par.context_level_at(level)
    ctx = ctx_lvl.poly_context
    mp = ctx_lvl.mul_params()
    ksk = rk.ksk
    assert ksk.ciphertext_level == level and ksk.ksk_level == level

    def step(a0, a1, b0, b1):
        ca = [Poly(ctx, NTT, a0), Poly(ctx, NTT, a1)]
        cb = [Poly(ctx, NTT, b0), Poly(ctx, NTT, b1)]
        a_ext = [mp.extender.scale(p) for p in ca]
        b_ext = [mp.extender.scale(p) for p in cb]
        c0 = a_ext[0] * b_ext[0]
        c1 = (a_ext[0] * b_ext[1]) + (a_ext[1] * b_ext[0])
        c2 = a_ext[1] * b_ext[1]
        c0 = mp.down_scaler.scale(c0)
        c1 = mp.down_scaler.scale(c1)
        c2 = mp.down_scaler.scale(c2)
        ks0, ks1 = ksk.key_switch(c2.into_power_basis())
        out0 = c0 + ks0
        out1 = c1 + ks1
        return out0.coeffs, out1.coeffs

    return jax.jit(step)


def make_square_relin(par: BfvParameters, rk, level: int = 0):
    """Jitted squaring + relinearization (the bfv/square benchmark)."""
    ctx_lvl = par.context_level_at(level)
    ctx = ctx_lvl.poly_context
    mp = ctx_lvl.mul_params()
    ksk = rk.ksk

    def step(a0, a1):
        ca = [Poly(ctx, NTT, a0), Poly(ctx, NTT, a1)]
        a_ext = [mp.extender.scale(p) for p in ca]
        c0 = a_ext[0] * a_ext[0]
        c1 = a_ext[0] * a_ext[1]
        c1 = c1 + c1
        c2 = a_ext[1] * a_ext[1]
        c0 = mp.down_scaler.scale(c0)
        c1 = mp.down_scaler.scale(c1)
        c2 = mp.down_scaler.scale(c2)
        ks0, ks1 = ksk.key_switch(c2.into_power_basis())
        return (c0 + ks0).coeffs, (c1 + ks1).coeffs

    return jax.jit(step)


def make_decrypt_phase(par: BfvParameters, sk, level: int = 0):
    """Jitted phase + t/q scaling: (c0, c1) -> plaintext-context residues.

    The final small mod-t fold stays host-side (it needs exact big ints only
    on the first limb row, secret_key.rs:233-260).
    """
    ctx = par.context_at_level(level)
    ctx_lvl = par.context_level_at(level)
    s = Poly.from_i64_coeffs(sk.coeffs, ctx).into_ntt()
    scaler = ctx_lvl.cipher_plain_context.scaler

    def step(c0, c1):
        p0 = Poly(ctx, NTT, c0)
        p1 = Poly(ctx, NTT, c1)
        phase = p0 + (p1 * s)
        d = scaler.scale(phase.into_power_basis())
        return d.coeffs

    return jax.jit(step)


def make_encrypt_with_seed_expansion(par: BfvParameters, sk, level: int = 0):
    """Jitted symmetric encryption core: given a (expanded from seed) and the
    error polynomial e, compute b = e - a*s + m (secret_key.rs:102-137).
    Sampling stays host-side (ChaCha8 parity), the arithmetic fuses."""
    ctx = par.context_at_level(level)
    s = Poly.from_i64_coeffs(sk.coeffs, ctx).into_ntt()

    def step(a, e, m):
        pa = Poly(ctx, NTT, a)
        pe = Poly(ctx, NTT, e)
        pm = Poly(ctx, NTT, m)
        b = (pe - (pa * s)) + pm
        return b.coeffs

    return jax.jit(step)


def make_rotate(par: BfvParameters, gk, level: int = 0):
    """Jitted Galois rotation (substitute + key switch + add)."""
    ctx = par.context_at_level(level)
    element = gk.element
    ksk = gk.ksk

    def step(c0, c1):
        p0 = Poly(ctx, NTT, c0)
        p1 = Poly(ctx, NTT, c1)
        c2 = p1.substitute(element).into_power_basis()
        k0, k1 = ksk.key_switch(c2)
        out0 = k0 + p0.substitute(element)
        return out0.coeffs, k1.coeffs

    return jax.jit(step)


def make_add(par: BfvParameters, level: int = 0):
    ctx = par.context_at_level(level)

    def step(a0, a1, b0, b1):
        out0 = Poly(ctx, NTT, a0) + Poly(ctx, NTT, b0)
        out1 = Poly(ctx, NTT, a1) + Poly(ctx, NTT, b1)
        return out0.coeffs, out1.coeffs

    return jax.jit(step)
