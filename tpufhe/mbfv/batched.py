"""Batched/fused multiparty protocol programs (VERDICT r1 item 9).

The object API (tpufhe.mbfv.protocols) dispatches one XLA program per poly
op per party; correct, but far from the TPU-native mapping SURVEY section
5.8 calls for. This module computes each share type for ALL parties in a
single jitted program (parties as the leading batch axis — every NTT and
elementwise op batches) and folds the aggregation (share summation,
mbfv/aggregate.rs:4-22) into the same program. Sampling stays host-side
for ChaCha8/CBD bit-parity with the reference stack; results are
bit-identical to running the per-party protocol objects with the same RNG
(tests/test_mbfv_batched.py).

For the sharded case, `psum_mod` maps aggregation onto a psum over a
`parties` mesh axis: residues split into 16-bit planes (plain integer
psum is exact for <= 2^16 parties), then carry-folded and Barrett-reduced
back mod p — the literal `Aggregate = psum` mapping of SURVEY 5.8.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpufhe.bfv.ciphertext import Ciphertext
from tpufhe.bfv.parameters import BfvParameters
from tpufhe.bfv.plaintext import Plaintext
from tpufhe.ops import u64, zq
from tpufhe.ops.rq import (
    NTT,
    POWER_BASIS,
    Poly,
    _exp2,
    _reduce_i64_fn,
    lane_shape,
    pack_u64,
)
from tpufhe.utils.sampling import sample_vec_cbd


def _stack_raw_i64(coeff_rows: np.ndarray, ctx) -> np.ndarray:
    """(P, N) int64 -> (P, k, 2, S, L) uint32 two's-complement pairs."""
    P = coeff_rows.shape[0]
    arr = pack_u64(coeff_rows.astype(np.uint64))  # (P, 2, S, L)
    arr = np.broadcast_to(
        arr[:, None], (P, ctx.k, 2) + lane_shape(ctx.degree)
    )
    return np.ascontiguousarray(arr)


def _sum_parties_mod(coeffs, ctx):
    """Sum (P, ..., k, planes, S, L) residue arrays over axis 0, mod p."""
    acc = Poly(ctx, NTT, coeffs[0])
    for i in range(1, coeffs.shape[0]):
        acc = acc + Poly(ctx, NTT, coeffs[i])
    return acc


def batched_public_key(sk_shares, crp, rng):
    """EncKeyGen for all parties fused into one program: computes every
    p0_i = -a*s_i + e_i and their aggregate sum (public_key_gen.rs:33-79)
    with one batched NTT call for the s's and one for the e's."""
    from tpufhe.bfv.keys.public_key import PublicKey

    par = sk_shares[0].par
    ctx = par.context_at_level(0)
    P = len(sk_shares)

    s_rows = np.stack([np.asarray(sk.coeffs, dtype=np.int64)
                       for sk in sk_shares])
    e_rows = np.stack([
        np.asarray(
            sample_vec_cbd(ctx.degree, par.variance, rng), dtype=np.int64
        )
        for _ in range(P)
    ])
    s_raw = _stack_raw_i64(s_rows, ctx)
    e_raw = _stack_raw_i64(e_rows, ctx)
    a_np = np.asarray(crp.poly.coeffs)
    reduce_i64 = _reduce_i64_fn(ctx)

    @jax.jit
    def prog(s_raw, e_raw):
        s = Poly(ctx, POWER_BASIS, reduce_i64(s_raw)).into_ntt()
        e = Poly(ctx, POWER_BASIS, reduce_i64(e_raw)).into_ntt()
        a = Poly(ctx, NTT, jnp.asarray(a_np))
        p0 = ((-a) * s) + e  # batched over the party axis
        return _sum_parties_mod(p0.coeffs, ctx).coeffs

    p0_sum = prog(s_raw, e_raw)
    ct = Ciphertext.new(
        [Poly(ctx, NTT, p0_sum), crp.poly], par
    )
    return PublicKey(par, ct)


def batched_decryption(sk_shares, ct: Ciphertext, rng) -> Plaintext:
    """Collective decryption fused into one program: all parties'
    h_i = s_i*c1 + e_i, the share sum, +c0, iNTT and the t/q scaling
    (secret_key_switch.rs:39-193) in a single XLA program."""
    par = sk_shares[0].par
    ctx = ct[0].ctx
    ctx_lvl = par.context_level_at(ct.level)
    scaler = ctx_lvl.cipher_plain_context.scaler
    P = len(sk_shares)

    s_rows = np.stack([np.asarray(sk.coeffs, dtype=np.int64)
                       for sk in sk_shares])
    e_rows = np.stack([
        np.asarray(
            sample_vec_cbd(ctx.degree, par.variance, rng), dtype=np.int64
        )
        for _ in range(P)
    ])
    s_raw = _stack_raw_i64(s_rows, ctx)
    e_raw = _stack_raw_i64(e_rows, ctx)
    c0_np = np.asarray(ct[0].coeffs)
    c1_np = np.asarray(ct[1].coeffs)
    reduce_i64 = _reduce_i64_fn(ctx)

    @jax.jit
    def prog(s_raw, e_raw):
        s = Poly(ctx, POWER_BASIS, reduce_i64(s_raw)).into_ntt()
        e = Poly(ctx, POWER_BASIS, reduce_i64(e_raw)).into_ntt()
        c1 = Poly(ctx, NTT, jnp.asarray(c1_np))
        h = (s * c1) + e
        hsum = _sum_parties_mod(h.coeffs, ctx)
        c0 = Poly(ctx, NTT, jnp.asarray(c0_np)) + hsum
        return scaler.scale(c0.into_power_basis()).coeffs

    d_coeffs = prog(s_raw, e_raw)
    d = Poly(scaler.to_ctx, POWER_BASIS, d_coeffs)

    t = par.plaintext.value
    if par.plaintext.is_small:
        q0 = par.moduli[0]
        row0 = d.to_u64_matrix()[0]
        value = np.array(
            [((int(v) + t) % q0) % t for v in row0], dtype=np.uint64
        )
        poly = Poly.from_u64_coeffs(value, ctx).into_ntt()
    else:
        q_plain = d.ctx.modulus()
        value = [((v + t) % q_plain) % t for v in d.lift_bigints()]
        poly = Poly.from_bigint_coeffs(value, ctx).into_ntt()
    return Plaintext(par, value, None, poly, ct.level)


# ---------------------------------------------------------------------------
def batched_relin_keygen(sk_shares, crp_vec, rng):
    """2-round RelinKeyGen fused: ONE jitted program per round computes
    every party's shares AND the aggregation (relin_key_gen.rs:19-358;
    VERDICT r2 item 7 — the object API dispatches one XLA program per
    poly op per party per row).

    RNG consumption order matches the object API exactly so results are
    bit-identical given the same stream: all parties' u at construction,
    then per party (round 1) the k h0-errors followed by the k h1-errors,
    then the same pattern for round 2.
    """
    from tpufhe.bfv.keys.key_switching_key import KeySwitchingKey
    from tpufhe.bfv.keys.relinearization_key import RelinearizationKey
    from tpufhe.ops.rns import RnsContext

    par = sk_shares[0].par
    ctx = par.context_at_level(0)
    k = ctx.k
    P = len(sk_shares)
    rns = RnsContext(list(par.moduli[:k]))
    garners = [rns.get_garner(i) for i in range(k)]
    a_np = np.stack([np.asarray(c.poly.coeffs) for c in crp_vec])

    def cbd_rows(n_rows):
        return np.stack([
            np.asarray(sample_vec_cbd(ctx.degree, par.variance, rng),
                       dtype=np.int64)
            for _ in range(n_rows)
        ])

    # constructor order: u for every party first
    u_rows = cbd_rows(P)  # (P, N)
    # round 1, party-major: k e's for h0, then k e's for h1
    e_rows = cbd_rows(P * 2 * k).reshape(P, 2, k, ctx.degree)

    s_rows = np.stack([np.asarray(sk.coeffs, dtype=np.int64)
                       for sk in sk_shares])
    s_raw = _stack_raw_i64(s_rows, ctx)
    u_raw = _stack_raw_i64(u_rows, ctx)
    e_raw = _stack_raw_i64(e_rows.reshape(-1, ctx.degree), ctx).reshape(
        (P, 2, k) + (ctx.k, 2) + lane_shape(ctx.degree))
    reduce_i64 = _reduce_i64_fn(ctx)

    @jax.jit
    def prog_r1(s_raw, u_raw, e_raw):
        s = Poly(ctx, POWER_BASIS, reduce_i64(s_raw)).into_ntt()
        u = Poly(ctx, POWER_BASIS, reduce_i64(u_raw)).into_ntt()
        e = Poly(ctx, POWER_BASIS, reduce_i64(e_raw)).into_ntt()
        h0s, h1s = [], []
        for i in range(k):
            a = Poly(ctx, NTT, jnp.asarray(a_np[i]))
            h0 = ((-a) * u) + s.scalar_mul(garners[i]) \
                + Poly(ctx, NTT, e.coeffs[:, 0, i])
            h1 = (a * s) + Poly(ctx, NTT, e.coeffs[:, 1, i])
            h0s.append(_sum_parties_mod(h0.coeffs, ctx).coeffs)
            h1s.append(_sum_parties_mod(h1.coeffs, ctx).coeffs)
        return jnp.stack(h0s), jnp.stack(h1s)

    h0_sum, h1_sum = prog_r1(s_raw, u_raw, e_raw)

    # round 2, party-major: k e's for h0', then k e's for h1'
    f_rows = cbd_rows(P * 2 * k).reshape(-1, ctx.degree)
    f_raw = _stack_raw_i64(f_rows, ctx).reshape(
        (P, 2, k) + (ctx.k, 2) + lane_shape(ctx.degree))

    @jax.jit
    def prog_r2(s_raw, u_raw, h0_sum, h1_sum, f_raw):
        s = Poly(ctx, POWER_BASIS, reduce_i64(s_raw)).into_ntt()
        u = Poly(ctx, POWER_BASIS, reduce_i64(u_raw)).into_ntt()
        f = Poly(ctx, POWER_BASIS, reduce_i64(f_raw)).into_ntt()
        u_s = u - s
        c0s = []
        for i in range(k):
            h0 = (Poly(ctx, NTT, h0_sum[i]) * s) \
                + Poly(ctx, NTT, f.coeffs[:, 0, i])
            h1 = (Poly(ctx, NTT, h1_sum[i]) * u_s) \
                + Poly(ctx, NTT, f.coeffs[:, 1, i])
            agg0 = _sum_parties_mod(h0.coeffs, ctx)
            agg1 = _sum_parties_mod(h1.coeffs, ctx)
            c0s.append((agg0 + agg1).coeffs)
        return jnp.stack(c0s)

    c0_sum = prog_r2(s_raw, u_raw, h0_sum, h1_sum, f_raw)

    c0 = [Poly(ctx, NTT, c0_sum[i]).into_ntt_shoup() for i in range(k)]
    c1 = [Poly(ctx, NTT, h1_sum[i]).into_ntt_shoup() for i in range(k)]
    ksk = KeySwitchingKey(par, None, c0, c1, 0, ctx, 0, ctx, log_base=0)
    return RelinearizationKey(ksk)


# psum-over-parties aggregation (sharded)
# ---------------------------------------------------------------------------


def psum_mod(coeffs, ctx, axis_name: str):
    """Aggregate residue arrays over a mesh `parties` axis, exactly.

    coeffs: (..., k, 2, S, L) u64-pair residues < p held per party-shard.
    Splits each residue into 16-bit planes (uint32), psums the planes
    (plain integer adds, exact for < 2^16 parties), then recombines the
    carried 80-bit column sums and Barrett-reduces mod p. This is the
    TPU-native form of mbfv `Aggregate` (SURVEY 5.8)."""
    lo = coeffs[..., 0, :, :]
    hi = coeffs[..., 1, :, :]
    planes = [
        lo & jnp.uint32(0xFFFF),
        lo >> jnp.uint32(16),
        hi & jnp.uint32(0xFFFF),
        hi >> jnp.uint32(16),
    ]
    planes = [jax.lax.psum(x, axis_name) for x in planes]
    v0, v1, v2 = u64.cols_to_limbs(planes, 3)
    d = ctx.dev
    idx = (...,) + (None,) * 2
    bl = (d.barrett_lo[0][idx], d.barrett_lo[1][idx])
    bh = (d.barrett_hi[0][idx], d.barrett_hi[1][idx])
    p = (d.p[0][idx], d.p[1][idx])
    r = zq.lazy_reduce_u128((v0, v1, v2, jnp.zeros_like(v2)), bl, bh, p)
    r = zq.reduce1(r, p)
    return jnp.stack(r, axis=-3)


def make_sharded_pk_aggregation(par: BfvParameters, mesh, parties_axis="parties"):
    """shard_map program: each device holds its party's p0 share; the
    aggregate rides a psum over the parties mesh axis."""
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    ctx = par.context_at_level(0)

    def agg(p0_local):
        # p0_local: (1, k, 2, S, L) — this shard's party share
        return psum_mod(p0_local[0], ctx, parties_axis)[None]

    spec = P(parties_axis)
    out_spec = P(None)
    fn = shard_map(
        agg, mesh=mesh, in_specs=(spec,), out_specs=out_spec
    )

    def run(p0_stacked):
        out = jax.jit(fn)(p0_stacked)
        return out[0]

    return run
