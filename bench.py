"""BASELINE tracked-config benchmarks on the live accelerator.

Measures all five tracked configs of BASELINE.md (VERDICT r1 item 5):
  #1 enc/dec roundtrip        N=2048,  L=1
  #2 SIMD add + pt-mul        N=4096,  L=2
  #3 ct-mul + relin           N=8192,  L=3   <- the north-star headline
  #4 Galois rotation          N=8192,  L=4
  #5 PIR-style mul+relin      N=16384, L=6
plus (default on, BENCH_SCALING=0 disables) a 1->8 virtual-CPU-device
scaling efficiency number from benches/scaling.py.

Prints one JSON line per config; the HEADLINE (#3) runs and prints
FIRST (so a driver timeout still captures it) and is re-emitted as the
FINAL line (so last-line parsers track the north-star metric):
  {"metric": ..., "value": N, "unit": "...", "vs_baseline": N}
vs_baseline for #3: measured / 62500 (1e6 mul+relin/s on a v5p-16 spread
over 16 chips). Methodology per CLAUDE.md: chained inputs defeat the
runtime's execution memoization; a tiny device->host fetch synchronizes.

Env knobs: BENCH_DEGREE/BENCH_LIMBS/BENCH_LIMB_BITS/BENCH_BATCH/
BENCH_ITERS override the headline config; BENCH_ONLY=3 runs only the
headline; BENCH_BUDGET_S caps aux-config time (default 1500).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from functools import partial

os.environ.setdefault("XLA_FLAGS", "")
import numpy as np


def _sync(*arrays):
    """block_until_ready does not truly synchronize on the tunneled
    runtime; force completion with a tiny device->host fetch."""
    import jax

    jax.block_until_ready(arrays)
    for a in arrays:
        leaf = jax.tree_util.tree_leaves(a)[0]
        np.asarray(leaf.ravel()[0])


def _rand_ct_arrays(ctx, batch, n, count=4, seed=0):
    import jax
    from tpufhe.ops.rq import pack_u64

    nprng = np.random.default_rng(seed)
    arrs = []
    for _ in range(count):
        mat = np.stack(
            [
                nprng.integers(0, m, size=(batch, n), dtype=np.uint64)
                for m in ctx.moduli
            ],
            axis=1,
        )
        packed = pack_u64(mat)
        if ctx.narrow:
            packed = packed[..., :1, :, :]
        arrs.append(jax.device_put(packed))
    return arrs


_LAST = {}


def _emit(metric, value, unit, **extra):
    line = {"metric": metric, "value": round(value, 4), "unit": unit}
    line.update(extra)
    _LAST.clear()
    _LAST.update(line)
    print(json.dumps(line), flush=True)


def _build_params(degree, limb_bits, n_limbs, t=1153):
    from tpufhe.bfv import BfvParametersBuilder

    return (
        BfvParametersBuilder()
        .set_degree(degree)
        .set_plaintext_modulus(t)
        .set_moduli_sizes([limb_bits] * n_limbs)
        .build()
    )


def _keys(par, seed=42, relin=True):
    from tpufhe.bfv import RelinearizationKey, SecretKey
    from tpufhe.utils.rngs import ChaCha8Rng, seed_from_u64

    rng = ChaCha8Rng(seed_from_u64(seed))
    sk = SecretKey.random(par, rng)
    rk = RelinearizationKey.new(sk, rng) if relin else None
    return sk, rk, rng


def bench_mul_relin(degree, limb_bits, n_limbs, batch, iters, metric,
                    vs_baseline=False, inner=None, strategy2_primes=None,
                    **emit_extra):
    """Chained mul+relin throughput (configs #3 and #5).

    `inner` applications are chained INSIDE one jit program (kbench
    methodology: amortizes the per-dispatch tunnel latency, which the
    trace showed costs ~10 ms per call on this runtime); `iters` outer
    calls chain program outputs into inputs so the runtime's execution
    memoization cannot hit."""
    import jax

    from tpufhe.pipeline import make_mul_relin

    if inner is None:
        # chaining more applications per program amortizes the ~10 ms
        # tunnel dispatch: inner 16 -> 32 measured 5739 -> 5777 (r3);
        # 32 -> 64 measured 6640 -> 6727 default / 8075 -> 8252 s2-kP1
        # (r5; the fori body compiles once, so deeper chains are free)
        inner = int(os.environ.get("BENCH_INNER", 64))

    par = _build_params(degree, limb_bits, n_limbs)
    sk, rk, _ = _keys(par)
    fn = make_mul_relin(par, rk, strategy2_primes=strategy2_primes)
    ctx = par.context_at_level(0)
    arrs = _rand_ct_arrays(ctx, batch, degree)

    # donate the chained operand buffers: XLA may alias them into the
    # outputs instead of copying (the trace shows ~24% blocking DMA)
    if os.environ.get("BENCH_LOOP", "1") != "0":
        # lax.fori_loop chain: the app body compiles ONCE instead of
        # `inner` unrolled copies (same serial data dependence, ~inner x
        # faster XLA compiles; A/B throughput vs the unrolled chain)
        @partial(jax.jit, donate_argnums=(0, 1))
        def prog(a0, a1, b0, b1):
            def body(_, c):
                return fn(c[0], c[1], b0, b1)

            return jax.lax.fori_loop(0, inner, body, (a0, a1))
    else:
        @partial(jax.jit, donate_argnums=(0, 1))
        def prog(a0, a1, b0, b1):
            for _ in range(inner):
                a0, a1 = fn(a0, a1, b0, b1)
            return a0, a1

    out = prog(*arrs)
    _sync(out)
    a0, a1, b0, b1 = out[0], out[1], arrs[2], arrs[3]
    t0 = time.perf_counter()
    for _ in range(iters):
        a0, a1 = prog(a0, a1, b0, b1)
    _sync(a0, a1)
    dt = time.perf_counter() - t0
    ops = batch * iters * inner / dt
    extra = {}
    if vs_baseline:
        extra["vs_baseline"] = round(ops / (1e6 / 16), 4)
    _emit(metric, ops, "ciphertext_mul+relin/s/chip", batch=batch,
          methodology=f"chained-inner-{inner}", includes_sampling=False,
          **emit_extra, **extra)
    return ops


def bench_enc_dec(batch, iters, inner=None):
    """Config #1: symmetric enc + decrypt-phase roundtrip at N=2048/L=1.

    `inner` roundtrips are chained INSIDE one jit program (fori_loop), the
    same methodology as the headline config — the per-roundtrip device
    work at N=2048/L=1 is far smaller than the ~10 ms tunnel dispatch, so
    the unchained form measured dispatch latency, not the kernels
    (VERDICT r3 weak #4)."""
    import jax
    import jax.numpy as jnp

    from tpufhe.pipeline import (
        make_decrypt_phase,
        make_encrypt_with_seed_expansion,
    )

    if inner is None:
        inner = int(os.environ.get("BENCH_INNER_ED", 256))

    degree = 2048
    par = _build_params(degree, 62, 1)
    sk, _, rng = _keys(par, relin=False)
    enc = make_encrypt_with_seed_expansion(par, sk)
    dec = make_decrypt_phase(par, sk)
    ctx = par.context_at_level(0)

    a, e, m = _rand_ct_arrays(ctx, batch, degree, count=3, seed=1)
    # chain glue: reuse decrypt output's first limb row as the next message
    # (mask the hi plane so the value stays < p; valid residues, fresh
    # inputs every iteration so executions cannot be memoized)
    mask = np.zeros((2, 1, 1), dtype=np.uint32)
    mask[0, 0, 0] = 0xFFFFFFFF
    mask[1, 0, 0] = 0x0FFFFFFF
    mask = jnp.asarray(mask)

    def glue(d):
        return (d[..., :1, :, :, :] & mask).astype(jnp.uint32)

    @partial(jax.jit, donate_argnums=(2,))
    def prog(a, e, m):
        def body(_, m):
            b = enc(a, e, m)
            return glue(dec(b, a))

        return jax.lax.fori_loop(0, inner, body, m)

    m = prog(a, e, m)
    _sync(m)
    t0 = time.perf_counter()
    for _ in range(iters):
        m = prog(a, e, m)
    _sync(m)
    dt = time.perf_counter() - t0
    ops = batch * iters * inner / dt
    _emit("bfv_encrypt_decrypt_roundtrip_n2048_l1", ops,
          "enc+dec_roundtrips/s/chip", batch=batch,
          methodology=f"chained-inner-{inner}", includes_sampling=False,
          measures="device arithmetic core: NTT/pointwise/phase+t-q scale; "
                   "host-side sampling and final mod-t fold excluded")
    return ops


def bench_add_ptmul(batch, iters):
    """Config #2: SIMD ct-add + pt-mul at N=4096/L=2, fused program."""
    import jax

    from tpufhe.ops.rq import NTT, Poly

    degree = 4096
    par = _build_params(degree, 62, 2)
    ctx = par.context_at_level(0)

    a0, a1, b0, b1, w = _rand_ct_arrays(ctx, batch, degree, count=5, seed=2)
    inner = int(os.environ.get("BENCH_INNER_AP", 64))

    def step(a0, a1, b0, b1):
        pw = Poly(ctx, NTT, w)  # plaintext NTT poly (batched)
        o0 = (Poly(ctx, NTT, a0) + Poly(ctx, NTT, b0)) * pw
        o1 = (Poly(ctx, NTT, a1) + Poly(ctx, NTT, b1)) * pw
        return o0.coeffs, o1.coeffs

    @partial(jax.jit, donate_argnums=(0, 1))
    def prog(a0, a1, b0, b1):
        def body(_, c):
            return step(c[0], c[1], b0, b1)

        return jax.lax.fori_loop(0, inner, body, (a0, a1))

    out = prog(a0, a1, b0, b1)
    _sync(out)
    x0, x1 = out
    t0 = time.perf_counter()
    for _ in range(iters):
        x0, x1 = prog(x0, x1, b0, b1)
    _sync(x0, x1)
    dt = time.perf_counter() - t0
    ops = batch * iters * inner / dt
    _emit("bfv_simd_add_ptmul_n4096_l2", ops, "add+pt_mul/s/chip",
          batch=batch, methodology=f"chained-inner-{inner}",
          includes_sampling=False)
    return ops


def bench_rotate(batch, iters, inner=None):
    """Config #4: Galois rotation (substitute+key switch) at N=8192/L=4.

    `inner` rotations chained inside one program (headline methodology);
    each iteration applies the same Galois element to the previous output,
    so inputs stay fresh and executions cannot be memoized."""
    import jax

    from tpufhe.bfv import GaloisKey
    from tpufhe.pipeline import make_rotate

    if inner is None:
        inner = int(os.environ.get("BENCH_INNER_ROT", 64))

    degree = 8192
    par = _build_params(degree, 62, 4)
    sk, _, rng = _keys(par, relin=False)
    gk = GaloisKey.new(sk, 3, 0, 0, rng)
    fn = make_rotate(par, gk)
    ctx = par.context_at_level(0)
    c0, c1 = _rand_ct_arrays(ctx, batch, degree, count=2, seed=3)

    @partial(jax.jit, donate_argnums=(0, 1))
    def prog(c0, c1):
        def body(_, c):
            return fn(c[0], c[1])

        return jax.lax.fori_loop(0, inner, body, (c0, c1))

    out = prog(c0, c1)
    _sync(out)
    x0, x1 = out
    t0 = time.perf_counter()
    for _ in range(iters):
        x0, x1 = prog(x0, x1)
    _sync(x0, x1)
    dt = time.perf_counter() - t0
    ops = batch * iters * inner / dt
    _emit("bfv_rotate_columns_n8192_l4", ops, "rotations/s/chip",
          batch=batch, methodology=f"chained-inner-{inner}",
          includes_sampling=False)
    return ops


def bench_inner_sum(batch, iters):
    """Config #4b: the inner-product circuit — log2(n/2)+1 fused Galois
    key-switches accumulating the total sum (benches/bfv.rs:181-217)."""
    from tpufhe.bfv import EvaluationKeyBuilder, SecretKey
    from tpufhe.pipeline import make_inner_sum
    from tpufhe.utils.rngs import ChaCha8Rng, seed_from_u64

    degree = 8192
    par = _build_params(degree, 62, 4)
    rng = ChaCha8Rng(seed_from_u64(7))
    sk = SecretKey.random(par, rng)
    ek = EvaluationKeyBuilder(sk).enable_inner_sum().build(rng)
    fn = make_inner_sum(par, ek)
    ctx = par.context_at_level(0)
    c0, c1 = _rand_ct_arrays(ctx, batch, degree, count=2, seed=4)

    import jax

    inner = int(os.environ.get("BENCH_INNER_IS", 8))

    # chain `inner` inner-sums inside ONE program (headline methodology):
    # each is 13 fused rotations, but the ~10 ms per-call dispatch still
    # dominated the unchained form (411/s recorded vs 660/s measured
    # back-to-back in round 5)
    @partial(jax.jit, donate_argnums=(0, 1))
    def prog(c0, c1):
        def body(_, c):
            return fn(c[0], c[1])

        return jax.lax.fori_loop(0, inner, body, (c0, c1))

    out = prog(c0, c1)
    _sync(out)
    x0, x1 = out
    t0 = time.perf_counter()
    for _ in range(iters):
        x0, x1 = prog(x0, x1)
    _sync(x0, x1)
    dt = time.perf_counter() - t0
    ops = batch * iters * inner / dt
    nrot = (degree // 2 - 1).bit_length() + 1
    _emit("bfv_inner_sum_n8192_l4", ops, "inner_sums/s/chip",
          batch=batch, rotations_each=nrot,
          methodology=f"chained-inner-{inner}", includes_sampling=False)
    return ops


def bench_dot_product(iters, count=128, degree=8192,
                       n_limbs=4):
    """Config #4c: optimized ct-pt dot product of `count` pairs
    (bfv_optimized_ops.rs:19-70), u128 lazy accumulation.

    Round-4 rewire (VERDICT r3 item 8): the old form unrolled `count`
    Poly objects in Python — a 10^4-node graph of per-pair slices that
    XLA executed as hundreds of small kernels (33/s, entirely
    graph/dispatch-bound, NOT arithmetic-bound). This uses the
    lax.scan-based make_ct_pt_dot (the PIR serving core — deferred u128
    accumulation, one Barrett reduce per headroom window, bit-identical
    results per rq/ops.rs:448-550 semantics); the db rides as a device
    argument. Chained: the dot result folds back into every input."""
    import jax

    from tpufhe.ops.rq import NTT, Poly
    from tpufhe.pipeline import make_ct_pt_dot

    par = _build_params(degree, 62, n_limbs)
    ctx = par.context_at_level(0)
    dot = make_ct_pt_dot(par, count, 1)

    e0, e1 = (a[:, None] for a in
              _rand_ct_arrays(ctx, count, degree, count=2, seed=5))
    db = np.asarray(_rand_ct_arrays(ctx, count, degree, count=1,
                                    seed=100)[0])[:, None]  # (n, 1, ...)
    import jax.numpy as jnp

    db = jax.device_put(jnp.asarray(db))

    inner = int(os.environ.get("BENCH_INNER_DOT", 32))

    @jax.jit
    def prog(e0, e1, db):
        # `inner` chained dots inside ONE program (CLAUDE.md bench
        # methodology: per-dispatch tunnel latency is ~10 ms and the
        # runtime memoizes repeated executions, so per-call loops
        # measure dispatch, not kernels)
        def body(_, c):
            e0, e1 = c
            r0, r1 = dot(e0, e1, db)  # (m=1, B=1, k, 2, S, L)
            n0 = (Poly(ctx, NTT, e0) + Poly(ctx, NTT, r0)).coeffs
            n1 = (Poly(ctx, NTT, e1) + Poly(ctx, NTT, r1)).coeffs
            return n0, n1
        return jax.lax.fori_loop(0, inner, body, (e0, e1))

    out = prog(e0, e1, db)
    _sync(out)
    x0, x1 = out
    t0 = time.perf_counter()
    for _ in range(iters):
        x0, x1 = prog(x0, x1, db)
    _sync(x0, x1)
    dt = time.perf_counter() - t0
    ops = iters * inner / dt
    _emit(f"bfv_dot_product_{count}_n{degree}_l{n_limbs}", ops,
          "dot_products/s/chip", pairs=count,
          methodology=f"chained-inner-{inner}", includes_sampling=False)
    return ops


def bench_mbfv(iters, parties=11, batch=8, degree=4096,
               n_limbs=2):
    """Config #6 (VERDICT r3 item 9): one multiparty round on the TPU —
    collective public-key generation (Protocol 1, public_key_gen.rs:16-79:
    p0 = sum_i(-a*s_i + e_i) against the CRP) plus collective decryption
    (secret_key_switch.rs:118-193: h = sum_i(s_i*c1 + e_i), phase + t/q
    scale) for `parties` parties x `batch` ciphertexts, fused into ONE
    program with the party axis leading (the batched.py mapping). Chained:
    the aggregated keygen/decryption outputs become the next (c0, c1)."""
    import jax

    from tpufhe.ops.rq import NTT, POWER_BASIS, Poly, _reduce_i64_fn
    from tpufhe.utils.sampling import sample_vec_cbd
    from tpufhe.mbfv.batched import _stack_raw_i64

    par = _build_params(degree, 62, n_limbs)
    ctx = par.context_at_level(0)
    ctx_lvl = par.context_level_at(0)
    scaler = ctx_lvl.cipher_plain_context.scaler
    sk, _, rng = _keys(par, relin=False)

    s_rows = np.stack([
        np.asarray(sample_vec_cbd(degree, par.variance, rng), np.int64)
        for _ in range(parties)
    ])
    e_rows = np.stack([
        np.asarray(sample_vec_cbd(degree, par.variance, rng), np.int64)
        for _ in range(parties)
    ])
    s_raw = _stack_raw_i64(s_rows, ctx)[:, None]  # (P, 1, k, 2, S, L)
    e_raw = _stack_raw_i64(e_rows, ctx)[:, None]
    reduce_i64 = _reduce_i64_fn(ctx)
    c0, c1 = _rand_ct_arrays(ctx, batch, degree, count=2, seed=9)

    import jax.numpy as jnp

    @jax.jit
    def prog(c0, c1, s_raw, e_raw):
        s = Poly(ctx, POWER_BASIS, reduce_i64(s_raw)).into_ntt()
        e = Poly(ctx, POWER_BASIS, reduce_i64(e_raw)).into_ntt()
        a = Poly(ctx, NTT, c1)  # CRP stand-in, batched
        # Protocol 1: per-party shares + aggregation (Aggregate = sum)
        p0 = ((-a) * s) + e  # (P, B, ...)
        pk0 = p0.coeffs[0]
        for i in range(1, parties):
            pk0 = (Poly(ctx, NTT, pk0) + Poly(ctx, NTT, p0.coeffs[i])).coeffs
        # collective decryption: shares, aggregate, phase, t/q scale
        h = (s * a) + e
        hsum = h.coeffs[0]
        for i in range(1, parties):
            hsum = (Poly(ctx, NTT, hsum) + Poly(ctx, NTT, h.coeffs[i])).coeffs
        phase = Poly(ctx, NTT, c0) + Poly(ctx, NTT, hsum)
        d = scaler.scale(phase.into_power_basis())
        # chain: aggregated outputs feed the next round's ciphertext
        return pk0, phase.coeffs, d.coeffs

    inner = int(os.environ.get("BENCH_INNER_MB", 4))

    @jax.jit
    def chained(c0, c1, s_raw, e_raw):
        def body(_, c):
            pk0, ph, d = prog(c[0], c[1], s_raw, e_raw)
            # keep the t/q decryption scaler LIVE across the chain (a
            # carry that drops `d` lets XLA dead-code-eliminate it):
            # splice its limb row over pk0's first limb — still valid
            # canonical residues
            c0n = jnp.concatenate([d[..., :1, :, :, :],
                                   pk0[..., 1:, :, :, :]], axis=-4)
            return c0n, ph

        return jax.lax.fori_loop(0, inner, body, (c0, c1))

    out = chained(c0, c1, s_raw, e_raw)
    _sync(out)
    x0, x1 = out
    t0 = time.perf_counter()
    for _ in range(iters):
        x0, x1 = chained(x0, x1, s_raw, e_raw)
    _sync(x0, x1)
    dt = time.perf_counter() - t0
    ops = batch * iters * inner / dt
    _emit(f"mbfv_keygen_plus_decrypt_n{degree}_l{n_limbs}", ops,
          "collective_rounds/s/chip", batch=batch, parties=parties,
          methodology=f"chained-inner-{inner}", includes_sampling=False)
    return ops


def bench_pir_response(batch, iters):
    """Config #5: PIR-shaped — oblivious expansion -> plaintext-db dot
    products -> tensor-accumulated ct-muls -> one relinearization, at
    N=16384/L=6 (examples/mulpir.rs:163-183). effective_ops counts
    key-switch-equivalents per response (expansion rotations + muls)."""
    from tpufhe.bfv import EvaluationKeyBuilder, SecretKey
    from tpufhe.pipeline import make_pir_response
    from tpufhe.utils.rngs import ChaCha8Rng, seed_from_u64

    degree = 16384
    dim1 = dim2 = 8
    level_count = (dim1 + dim2 - 1).bit_length()
    par = _build_params(degree, 62, 6)
    rng = ChaCha8Rng(seed_from_u64(8))
    sk = SecretKey.random(par, rng)
    from tpufhe.bfv import RelinearizationKey

    rk = RelinearizationKey.new(sk, rng)
    ek = EvaluationKeyBuilder(sk).enable_expansion(level_count).build(rng)
    ctx = par.context_at_level(0)

    db = np.stack([
        np.stack([
            np.asarray(_rand_ct_arrays(ctx, 1, degree, count=1,
                                       seed=200 + i * dim2 + j)[0][0])
            for j in range(dim2)
        ])
        for i in range(dim1)
    ])
    fn = make_pir_response(par, ek, rk, db, dim1, dim2)
    c0, c1 = _rand_ct_arrays(ctx, batch, degree, count=2, seed=6)

    out = fn(c0, c1)
    _sync(out)
    x0, x1 = out
    t0 = time.perf_counter()
    for _ in range(iters):
        x0, x1 = fn(x0, x1)
    _sync(x0, x1)
    dt = time.perf_counter() - t0
    resp = batch * iters / dt
    expansions = (1 << level_count) - 1  # one key switch per doubling node
    eff = batch * iters * (expansions + dim2 + 1)
    _emit("bfv_pir_style_response_n16384_l6", resp, "pir_responses/s/chip",
          batch=batch, dim1=dim1, dim2=dim2,
          effective_keyswitch_ops=eff, elapsed_s=round(dt, 2))
    return resp


def bench_sampling(batch, iters):
    """Host-side sampling cost for a batch-`batch` encrypt at N=2048/L=1
    (VERDICT r4 missing #4): per ciphertext one CBD error vector
    (fhe-util/src/lib.rs:22-55) plus one seeded ChaCha8 uniform expansion
    of `a` (k x N residues, rq/mod.rs:241-257 semantics). The hot path
    keeps sampling host-side, so no device metric includes it; this
    metric makes its cost visible next to the device-core roundtrip
    number. Measures the C++ ChaCha8 core (tpufhe/native) and the
    pure-Python fallback."""
    import tpufhe.native as native
    from tpufhe.utils.rngs import (
        ChaCha8Rng,
        expand_seed,
        seed_from_u64,
        uniform_u64_below,
    )
    from tpufhe.utils.sampling import sample_vec_cbd

    degree = 2048
    par = _build_params(degree, 62, 1)
    moduli = [int(m) for m in par.context_at_level(0).moduli]
    variance = par.variance

    def run(n_ct):
        rng = ChaCha8Rng(seed_from_u64(123))
        for _ in range(n_ct):
            sample_vec_cbd(degree, variance, rng)
            r2 = expand_seed(rng.fill_bytes(32))
            for p in moduli:
                uniform_u64_below(r2, p, degree)

    have_native = native.available()
    run(4)  # warm up (builds the native lib on first use)
    n_ct = batch * iters
    t0 = time.perf_counter()
    run(n_ct)
    rate = n_ct / (time.perf_counter() - t0)

    # pure-Python fallback (the no-toolchain path): much slower, so
    # measure a small count and report the rate
    real_lib = native.lib
    try:
        native.lib = lambda: None
        n_py = max(2, batch // 8)
        t0 = time.perf_counter()
        run(n_py)
        py_rate = n_py / (time.perf_counter() - t0)
    finally:
        native.lib = real_lib
    _emit("host_sampling_encrypt_batch_n2048_l1",
          rate if have_native else py_rate, "sampled_cts/s/host",
          batch=batch, native_core=have_native,
          python_fallback_cts_per_s=round(py_rate, 2),
          measures="ChaCha8 CBD error + seeded uniform `a` expansion "
                   "per ciphertext, host-side")
    return rate


def bench_scaling():
    """1 -> 8 virtual CPU device scaling (subprocess, cpu platform)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    try:
        out = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "benches", "scaling.py")],
            capture_output=True, text=True, timeout=1800, env=env,
        )
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
    except Exception as e:  # never break the headline on scaling failure
        _emit("scaling_efficiency_1_to_8_virtual_cpu", -1.0, "error",
              error=str(e)[:120])


def main():
    import jax

    cache_dir = os.path.expanduser("~/.cache/tpufhe_jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    degree = int(os.environ.get("BENCH_DEGREE", 8192))
    limb_bits = int(os.environ.get("BENCH_LIMB_BITS", 62))
    default_limbs = 3 if limb_bits > 30 else -((-62 * 3) // limb_bits)
    n_limbs = int(os.environ.get("BENCH_LIMBS", default_limbs))
    batch = int(os.environ.get("BENCH_BATCH", 64))
    iters = int(os.environ.get("BENCH_ITERS", 10))
    only = os.environ.get("BENCH_ONLY", "")
    budget = float(os.environ.get("BENCH_BUDGET_S", 1500))

    start = time.time()

    def within_budget():
        return time.time() - start < budget

    # headline FIRST (so a driver timeout still captures it), re-emitted
    # LAST (so last-line parsers see it too)
    def run_headline():
        return bench_mul_relin(
            degree, limb_bits, n_limbs, batch=batch, iters=iters,
            metric=(
                f"bfv_mul_relin_ops_per_s_per_chip_n{degree}"
                f"_l{n_limbs}x{limb_bits}b"
            ),
            vs_baseline=True,
        )

    run_headline()
    headline = dict(_LAST)

    if only != "3":
      try:
        for name, fn in (
            ("encdec", lambda: bench_enc_dec(batch=batch, iters=iters)),
            ("sampling", lambda: bench_sampling(batch=batch,
                                                iters=max(2, iters // 5))),
            ("addptmul", lambda: bench_add_ptmul(batch=batch, iters=iters)),
            ("rotate", lambda: bench_rotate(batch=min(batch, 32),
                                            iters=iters)),
            ("innersum", lambda: bench_inner_sum(batch=min(batch, 16),
                                                 iters=max(3, iters // 3))),
            ("dotproduct", lambda: bench_dot_product(
                iters=max(3, iters // 3))),
            ("mbfv", lambda: bench_mbfv(iters=max(3, iters // 3))),
            # eprint-2021/204 second-strategy variants of the headline
            # op (round-5: 42+7*kP limb-transforms vs 64; see ROOFLINE).
            # kP=2 preserves depth-2 at L=3 (decrypt-checked at noise 119
            # vs default 96); kP=1 is the depth-1 serving point.
            ("mulrelin_s2d2", lambda: bench_mul_relin(
                degree, limb_bits, n_limbs, batch=batch, iters=iters,
                metric=(f"bfv_mul_relin_strategy2_depth2_n{degree}"
                        f"_l{n_limbs}x{limb_bits}b"),
                vs_baseline=True, strategy2_primes=2,
                noise_bits=95, depth2_ok=True, transforms_per_op=56)),
            ("mulrelin_s2d1", lambda: bench_mul_relin(
                degree, limb_bits, n_limbs, batch=batch, iters=iters,
                metric=(f"bfv_mul_relin_strategy2_depth1_n{degree}"
                        f"_l{n_limbs}x{limb_bits}b"),
                vs_baseline=True, strategy2_primes=1,
                noise_bits=156, depth2_ok=False, transforms_per_op=49)),
            ("mulrelin16384", lambda: bench_mul_relin(
                16384, 62, 6, batch=max(4, batch // 8), iters=max(3, iters // 3),
                metric="bfv_mul_relin_ops_per_s_per_chip_n16384_l6x62b",
                inner=8)),
            ("pir16384", lambda: bench_pir_response(
                batch=max(2, batch // 16), iters=2)),
        ):
            if not within_budget():
                _emit(f"skipped_{name}", -1.0, "budget_exceeded",
                      status="skipped")
                continue
            # self-triaging (VERDICT r3 item 10): retry once so a
            # transient tunnel/compile-service failure is distinguishable
            # from a deterministic kernel regression in the record
            for attempt in (0, 1):
                try:
                    fn()
                    break
                except Exception as e:
                    if attempt == 0:
                        time.sleep(10)
                        continue
                    _emit(f"failed_{name}", -1.0, "error", status="failed",
                          retried=True, error=str(e)[:160])
        if os.environ.get("BENCH_SCALING", "1") == "1" and within_budget():
            bench_scaling()
      finally:
        # re-emit the headline as the final line, unconditionally
        print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    main()
