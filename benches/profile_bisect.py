"""Bisect the mul+relin pipeline: where do the extra milliseconds come from?"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, iters=20, label=""):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:46s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser("~/.cache/tpufhe_jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpufhe.bfv import BfvParametersBuilder, RelinearizationKey, SecretKey
    from tpufhe.ops.rq import NTT, POWER_BASIS, Poly, _lazy_const_ntt_fn
    from tpufhe.utils.rngs import ChaCha8Rng, seed_from_u64

    degree = int(os.environ.get("BENCH_DEGREE", 8192))
    n_limbs = int(os.environ.get("BENCH_LIMBS", 3))
    batch = int(os.environ.get("BENCH_BATCH", 16))

    par = (
        BfvParametersBuilder()
        .set_degree(degree)
        .set_plaintext_modulus(1153)
        .set_moduli_sizes([62] * n_limbs)
        .build()
    )
    rng = ChaCha8Rng(seed_from_u64(42))
    sk = SecretKey.random(par, rng)
    rk = RelinearizationKey.new(sk, rng)

    ctx_lvl = par.context_level_at(0)
    ctx = ctx_lvl.poly_context
    mp = ctx_lvl.mul_params()
    ctx_mul = mp.extender.to_ctx
    ksk = rk.ksk

    nprng = np.random.default_rng(0)

    def rand_arr(c, b):
        mat = np.stack(
            [nprng.integers(0, m, size=(b, degree), dtype=np.uint64)
             for m in c.moduli], axis=1)
        lo = (mat & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi = (mat >> np.uint64(32)).astype(np.uint32)
        return jax.device_put(np.stack([lo, hi], axis=2))

    a0, a1, b0, b1 = [rand_arr(ctx, batch) for _ in range(4)]
    x3 = rand_arr(ctx, batch)

    # --- key_switch internals ---
    lift = _lazy_const_ntt_fn(ctx)
    digits = x3[:, 0, :, :]
    timeit(lift, (digits,), label="lift one row (broadcast+lazyred+lazyNTT)")

    mul_acc = jax.jit(
        lambda d: (Poly(ctx, NTT, lift(d), lazy=True) * ksk.c0[0]).coeffs)
    timeit(mul_acc, (digits,), label="lift + shoup-mul one row")

    ks = jax.jit(
        lambda c: tuple(p.coeffs for p in ksk.key_switch(Poly(ctx, POWER_BASIS, c))))
    timeit(ks, (x3,), label="key_switch full (3 rows x 2 accum)")

    # key_switch but only c0 accumulation
    def ks_half(c):
        p = Poly(ctx, POWER_BASIS, c)
        c0 = Poly.zero(ctx, NTT)
        for i in range(ctx.k):
            c2i = Poly(ctx, NTT, lift(p.coeffs[..., i, :, :]), lazy=True)
            c0 = c0 + (c2i * ksk.c0[i])
        return c0.coeffs
    timeit(jax.jit(ks_half), (x3,), label="key_switch c0 only (3 rows)")

    # --- pipeline stages cumulatively ---
    def extend4(a0, a1, b0, b1):
        ps = [Poly(ctx, NTT, c) for c in (a0, a1, b0, b1)]
        return tuple(mp.extender.scale(p).coeffs for p in ps)
    timeit(jax.jit(extend4), (a0, a1, b0, b1), label="stage1: extend x4")

    def tensor(a0, a1, b0, b1):
        ae = [mp.extender.scale(Poly(ctx, NTT, c)) for c in (a0, a1)]
        be = [mp.extender.scale(Poly(ctx, NTT, c)) for c in (b0, b1)]
        c0 = ae[0] * be[0]
        c1 = (ae[0] * be[1]) + (ae[1] * be[0])
        c2 = ae[1] * be[1]
        return c0.coeffs, c1.coeffs, c2.coeffs
    timeit(jax.jit(tensor), (a0, a1, b0, b1), label="stage2: extend+tensor")

    def downscale(a0, a1, b0, b1):
        ae = [mp.extender.scale(Poly(ctx, NTT, c)) for c in (a0, a1)]
        be = [mp.extender.scale(Poly(ctx, NTT, c)) for c in (b0, b1)]
        c0 = ae[0] * be[0]
        c1 = (ae[0] * be[1]) + (ae[1] * be[0])
        c2 = ae[1] * be[1]
        return tuple(mp.down_scaler.scale(c).coeffs for c in (c0, c1, c2))
    timeit(jax.jit(downscale), (a0, a1, b0, b1), label="stage3: extend+tensor+downscale")

    def full(a0, a1, b0, b1):
        ae = [mp.extender.scale(Poly(ctx, NTT, c)) for c in (a0, a1)]
        be = [mp.extender.scale(Poly(ctx, NTT, c)) for c in (b0, b1)]
        c0 = ae[0] * be[0]
        c1 = (ae[0] * be[1]) + (ae[1] * be[0])
        c2 = ae[1] * be[1]
        c0, c1, c2 = (mp.down_scaler.scale(c) for c in (c0, c1, c2))
        ks0, ks1 = ksk.key_switch(c2.into_power_basis())
        return (c0 + ks0).coeffs, (c1 + ks1).coeffs
    timeit(jax.jit(full), (a0, a1, b0, b1), label="stage4: FULL")


if __name__ == "__main__":
    main()
