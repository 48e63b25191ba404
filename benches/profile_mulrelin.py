"""Per-component wall-clock breakdown of the mul+relin pipeline on TPU.

Times each jitted stage of the north-star op (extend, tensor, down-scale,
key-switch, and the raw NTT/iNTT/rns_scale primitives) at the bench config
so optimization effort goes where the time is.
"""

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
    print(f"{label:42s} {dt*1e3:9.3f} ms")
    return dt


def main():
    import jax

    cache_dir = os.path.expanduser("~/.cache/tpufhe_jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpufhe.bfv import BfvParametersBuilder, RelinearizationKey, SecretKey
    from tpufhe.ops.rq import NTT, Poly, _bwd_fn, _fwd_fn, _binop_fn
    from tpufhe.pipeline import make_mul_relin
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
    print(f"config: N={degree} k={ctx.k} k_mul={ctx_mul.k} batch={batch}")

    nprng = np.random.default_rng(0)

    def rand_arr(c, b):
        mat = np.stack(
            [nprng.integers(0, m, size=(b, degree), dtype=np.uint64)
             for m in c.moduli], axis=1)
        lo = (mat & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi = (mat >> np.uint64(32)).astype(np.uint32)
        return jax.device_put(np.stack([lo, hi], axis=2))

    x3 = rand_arr(ctx, batch)
    x7 = rand_arr(ctx_mul, batch)

    timeit(_fwd_fn(ctx, False), (x3,), label=f"fwd NTT k={ctx.k}")
    timeit(_bwd_fn(ctx), (x3,), label=f"inv NTT k={ctx.k}")
    timeit(_fwd_fn(ctx_mul, False), (x7,), label=f"fwd NTT k={ctx_mul.k}")
    timeit(_bwd_fn(ctx_mul), (x7,), label=f"inv NTT k={ctx_mul.k}")
    timeit(_binop_fn(ctx_mul, "mul"), (x7, x7), label=f"pointwise barrett mul k={ctx_mul.k}")

    ext = jax.jit(lambda c: mp.extender.scale(Poly(ctx, NTT, c)).coeffs)
    timeit(ext, (x3,), label="extender.scale (iNTT+rns+NTT)")

    rns_only = jax.jit(
        lambda c: mp.extender.rns_scaler.scale(
            c, starting_index=ctx.k, size=ctx_mul.k - ctx.k))
    timeit(rns_only, (x3,), label="  rns_scaler.scale 3->4 alone")

    down = jax.jit(lambda c: mp.down_scaler.scale(Poly(ctx_mul, NTT, c)).coeffs)
    timeit(down, (x7,), label="down_scaler.scale (iNTT+rns+NTT)")

    rns_down = jax.jit(
        lambda c: mp.down_scaler.rns_scaler.scale(c, starting_index=0, size=ctx.k))
    timeit(rns_down, (x7,), label="  rns_scaler.scale 7->3 alone")

    ksk = rk.ksk
    ks = jax.jit(
        lambda c: tuple(p.coeffs for p in ksk.key_switch(Poly(ctx, "power", c))))
    timeit(ks, (x3,), label="ksk.key_switch (3 lifts + acc)")

    full = make_mul_relin(par, rk)
    a0, a1, b0, b1 = x3, rand_arr(ctx, batch), rand_arr(ctx, batch), rand_arr(ctx, batch)
    dt = timeit(full, (a0, a1, b0, b1), label="FULL mul+relin")
    print(f"throughput: {batch/dt:.1f} op/s/chip")


if __name__ == "__main__":
    main()
