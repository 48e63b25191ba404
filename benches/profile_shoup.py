"""Why is mul_shoup slow? Isolate: broadcast vs layout vs the op itself."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain(fn, x, iters=20, label=""):
    import jax

    y = fn(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:56s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser("~/.cache/tpufhe_jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpufhe.bfv import BfvParametersBuilder
    from tpufhe.ops import u64, zq
    from tpufhe.ops.rq import _exp2

    degree, n_limbs, batch = 8192, 3, 16
    par = (
        BfvParametersBuilder()
        .set_degree(degree)
        .set_plaintext_modulus(1153)
        .set_moduli_sizes([62] * n_limbs)
        .build()
    )
    ctx = par.context_at_level(0)
    d = ctx.dev
    p = _exp2(d.p)

    nprng = np.random.default_rng(0)

    def rand_arr(b):
        mat = np.stack(
            [nprng.integers(0, m, size=(b, degree), dtype=np.uint64)
             for m in ctx.moduli], axis=1)
        lo = (mat & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi = (mat >> np.uint64(32)).astype(np.uint32)
        return jax.device_put(np.stack([lo, hi], axis=2))

    x = rand_arr(batch)            # (16, 3, 2, 8192)
    b_small = rand_arr(1)[0]       # (3, 2, 8192)
    b_big = rand_arr(batch)        # (16, 3, 2, 8192)

    def pairs(a):
        return (a[..., 0, :], a[..., 1, :])

    def stack(r):
        return jnp.stack([r[0], r[1]], axis=-2)

    # 1. full-batch b (no broadcast)
    f1 = jax.jit(lambda a, b: stack(zq.mul_shoup(pairs(a), pairs(b), pairs(b), p)))
    chain(lambda a: f1(a, b_big), x, label="mul_shoup, b full batch (16,3,2,N)")

    # 2. broadcast b (3,2,N)
    chain(lambda a: f1(a, b_small), x, label="mul_shoup, b broadcast (3,2,N)")

    # 3. lazy only (no reduce1), full batch
    f3 = jax.jit(
        lambda a, b: stack(zq.lazy_mul_shoup(pairs(a), pairs(b), pairs(b), p)))
    chain(lambda a: f3(a, b_big), x, label="lazy_mul_shoup only, full batch")

    # 4. mulhi64 alone
    f4 = jax.jit(lambda a, b: stack(u64.mulhi64(pairs(a), pairs(b))))
    chain(lambda a: f4(a, b_big), x, label="mulhi64 alone, full batch")

    # 5. mul64_lo alone
    f5 = jax.jit(lambda a, b: stack(u64.mul64_lo(pairs(a), pairs(b))))
    chain(lambda a: f5(a, b_big), x, label="mul64_lo alone, full batch")

    # 6. reduce1 alone
    f6 = jax.jit(lambda a: stack(zq.reduce1(pairs(a), p)))
    chain(f6, x, label="reduce1 alone")

    # 7. barrett mul for comparison at k=3
    bl, bh = _exp2(d.barrett_lo), _exp2(d.barrett_hi)
    f7 = jax.jit(lambda a: stack(zq.mul_mod(pairs(a), pairs(a), bl, bh, p)))
    chain(f7, x, label="barrett mul_mod(a,a) k=3")

    # 8. barrett mul two-operand
    f8 = jax.jit(lambda a, b: stack(zq.mul_mod(pairs(a), pairs(b), bl, bh, p)))
    chain(lambda a: f8(a, b_big), x, label="barrett mul_mod(a,b) k=3 full batch")


if __name__ == "__main__":
    main()
