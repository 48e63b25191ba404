"""Micro-benchmarks of the hot kernels on the current JAX backend.

Usage: python benches/micro.py [degree] [limbs] [batch]
Prints per-op timings: NTT forward/backward, pointwise Shoup mul,
RNS scale (extend), full mul+relin.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, iters=20, chain=True):
    """Chained timing where shapes allow: feed outputs back as inputs so the
    runtime cannot elide repeated identical executions."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    cur = args
    for _ in range(iters):
        out = fn(*cur)
        if chain:
            outs = out if isinstance(out, tuple) else (out,)
            cur = tuple(
                o if (hasattr(o, "shape") and o.shape == a.shape) else a
                for o, a in zip(list(outs) * len(cur), cur)
            )
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax

    cache_dir = os.path.expanduser("~/.cache/tpufhe_jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpufhe.bfv import BfvParametersBuilder, RelinearizationKey, SecretKey
    from tpufhe.ops import rq as rq_mod
    from tpufhe.ops.rq import NTT, Poly
    from tpufhe.pipeline import make_mul_relin
    from tpufhe.utils.rngs import ChaCha8Rng, seed_from_u64

    degree = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_limbs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    par = (
        BfvParametersBuilder()
        .set_degree(degree)
        .set_plaintext_modulus(1153)
        .set_moduli_sizes([62] * n_limbs)
        .build()
    )
    ctx = par.context_at_level(0)
    print(f"backend={jax.devices()[0].platform} degree={degree} "
          f"limbs={n_limbs} batch={batch}")

    nprng = np.random.default_rng(0)

    def rand_arr():
        mat = np.stack(
            [nprng.integers(0, m, size=(batch, degree), dtype=np.uint64)
             for m in ctx.moduli],
            axis=1,
        )
        from tpufhe.ops.rq import pack_u64
        return jax.device_put(pack_u64(mat))

    a = rand_arr()
    b = rand_arr()

    fwd = rq_mod._fwd_fn(ctx, False)
    bwd = rq_mod._bwd_fn(ctx)
    mul = rq_mod._binop_fn(ctx, "mul")
    add = rq_mod._binop_fn(ctx, "add")

    t = timeit(fwd, (a,))
    print(f"ntt_fwd     {t*1e6/batch:10.2f} us/ct  ({t*1e3:.3f} ms/batch)")
    t = timeit(bwd, (a,))
    print(f"ntt_bwd     {t*1e6/batch:10.2f} us/ct  ({t*1e3:.3f} ms/batch)")
    t = timeit(mul, (a, b))
    print(f"pw_mul      {t*1e6/batch:10.2f} us/ct  ({t*1e3:.3f} ms/batch)")
    t = timeit(add, (a, b))
    print(f"pw_add      {t*1e6/batch:10.2f} us/ct  ({t*1e3:.3f} ms/batch)")

    # extend scaler (the ct-mul hot path)
    mp = par.context_level_at(0).mul_params()

    @jax.jit
    def extend(x):
        return mp.extender.scale(Poly(ctx, NTT, x)).coeffs

    t = timeit(extend, (a,))
    print(f"extend      {t*1e6/batch:10.2f} us/ct  ({t*1e3:.3f} ms/batch)")

    rng = ChaCha8Rng(seed_from_u64(9))
    sk = SecretKey.random(par, rng)
    rk = RelinearizationKey.new(sk, rng)
    fn = make_mul_relin(par, rk)
    t = timeit(fn, (a, a, b, b), iters=5)
    print(f"mul_relin   {t*1e6/batch:10.2f} us/ct  ({t*1e3:.3f} ms/batch)")
    print(f"mul_relin throughput: {batch/t:.1f} ops/s")


if __name__ == "__main__":
    main()
