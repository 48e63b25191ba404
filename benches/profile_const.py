"""A/B: closure-captured constants (numpy vs jax.Array) vs explicit args."""

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
    from tpufhe.ops import zq
    from tpufhe.ops.rq import _exp2, _mul_shoup_fn

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

    def rand_np(b):
        mat = np.stack(
            [nprng.integers(0, m, size=(b, degree), dtype=np.uint64)
             for m in ctx.moduli], axis=1)
        lo = (mat & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi = (mat >> np.uint64(32)).astype(np.uint32)
        return np.stack([lo, hi], axis=2)

    x = jax.device_put(rand_np(batch))
    b_np = rand_np(1)[0]                  # numpy (3, 2, N)
    b_dev = jax.device_put(b_np)          # jax.Array (3, 2, N)

    def pairs(a):
        return (a[..., 0, :], a[..., 1, :])

    def stack(r):
        return jnp.stack([r[0], r[1]], axis=-2)

    # A: numpy constants captured in closure
    fA = jax.jit(lambda a: stack(zq.mul_shoup(pairs(a), pairs(b_np), pairs(b_np), p)))
    chain(fA, x, label="A mul_shoup, b = captured NUMPY const")

    # B: jax.Array constants captured in closure
    fB = jax.jit(lambda a: stack(zq.mul_shoup(pairs(a), pairs(b_dev), pairs(b_dev), p)))
    chain(fB, x, label="B mul_shoup, b = captured JAX ARRAY const")

    # C: explicit args
    fC = jax.jit(lambda a, b: stack(zq.mul_shoup(pairs(a), pairs(b), pairs(b), p)))
    chain(lambda a: fC(a, b_dev), x, label="C mul_shoup, b = explicit arg")

    # D: the exact _mul_shoup_fn path from rq.py, nested jit + jax consts
    msf = _mul_shoup_fn(ctx, False)
    fD = jax.jit(lambda a: msf(a, b_dev, b_dev))
    chain(fD, x, label="D nested-jit msf, b = captured JAX ARRAY")

    # E: nested jit with numpy consts
    fE = jax.jit(lambda a: msf(a, b_np, b_np))
    chain(fE, x, label="E nested-jit msf, b = captured NUMPY")

    # F: direct call of msf with args (no outer jit)
    chain(lambda a: msf(a, b_dev, b_dev), x, label="F msf direct, b = args")


if __name__ == "__main__":
    main()
