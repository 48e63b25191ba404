"""Honest (chained) timings of the core primitives on the TPU.

The remote runtime elides repeated identical executions, so every
measurement here feeds each iteration's output into the next call.
"""

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
    print(f"{label:52s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser("~/.cache/tpufhe_jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    print("default_backend:", jax.default_backend())
    print("devices:", jax.devices())

    from tpufhe.bfv import BfvParametersBuilder
    from tpufhe.ops import ntt as ntt_mod
    from tpufhe.ops.pallas.ntt_kernel import ntt_pallas
    from tpufhe.ops.rq import Context

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
    ctx_lvl = par.context_level_at(0)
    ctx = ctx_lvl.poly_context
    mp = ctx_lvl.mul_params()
    ctx_mul = mp.extender.to_ctx
    print(f"N={degree} k={ctx.k} k_mul={ctx_mul.k} batch={batch}")

    from tpufhe.ops.rq import _pallas_ok
    print("_pallas_ok(ctx):", _pallas_ok(ctx))

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

    # --- pallas NTT, chained (output < p feeds back) ---
    d = ctx.dev
    tab_f = d.stage_tables(False)
    scal = d.limb_scalars()
    pallas_fwd = jax.jit(lambda x: ntt_pallas(x, tab_f, scal))
    chain(pallas_fwd, x3, label=f"pallas fwd NTT k={ctx.k} (chained)")

    dm = ctx_mul.dev
    pallas_fwd7 = jax.jit(
        lambda x: ntt_pallas(x, dm.stage_tables(False), dm.limb_scalars()))
    chain(pallas_fwd7, x7, label=f"pallas fwd NTT k={ctx_mul.k} (chained)")

    # --- XLA NTT, chained ---
    xla_fwd = jax.jit(lambda x: ntt_mod.forward(
        x, d.omegas, d.omegas_shoup, d.p, (d.p2[0], d.p2[1])))
    chain(xla_fwd, x3, label=f"XLA fwd NTT k={ctx.k} (chained)")

    # --- pointwise barrett mul, chained (x = x*x mod p) ---
    from tpufhe.ops.rq import _binop_fn
    mulf = _binop_fn(ctx_mul, "mul")
    f = jax.jit(lambda x: mulf(x, x))
    chain(f, x7, label=f"pointwise barrett mul k={ctx_mul.k} (chained)")

    # --- rns_scaler 7->3, chained via concat trick (timing only) ---
    sc = mp.down_scaler.rns_scaler

    def rns_chain(x):
        out = sc.scale(x, starting_index=0, size=ctx.k)  # (B, 3, 2, N)
        return jnp.concatenate([out, out, out[..., :1, :, :]], axis=-3)

    chain(jax.jit(rns_chain), x7, label="rns_scale 7->3 (chained)")

    sc2 = mp.extender.rns_scaler

    def rns_chain2(x):
        out = sc2.scale(x[..., :3, :, :], starting_index=3, size=4)
        return jnp.concatenate([out, out[..., :3, :, :]], axis=-3)

    chain(jax.jit(rns_chain2), x7, label="rns_scale 3->4 (chained)")

    # --- shoup mul chained ---
    from tpufhe.ops.rq import _mul_shoup_fn
    msf = _mul_shoup_fn(ctx, False)
    ksk_like0 = rand_arr(ctx, 1)[0]
    ksk_like1 = rand_arr(ctx, 1)[0]
    f = jax.jit(lambda x: msf(x, ksk_like0, ksk_like1))
    chain(f, x3, label=f"shoup mul k={ctx.k} (chained)")

    # --- switch_down chained ---
    from tpufhe.ops.rq import _switch_down_fn
    sdf = _switch_down_fn(ctx_mul)

    def sd_chain(x):
        out = sdf(x)  # (B, 6, 2, N)
        return jnp.concatenate([out, out[..., :1, :, :]], axis=-3)

    chain(jax.jit(sd_chain), x7, label="switch_down k=7 (chained)")


if __name__ == "__main__":
    main()
