"""Does folding N into (S, 128) trailing dims speed up elementwise chains?"""

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
    from tpufhe.ops.rq import _exp2

    degree, n_limbs, batch = 8192, 7, 16
    par = (
        BfvParametersBuilder()
        .set_degree(8192)
        .set_plaintext_modulus(1153)
        .set_moduli_sizes([62, 62, 62])
        .build()
    )
    lvl = par.context_level_at(0)
    ctx7 = lvl.mul_params().extender.to_ctx
    d = ctx7.dev
    p = _exp2(d.p)
    bl, bh = _exp2(d.barrett_lo), _exp2(d.barrett_hi)
    # 5D consts: (k,1) -> (k,1,1)
    p5 = (p[0][..., None], p[1][..., None])
    bl5 = (bl[0][..., None], bl[1][..., None])
    bh5 = (bh[0][..., None], bh[1][..., None])

    nprng = np.random.default_rng(0)
    mat = np.stack(
        [nprng.integers(0, m, size=(batch, degree), dtype=np.uint64)
         for m in ctx7.moduli], axis=1)
    lo = (mat & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (mat >> np.uint64(32)).astype(np.uint32)
    x4 = jax.device_put(np.stack([lo, hi], axis=2))           # (B,k,2,N)
    x5 = jax.device_put(
        np.stack([lo, hi], axis=2).reshape(batch, 7, 2, 64, 128))

    def pairs4(a):
        return (a[..., 0, :], a[..., 1, :])

    def pairs5(a):
        return (a[..., 0, :, :], a[..., 1, :, :])

    def stack4(r):
        return jnp.stack([r[0], r[1]], axis=-2)

    def stack5(r):
        return jnp.stack([r[0], r[1]], axis=-3)

    f4 = jax.jit(lambda a: stack4(zq.mul_mod(pairs4(a), pairs4(a), bl, bh, p)))
    chain(f4, x4, label="mul_mod (B,k,2,N)")

    f5 = jax.jit(lambda a: stack5(zq.mul_mod(pairs5(a), pairs5(a), bl5, bh5, p5)))
    chain(f5, x5, label="mul_mod (B,k,2,S,128)")

    # a longer chain: 4 dependent barrett muls (more compute per byte)
    def chain4_4(a):
        r = pairs4(a)
        for _ in range(4):
            r = zq.mul_mod(r, r, bl, bh, p)
        return stack4(r)

    def chain4_5(a):
        r = pairs5(a)
        for _ in range(4):
            r = zq.mul_mod(r, r, bl5, bh5, p5)
        return stack5(r)

    chain(jax.jit(chain4_4), x4, label="4x mul_mod (B,k,2,N)")
    chain(jax.jit(chain4_5), x5, label="4x mul_mod (B,k,2,S,128)")

    # rns scale down 7->3, 4D vs 5D-transposed trick (B,S,k,2,128)
    sc = lvl.mul_params().down_scaler.rns_scaler

    def rns4(x):
        out = sc.scale(x, starting_index=0, size=3)
        return jnp.concatenate([out, out, out[..., :1, :, :]], axis=-3)

    chain(jax.jit(rns4), x4, label="rns_scale 7->3 (B,k,2,N)")

    xT = jax.device_put(
        np.transpose(np.stack([lo, hi], axis=2).reshape(batch, 7, 2, 64, 128),
                     (0, 3, 1, 2, 4)).copy())  # (B,S,k,2,128)

    def rnsT(x):
        out = sc.scale(x, starting_index=0, size=3)  # (B,S,3,2,128)
        return jnp.concatenate([out, out, out[..., :1, :, :]], axis=-3)

    chain(jax.jit(rnsT), xT, label="rns_scale 7->3 (B,S,k,2,128)")


if __name__ == "__main__":
    main()
