"""Trustworthy kernel microbenches: N chained calls inside ONE jit program.

The remote runtime memoizes repeated executions of an executable, so only
single-program wall times are meaningful. Each measurement compiles a
program that applies the kernel `reps` times back-to-back (data-dependent
chain) and reports (wall - overhead) / reps.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def prog_time(fn, xs, label="", reps=16):
    """Wall time of one program applying fn `reps` times, per-application.

    xs: list of >= 2 pre-staged device inputs; the warm-up and the timed run
    use different ones so the runtime's execution memoization cannot hit,
    and no host<->device transfer lands inside the timed region.
    """
    import jax

    @jax.jit
    def prog(x):
        for _ in range(reps):
            x = fn(x)
        return x

    def sync(y):
        # block_until_ready does not truly synchronize on the tunneled
        # runtime; a (tiny) data fetch does.
        leaf = jax.tree_util.tree_leaves(y)[0]
        np.asarray(leaf.ravel()[0])

    y = prog(xs[0])
    sync(y)
    t0 = time.perf_counter()
    y = prog(xs[1])
    sync(y)
    dt = time.perf_counter() - t0
    print(f"{label:52s} {dt/reps*1e3:9.3f} ms/apply  ({dt*1e3:7.1f} ms prog)",
          flush=True)
    return dt / reps


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser("~/.cache/tpufhe_jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpufhe.bfv import BfvParametersBuilder
    from tpufhe.ops.pallas.ntt_kernel import ntt_pallas
    from tpufhe.ops.rq import pack_u64

    degree = int(os.environ.get("BENCH_DEGREE", 8192))
    batch = int(os.environ.get("BENCH_BATCH", 48))

    par = (
        BfvParametersBuilder()
        .set_degree(degree)
        .set_plaintext_modulus(1153)
        .set_moduli_sizes([62, 62, 62])
        .build()
    )
    lvl = par.context_level_at(0)
    ctx = lvl.poly_context
    ctx7 = lvl.mul_params().extender.to_ctx
    k = ctx7.k

    nprng = np.random.default_rng(0)
    def mk():
        mat = np.stack(
            [nprng.integers(0, m, size=(batch, degree), dtype=np.uint64)
             for m in ctx7.moduli], axis=1)
        return jax.device_put(pack_u64(mat))

    xs = [mk(), mk()]
    print(f"N={degree} k={k} batch={batch}")

    tabs_f = ctx7.dev.stage_tables(False)
    tabs_b = ctx7.dev.stage_tables(True)
    scal = ctx7.dev.limb_scalars()

    prog_time(lambda v: ntt_pallas(v, tabs_f, scal),
              xs, label=f"pallas fwd NTT (B={batch},k={k})")
    prog_time(lambda v: ntt_pallas(v, tabs_b, scal, inverse=True),
              xs, label=f"pallas inv NTT (B={batch},k={k})")

    # rns scale down (k -> 3) with concat to keep the chain shape-stable
    sc = lvl.mul_params().down_scaler.rns_scaler

    def rns_chain(v):
        out = sc.scale(v, starting_index=0, size=3)
        reps = [out] * (k // 3) + [out[..., : k % 3, :, :, :]]
        return jnp.concatenate(reps, axis=-4)

    prog_time(rns_chain, xs, label=f"rns_scale {k}->3 + concat (B={batch})",
              reps=8)

    # extend rns 3 -> 4 (factor 1)
    sc2 = lvl.mul_params().extender.rns_scaler

    def rns2_chain(v):
        out = sc2.scale(v[..., :3, :, :, :], starting_index=3, size=4)
        return jnp.concatenate([out, out[..., :3, :, :, :]], axis=-4)

    prog_time(rns2_chain, xs, label=f"rns_scale 3->4 + concat (B={batch})",
              reps=8)

    # pointwise barrett mul
    from tpufhe.ops import zq
    from tpufhe.ops.rq import _exp2, _pl, _st
    d = ctx7.dev
    p = _exp2(d.p)
    bl, bh = _exp2(d.barrett_lo), _exp2(d.barrett_hi)

    def mul_chain(v):
        r = zq.mul_mod(_pl(v), _pl(v), bl, bh, p)
        return _st(r)

    prog_time(mul_chain, xs, label=f"barrett mul (B={batch},k={k})")


if __name__ == "__main__":
    main()
