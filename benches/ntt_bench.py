"""NTT micro-benchmark: XLA-graph path vs fused Pallas kernel.

Usage: python benches/ntt_bench.py [degree] [limbs] [batch]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, iters=20):
    """Chained timing: each iteration consumes the previous output so the
    runtime cannot elide or dedupe repeated identical executions."""
    import jax

    x, rest = args[0], tuple(args[1:])
    out = fn(x, *rest)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out, *rest)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax

    cache_dir = os.path.expanduser("~/.cache/tpufhe_jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpufhe.ops import rq as rq_mod
    from tpufhe.ops.pallas.ntt_kernel import build_limb_scalars, build_stage_tables, ntt_pallas
    from tpufhe.ops.rq import Context, pack_u64
    from tpufhe.utils.primes import generate_prime

    degree = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    n_limbs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    moduli = []
    ub = 1 << 62
    while len(moduli) < n_limbs:
        ub = generate_prime(62, 2 * degree, ub)
        moduli.append(ub)
    ctx = Context(tuple(moduli), degree)
    print(f"backend={jax.devices()[0].platform} degree={degree} "
          f"limbs={n_limbs} batch={batch}")

    nprng = np.random.default_rng(0)
    mat = np.stack(
        [nprng.integers(0, m, size=(batch, degree), dtype=np.uint64)
         for m in ctx.moduli],
        axis=1,
    )
    x = jax.device_put(pack_u64(mat))

    n_transforms = batch * n_limbs

    fwd = rq_mod._fwd_fn(ctx, False)
    t = timeit(fwd, (x,))
    print(f"xla fwd    {t*1e6/n_transforms:9.2f} us/limb-ntt "
          f"({t*1e3:.3f} ms/batch)")

    tables = jax.device_put(ctx.dev.stage_tables(False))
    scalars = jax.device_put(build_limb_scalars(ctx.ops))

    def pallas_fwd(xx, tt):
        return ntt_pallas(xx, tt, scalars)

    pallas_fwd = jax.jit(pallas_fwd)
    # parity check on device
    out_p = np.asarray(pallas_fwd(x, tables))
    out_x = np.asarray(fwd(x))
    assert (out_p == out_x).all(), "pallas/XLA NTT mismatch!"
    t = timeit(pallas_fwd, (x, tables))
    print(f"pallas fwd {t*1e6/n_transforms:9.2f} us/limb-ntt "
          f"({t*1e3:.3f} ms/batch)")

    tables_b = jax.device_put(ctx.dev.stage_tables(True))
    bwd = rq_mod._bwd_fn(ctx)
    t = timeit(bwd, (x,))
    print(f"xla bwd    {t*1e6/n_transforms:9.2f} us/limb-ntt "
          f"({t*1e3:.3f} ms/batch)")

    def pallas_bwd(xx, tt):
        return ntt_pallas(xx, tt, scalars, inverse=True)

    pallas_bwd = jax.jit(pallas_bwd)
    out_p = np.asarray(pallas_bwd(x, tables_b))
    out_x = np.asarray(bwd(x))
    assert (out_p == out_x).all(), "pallas/XLA iNTT mismatch!"
    t = timeit(pallas_bwd, (x, tables_b))
    print(f"pallas bwd {t*1e6/n_transforms:9.2f} us/limb-ntt "
          f"({t*1e3:.3f} ms/batch)")


if __name__ == "__main__":
    main()
