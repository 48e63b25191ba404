"""Benchmark: batched BFV ciphertext multiply+relinearize throughput.

Tracked config #3 of BASELINE.md: N=8192, L=3 RNS limbs (62-bit), the
north-star metric. Runs the fused jitted pipeline (tpufhe.pipeline) on
whatever accelerator JAX provides (the real TPU chip under the driver).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "...", "vs_baseline": N}

vs_baseline: the north star is 1e6 mul+relin/s on a v5p-16 (16 chips),
i.e. 62500 ops/s/chip; vs_baseline = measured_per_chip / 62500.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")
import numpy as np


def main():
    import jax

    cache_dir = os.path.expanduser("~/.cache/tpufhe_jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpufhe.bfv import BfvParametersBuilder, RelinearizationKey, SecretKey
    from tpufhe.ops.rq import pack_u64
    from tpufhe.pipeline import make_mul_relin
    from tpufhe.utils.rngs import ChaCha8Rng, seed_from_u64

    degree = int(os.environ.get("BENCH_DEGREE", 8192))
    limb_bits = int(os.environ.get("BENCH_LIMB_BITS", 62))
    # same log q as the 3x62-bit reference config when narrow limbs are used
    default_limbs = 3 if limb_bits > 30 else -((-62 * 3) // limb_bits)
    n_limbs = int(os.environ.get("BENCH_LIMBS", default_limbs))
    batch = int(os.environ.get("BENCH_BATCH", 16))
    iters = int(os.environ.get("BENCH_ITERS", 10))

    par = (
        BfvParametersBuilder()
        .set_degree(degree)
        .set_plaintext_modulus(1153)
        .set_moduli_sizes([limb_bits] * n_limbs)
        .build()
    )
    rng = ChaCha8Rng(seed_from_u64(42))
    sk = SecretKey.random(par, rng)
    rk = RelinearizationKey.new(sk, rng)
    fn = make_mul_relin(par, rk)

    ctx = par.context_at_level(0)
    nprng = np.random.default_rng(0)
    arrs = []
    for _ in range(4):
        mat = np.stack(
            [
                nprng.integers(0, m, size=(batch, degree), dtype=np.uint64)
                for m in ctx.moduli
            ],
            axis=1,
        )
        packed = pack_u64(mat)
        if ctx.narrow:
            packed = packed[..., :1, :, :]
        arrs.append(jax.device_put(packed))

    # warmup / compile
    out = fn(*arrs)
    jax.block_until_ready(out)
    arrs = [out[0], out[1], arrs[2], arrs[3]]

    # chained iterations: outputs feed the next call so the runtime cannot
    # elide repeated identical executions
    t0 = time.perf_counter()
    a0, a1, b0, b1 = arrs
    for _ in range(iters):
        a0, a1 = fn(a0, a1, b0, b1)
    jax.block_until_ready((a0, a1))
    dt = time.perf_counter() - t0

    ops_per_s = batch * iters / dt
    target_per_chip = 1e6 / 16  # north star spread over a v5p-16
    print(
        json.dumps(
            {
                "metric": (
                    f"bfv_mul_relin_ops_per_s_per_chip_n{degree}"
                    f"_l{n_limbs}x{limb_bits}b"
                ),
                "value": round(ops_per_s, 3),
                "unit": "ciphertext_mul+relin/s/chip",
                "vs_baseline": round(ops_per_s / target_per_chip, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
