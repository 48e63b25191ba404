"""Capture an xplane trace of the full mul+relin and print top device ops."""

from __future__ import annotations

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/tpufhe_trace"


def main():
    import jax

    cache_dir = os.path.expanduser("~/.cache/tpufhe_jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpufhe.bfv import BfvParametersBuilder, RelinearizationKey, SecretKey
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
    s2 = int(os.environ.get("TPUFHE_TRACE_S2", "0")) or None
    fn = make_mul_relin(par, rk, strategy2_primes=s2)

    from tpufhe.ops.rq import pack_u64

    ctx = par.context_at_level(0)
    nprng = np.random.default_rng(0)
    arrs = []
    for _ in range(4):
        mat = np.stack(
            [nprng.integers(0, m, size=(batch, degree), dtype=np.uint64)
             for m in ctx.moduli], axis=1)
        arrs.append(jax.device_put(pack_u64(mat)))

    a0, a1, b0, b1 = arrs
    out = fn(a0, a1, b0, b1)
    jax.block_until_ready(out)

    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        x0, x1 = a0, a1
        for _ in range(5):
            x0, x1 = fn(x0, x1, b0, b1)
        jax.block_until_ready((x0, x1))

    # find the xplane file and dump the op profile
    planes = glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                       recursive=True)
    planes.sort(key=os.path.getmtime)
    print("xplane:", planes[-1] if planes else None)
    if planes:
        dump_top_ops(planes[-1])


def dump_top_ops(path, top=40):
    """Aggregate per-op device time from an xplane capture."""
    from collections import defaultdict

    from jax.profiler import ProfileData

    data = ProfileData.from_file(path)
    for plane in data.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        agg = defaultdict(float)
        count = defaultdict(int)
        total = 0.0
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Ops" not in line.name:
                continue
            for ev in line.events:
                agg[ev.name] += ev.duration_ns
                count[ev.name] += 1
                total += ev.duration_ns
        if not agg:
            continue
        print(f"\n== plane: {plane.name} (total {total/1e6:.2f} ms) ==")
        for name, ns in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{ns/1e6:9.3f} ms {100*ns/max(total,1):5.1f}% "
                  f"x{count[name]:<5d} {name[:90]}")


if __name__ == "__main__":
    main()
