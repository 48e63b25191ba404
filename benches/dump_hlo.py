"""Dump the optimized HLO of the headline mul+relin program.

Prints the instructions around async slice/copy ops so the per-execution
constant-staging cost seen in the xplane traces can be attributed to
concrete HLO (producers/consumers, layouts, memory spaces).
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    n_limbs = int(os.environ.get("BENCH_LIMBS", 3))
    batch = int(os.environ.get("BENCH_BATCH", 64))

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
    fn = make_mul_relin(par, rk)

    ctx = par.context_at_level(0)
    nprng = np.random.default_rng(0)
    arrs = []
    for _ in range(4):
        mat = np.stack(
            [nprng.integers(0, m, size=(batch, degree), dtype=np.uint64)
             for m in ctx.moduli], axis=1)
        arrs.append(pack_u64(mat))

    compiled = jax.jit(fn).lower(*arrs).compile()
    text = compiled.as_text()
    out = os.environ.get("HLO_OUT", "/tmp/mul_relin_hlo.txt")
    with open(out, "w") as f:
        f.write(text)
    print(f"HLO written: {out} ({len(text.splitlines())} lines)")

    # print every async slice/copy with its operand source
    pat = re.compile(r"%?(slice-start|copy-start|dynamic-slice-start)")
    for line in text.splitlines():
        if pat.search(line):
            print(line.strip()[:240])


if __name__ == "__main__":
    main()
