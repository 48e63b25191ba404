"""MXU four-step NTT vs Pallas butterfly NTT, chained single-program timing.

Same methodology as kbench.py: `reps` chained applications inside one jit
program, warm-up and timed runs on distinct inputs, completion forced by a
device->host fetch.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benches.kbench import prog_time  # noqa: E402


def main():
    import jax

    cache_dir = os.path.expanduser("~/.cache/tpufhe_jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpufhe.bfv import BfvParametersBuilder
    from tpufhe.ops.ntt_mxu import MxuNttPlan, backward_mxu, forward_mxu
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

    plan = MxuNttPlan.new(ctx7.ops)
    tabs_f = ctx7.dev.stage_tables(False)
    tabs_b = ctx7.dev.stage_tables(True)
    scal = ctx7.dev.limb_scalars()

    prog_time(lambda v: ntt_pallas(v, tabs_f, scal),
              xs, label=f"pallas fwd NTT (B={batch},k={k})")
    prog_time(lambda v: forward_mxu(v, plan),
              xs, label=f"mxu    fwd NTT (B={batch},k={k})")
    prog_time(lambda v: ntt_pallas(v, tabs_b, scal, inverse=True),
              xs, label=f"pallas inv NTT (B={batch},k={k})")
    prog_time(lambda v: backward_mxu(v, plan),
              xs, label=f"mxu    inv NTT (B={batch},k={k})")


if __name__ == "__main__":
    main()
