"""Butterfly-Pallas vs four-step-MXU NTT crossover (VERDICT r3 item 3a).

Chains `reps` forward transforms of each kernel inside one jit program
(kbench methodology: the tunneled runtime memoizes repeated executions,
and only single-program wall times are trustworthy). Caveat (CLAUDE.md):
standalone chained-kernel timings can mislead for mixed MXU/VPU code —
but the butterfly kernel is pure VPU and the four-step kernel today runs
its MXU and VPU stages serialized (ROOFLINE.md), so both standalone
numbers approximate their in-program costs; the pipeline-level
accept/reject stays bench.py.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kbench import prog_time  # noqa: E402  (same directory)


def main():
    import jax

    cache_dir = os.path.expanduser("~/.cache/tpufhe_jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpufhe.bfv import BfvParametersBuilder
    from tpufhe.ops.pallas.mxu_ntt_kernel import mxu4_pallas
    from tpufhe.ops.pallas.ntt_kernel import ntt_pallas
    from tpufhe.ops.rq import _mxu_b8_on, pack_u64

    degree = int(os.environ.get("BENCH_DEGREE", 8192))
    batch = int(os.environ.get("BENCH_BATCH", 48))

    par = (
        BfvParametersBuilder()
        .set_degree(degree)
        .set_plaintext_modulus(1153)
        .set_moduli_sizes([62, 62, 62])
        .build()
    )
    ctx = par.context_at_level(0)
    k = ctx.k

    nprng = np.random.default_rng(0)

    def mk():
        mat = np.stack(
            [nprng.integers(0, int(m), size=(batch, degree), dtype=np.uint64)
             for m in ctx.moduli], axis=1)
        return jax.device_put(pack_u64(mat))

    xs = [mk(), mk()]
    print(f"N={degree} k={k} batch={batch}")

    # butterfly kernel: log2(N) Harvey stages on the VPU, roll+select
    tabs_f = ctx.dev.stage_tables(False)
    scal = ctx.dev.limb_scalars()
    t_bf = prog_time(lambda v: ntt_pallas(v, tabs_f, scal),
                     xs, label=f"butterfly-Pallas fwd NTT (B={batch},k={k})")

    # four-step MXU kernel (canonical inputs < p: 8 balanced-byte planes)
    b8 = _mxu_b8_on()
    in_planes = 8 if b8 else 9
    consts = ctx.dev.mxu4_consts(slice(None), False, in_planes, b8)
    t_mxu = prog_time(lambda v: mxu4_pallas(v, consts, b8=b8),
                      xs, label=f"four-step-MXU fwd NTT (B={batch},k={k})")

    n_tr = batch * k
    print(f"butterfly: {t_bf/n_tr*1e6:8.2f} us/limb-transform")
    print(f"four-step: {t_mxu/n_tr*1e6:8.2f} us/limb-transform")
    print(f"ratio (butterfly/four-step): {t_bf/t_mxu:.2f}x")


if __name__ == "__main__":
    main()
