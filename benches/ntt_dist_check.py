"""N=16384 cross-chip NTT parity check at full XLA optimization.

The pytest suite pins --xla_backend_optimization_level=0 for compile
speed, which makes the int8 einsums naive (minutes per transform at
N=16384). This standalone script runs the same bit-exactness check with
default optimization on the 8-virtual-device CPU mesh; output is recorded
in benches/logs/ntt_dist_16384.log.

Usage: python benches/ntt_dist_check.py [N] [n_limbs]
"""

from __future__ import annotations

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
os.environ["XLA_FLAGS"] = flags.strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from tpufhe.ops import ntt_mxu, rq
    from tpufhe.parallel.ntt_dist import DistNtt

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    moduli = [0x3FFFFFFF000001, 4611686018326724609, 1152921504606584833][:k]

    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:8]), ("seq",))
    ctx = rq.Context(tuple(moduli), n)
    t0 = time.time()
    dist = DistNtt(ctx, mesh)
    print(f"plan built in {time.time()-t0:.1f}s (n1={dist.plan.n1}, "
          f"blk={dist.plan.n1 // 8})")

    rng = np.random.default_rng(3)
    vals = np.stack(
        [rng.integers(0, p, size=n, dtype=np.uint64) for p in moduli]
    )
    lo = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (vals >> np.uint64(32)).astype(np.uint32)
    a = np.stack([lo, hi], axis=1).reshape(k, 2, n // 128, 128)

    t0 = time.time()
    want_f = np.asarray(ntt_mxu.forward_mxu(a, dist.plan))
    print(f"single-device forward: {time.time()-t0:.1f}s")

    a_sh = jax.device_put(a, dist.sharding(0))
    t0 = time.time()
    got_f = np.asarray(dist.forward(a_sh))
    print(f"distributed forward (8 shards, 1 all_to_all): "
          f"{time.time()-t0:.1f}s")
    assert np.array_equal(got_f, want_f), "forward mismatch"

    b_sh = jax.device_put(want_f, dist.sharding(0))
    t0 = time.time()
    got_b = np.asarray(dist.backward(b_sh))
    print(f"distributed backward: {time.time()-t0:.1f}s")
    want_b = np.asarray(ntt_mxu.backward_mxu(want_f, dist.plan))
    assert np.array_equal(got_b, want_b), "backward mismatch"
    # round trip recovers the input (canonical residues)
    assert np.array_equal(got_b, a), "roundtrip mismatch"
    print(f"ntt_dist N={n} k={k}: bit-exact vs single-device (fwd+bwd) OK")


if __name__ == "__main__":
    main()
