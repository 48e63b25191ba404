"""Sequence-sharded mul+relin at N=2048/k=3 over 8 shards, decrypt-checked
(VERDICT r3 item 7: one notch past the N=512 toy point).

Run with the canonical CPU-mesh env — the harness sitecustomize pre-imports
jax in every process, so the flags must be in the environment AT SPAWN:

    cd /root/repo && env -u PYTHONPATH JAX_PLATFORMS=cpu \
      XLA_FLAGS="$(python -c 'from tpufhe.hostflags import \
cpu_mesh_xla_flags; print(cpu_mesh_xla_flags(8))')" \
      nice -n 10 python benches/seq2048_check.py

Cold compile is expected to take hours on this 1-core host (the N=1024
seq config took ~3 h in round 3); the persistent cache makes reruns and
future-round regression checks cheap.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
cache = os.path.expanduser("~/.cache/tpufhe_jax")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
from jax.sharding import Mesh

from tpufhe.bfv import (
    BfvParametersBuilder,
    Ciphertext,
    Encoding,
    Plaintext,
    RelinearizationKey,
    SecretKey,
)
from tpufhe.ops.rq import NTT, Poly
from tpufhe.parallel.seq_pipeline import make_seq_sharded_mul_relin
from tpufhe.utils.rngs import ChaCha8Rng, seed_from_u64

N = 2048
K = 3
BATCH = 2
SHARDS = 8

RNG = np.random.default_rng(20480)

par = (
    BfvParametersBuilder()
    .set_degree(N)
    .set_plaintext_modulus(12289)  # 12289 = 1 mod 4096: SIMD-capable
    .set_moduli_sizes([62] * K)
    .build()
)
r = ChaCha8Rng(seed_from_u64(11))
sk = SecretKey.random(par, r)
rk = RelinearizationKey.new(sk, r)
t = par.plaintext.value

print(f"[seq2048] devices={len(jax.devices())} "
      f"XLA_FLAGS={os.environ.get('XLA_FLAGS', '')!r}", flush=True)
assert len(jax.devices()) >= SHARDS

vas, vbs, cts = [], [], []
with jax.disable_jit():  # cheap eager encrypt; avoids two big compiles
    for _ in range(BATCH):
        va = RNG.integers(0, t, size=N, dtype=np.uint64)
        vb = RNG.integers(0, t, size=N, dtype=np.uint64)
        ca = sk.try_encrypt(Plaintext.try_encode(va, Encoding.simd(), par), r)
        cb = sk.try_encrypt(Plaintext.try_encode(vb, Encoding.simd(), par), r)
        vas.append(va)
        vbs.append(vb)
        cts.append((ca, cb))
arrs = [
    np.stack([np.asarray(pair[i // 2][i % 2].coeffs) for pair in cts])
    for i in range(4)
]
print("[seq2048] inputs ready; compiling the sharded program "
      "(hours if cold)...", flush=True)

mesh = Mesh(np.array(jax.devices()[:SHARDS]).reshape(SHARDS), ("seq",))
seq_fn = make_seq_sharded_mul_relin(par, rk, mesh)
t0 = time.time()
s0, s1 = seq_fn(*arrs)
jax.block_until_ready((s0, s1))
print(f"[seq2048] compile+run took {time.time() - t0:.1f} s", flush=True)

ctx = par.context_at_level(0)
with jax.disable_jit():
    for i in range(BATCH):
        ct = Ciphertext(
            par,
            [Poly(ctx, NTT, np.asarray(s0)[i]),
             Poly(ctx, NTT, np.asarray(s1)[i])],
            0,
        )
        noise = sk.measure_noise(ct)
        print(f"[seq2048] ct{i} noise: {noise} bits", flush=True)
        assert noise < 110, f"noise {noise} bits exceeds budget"
        got = np.asarray(sk.try_decrypt(ct).try_decode(Encoding.simd()))
        want = (vas[i].astype(object) * vbs[i].astype(object)) % t
        np.testing.assert_array_equal(got, want.astype(np.uint64))
print(f"SEQ2048_OK: N={N} k={K} shards={SHARDS} batch={BATCH} "
      "decrypt-checked", flush=True)
