"""End-to-end on-chip verification drive (.claude/skills/verify recipe).

encrypt -> fused mul+relin -> decrypt at the headline config
(N=8192, t=65537, 3x62-bit) on the live accelerator, checking
  - SIMD decode of the product equals (va * vb) mod t elementwise,
  - noise growth is in the expected band (fresh ~4 bits, product ~72).
Prints VERIFY OK / VERIFY FAIL as the last line. Wrap in `timeout 900`
(first compile ~30-60 s, first device->host fetch ~30-50 s).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "")
import numpy as np


def main():
    import jax

    cache = os.path.expanduser("~/.cache/tpufhe_jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpufhe.bfv import (
        BfvParametersBuilder,
        Ciphertext,
        Encoding,
        Plaintext,
        RelinearizationKey,
        SecretKey,
    )
    from tpufhe.ops.rq import NTT, Poly
    from tpufhe.pipeline import make_mul_relin
    from tpufhe.utils.rngs import ChaCha8Rng, seed_from_u64

    print("devices:", jax.devices(), flush=True)

    from tpufhe.utils.primes import generate_prime

    degree = int(os.environ.get("VD_DEGREE", 8192))
    n_limbs = int(os.environ.get("VD_LIMBS", 3))
    # SIMD needs t prime with t = 1 mod 2N (65537 at the headline config)
    t = 65537 if degree == 8192 else generate_prime(17, 2 * degree, 1 << 17)
    par = (
        BfvParametersBuilder()
        .set_degree(degree)
        .set_plaintext_modulus(t)
        .set_moduli_sizes([62] * n_limbs)
        .build()
    )
    rng = ChaCha8Rng(seed_from_u64(7))
    sk = SecretKey.random(par, rng)
    rk = RelinearizationKey.new(sk, rng)

    nprng = np.random.default_rng(77)
    va = nprng.integers(0, t, size=degree, dtype=np.uint64)
    vb = nprng.integers(0, t, size=degree, dtype=np.uint64)
    enc = Encoding.simd()
    ca = sk.try_encrypt(Plaintext.try_encode(va, enc, par), rng)
    cb = sk.try_encrypt(Plaintext.try_encode(vb, enc, par), rng)
    n_fresh = sk.measure_noise(ca)
    print("noise fresh:", n_fresh, "bits", flush=True)

    fn = make_mul_relin(par, rk)
    t0 = time.perf_counter()
    o0, o1 = fn(ca[0].coeffs, ca[1].coeffs, cb[0].coeffs, cb[1].coeffs)
    jax.block_until_ready((o0, o1))
    np.asarray(o0).ravel()[0]  # true sync (tunnel fetch)
    print(f"mul+relin wall (incl. compile) {time.perf_counter()-t0:.1f}s",
          flush=True)

    ctx = par.context_at_level(0)
    cm = Ciphertext.new([Poly(ctx, NTT, o0), Poly(ctx, NTT, o1)], par)
    n_prod = sk.measure_noise(cm)
    print("noise product:", n_prod, "bits", flush=True)

    got = np.asarray(sk.try_decrypt(cm).try_decode(enc), dtype=np.uint64)
    want = (va * vb) % t
    ok_val = bool(np.array_equal(got, want))
    # expected bands on this config: fresh <= 10, product in (40, 110)
    ok_noise = n_fresh <= 10 and 40 < n_prod < 110
    print(f"decode match: {ok_val}; noise band ok: {ok_noise}", flush=True)
    print("VERIFY OK" if (ok_val and ok_noise) else "VERIFY FAIL", flush=True)
    return 0 if (ok_val and ok_noise) else 1


if __name__ == "__main__":
    raise SystemExit(main())
