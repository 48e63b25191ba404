"""A/B the eprint-2021/204 second multiplication strategy on the TPU at
the headline config (N=8192, L=3x62b, B=64) — VERDICT r4 item 2a.

Measures chained-inner throughput (bench.py methodology) for the default
HPS strategy (k'=7, 64 limb-transforms/op) vs strategy 2 with kP extra
primes (42+7*kP transforms), and decrypt-checks one real product at each
kP with measured noise so the record shows what the noise trade is
(predicted rounding term ~ N*t*q/(2*P)).

Run: python benches/strategy2_r5.py [kP ...]   (default: 0 1 2; 0 = default)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    cache = os.path.expanduser("~/.cache/tpufhe_jax")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from functools import partial

    from bench import _keys, _rand_ct_arrays, _sync, _build_params
    from tpufhe.bfv import Ciphertext, Encoding, Plaintext
    from tpufhe.ops.rq import NTT, Poly
    from tpufhe.pipeline import make_mul_relin
    from tpufhe.utils.rngs import ChaCha8Rng, seed_from_u64

    degree, n_limbs, batch = 8192, 3, int(os.environ.get("BENCH_BATCH", 64))
    inner = int(os.environ.get("BENCH_INNER", 32))
    iters = int(os.environ.get("BENCH_ITERS", 10))
    kps = [int(a) for a in sys.argv[1:]] or [0, 1, 2]

    par = _build_params(degree, 62, n_limbs)
    sk, rk, rng = _keys(par)
    t = par.plaintext.value
    ctx = par.context_at_level(0)

    # one real encrypted pair for the decrypt check: t=1153 is not SIMD-
    # capable at N=8192, so use poly encoding with SPARSE polynomials
    # (the negacyclic product is computable exactly in O(nnz^2))
    nprng = np.random.default_rng(3)
    va = np.zeros(degree, dtype=np.uint64)
    vb = np.zeros(degree, dtype=np.uint64)
    ia = nprng.choice(degree, size=8, replace=False)
    ib = nprng.choice(degree, size=8, replace=False)
    va[ia] = nprng.integers(1, t, size=8)
    vb[ib] = nprng.integers(1, t, size=8)
    want = np.zeros(degree, dtype=object)
    for i in ia:
        for j in ib:
            s, w = divmod(int(i) + int(j), degree)
            term = int(va[i]) * int(vb[j]) * (-1 if s else 1)
            want[w] = (want[w] + term) % t
    want = want.astype(np.uint64)
    ca = sk.try_encrypt(Plaintext.try_encode(va, Encoding.poly(), par), rng)
    cb = sk.try_encrypt(Plaintext.try_encode(vb, Encoding.poly(), par), rng)
    real = tuple(np.asarray(c[i].coeffs)[None] for c in (ca, cb)
                 for i in range(2))

    arrs = _rand_ct_arrays(ctx, batch, degree)

    for kp in kps:
        s2 = None if kp == 0 else kp
        fn = make_mul_relin(par, rk, strategy2_primes=s2)

        # decrypt check + noise
        o0, o1 = fn(*real)
        ct = Ciphertext(par, [Poly(ctx, NTT, np.asarray(o0)[0]),
                              Poly(ctx, NTT, np.asarray(o1)[0])], 0)
        noise = sk.measure_noise(ct)
        got = np.asarray(sk.try_decrypt(ct).try_decode(Encoding.poly()))
        ok = bool((got == want).all())

        @partial(jax.jit, donate_argnums=(0, 1))
        def prog(a0, a1, b0, b1, fn=fn):
            def body(_, c):
                return fn(c[0], c[1], b0, b1)

            return jax.lax.fori_loop(0, inner, body, (a0, a1))

        out = prog(*arrs)
        _sync(out)
        a0, a1, b0, b1 = out[0], out[1], arrs[2], arrs[3]
        t0 = time.perf_counter()
        for _ in range(iters):
            a0, a1 = prog(a0, a1, b0, b1)
        _sync(a0, a1)
        dt = time.perf_counter() - t0
        ops = batch * iters * inner / dt
        print(
            f'{{"strategy": {"\"default\"" if kp == 0 else kp}, '
            f'"mul_relin_per_s": {ops:.1f}, "noise_bits": {noise}, '
            f'"decrypt_ok": {str(ok).lower()}, '
            f'"transforms_per_op": {64 if kp == 0 else 42 + 7 * kp}}}',
            flush=True,
        )


if __name__ == "__main__":
    main()
