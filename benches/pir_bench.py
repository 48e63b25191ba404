"""End-to-end PIR benchmark (SURVEY.md section 6 last row).

Runs MulPIR over a database of `db_size` elements of `elem_size` bytes on
the current backend and reports setup / query / server-answer / decode
wall times plus wire sizes. The server path (oblivious expansion, database
dot products, ct-ct multiply) goes through the object API, so on
remote-tunneled devices the numbers include per-dispatch latency.

Usage: python benches/pir_bench.py [db_size] [elem_size] [degree]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    cache_dir = os.path.expanduser("~/.cache/tpufhe_jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    db_size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    elem_size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    degree = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    # paper-scale call: python benches/pir_bench.py 65536 1024 8192
    t = None
    if degree == 8192:
        # the mulpir.rs paper plaintext modulus (examples/mulpir.rs:61)
        t = (1 << 20) + (1 << 19) + (1 << 17) + (1 << 16) + (1 << 14) + 1

    from tpufhe.models import pir

    report = {}
    t0 = time.perf_counter()
    got, want = pir.run_mulpir(
        database_size=db_size, elements_size=elem_size, degree=degree,
        plaintext_modulus=t, moduli_sizes=(50, 55, 55), report=report,
    )
    dt = time.perf_counter() - t0
    ok = got == want
    print(f"mulpir db={db_size}x{elem_size}B degree={degree}: "
          f"{'OK' if ok else 'FAILED'} in {dt:.1f} s total")
    for k in ("setup_s", "keygen_s", "query_s", "expand_s", "response_s",
              "answer_s"):
        if k in report:
            print(f"  {k:12s} {report[k]:9.2f} s")
    for k in ("dims", "ek_bytes", "rk_bytes", "query_bytes", "response_bytes"):
        if k in report:
            print(f"  {k:14s} {report[k]}")


if __name__ == "__main__":
    main()
