#!/bin/bash
cd /root/repo
run() { echo "=== $1 ==="; shift; env "$@" BENCH_ONLY=3 python bench.py 2>&1 | grep -v WARNING; }
run "b8+bt16+inner32" TPUFHE_MXU_B8=1 TPUFHE_MXU4_BT=16 BENCH_INNER=32
run "b8+bt16+inner32+fori" TPUFHE_MXU_B8=1 TPUFHE_MXU4_BT=16 BENCH_INNER=32 BENCH_LOOP=1
run "b8+bt16+inner32+fori+tail4+tintt4" TPUFHE_MXU_B8=1 TPUFHE_MXU4_BT=16 BENCH_INNER=32 BENCH_LOOP=1 TPUFHE_TAIL_BT=4 TPUFHE_TINTT_BT=4
echo "=== sweep D done $(date) ==="
