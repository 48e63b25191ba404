#!/bin/bash
cd /root/repo
run() { echo "=== $1 ==="; shift; env "$@" BENCH_ONLY=3 python bench.py 2>&1 | grep -v WARNING; }
run "b8+fori" TPUFHE_MXU_B8=1 BENCH_LOOP=1
run "b8+fori+mxu4bt16" TPUFHE_MXU_B8=1 BENCH_LOOP=1 TPUFHE_MXU4_BT=16
run "b8+fori+inner32" TPUFHE_MXU_B8=1 BENCH_LOOP=1 BENCH_INNER=32
echo "=== sweep C done $(date) ==="
