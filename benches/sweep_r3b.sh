#!/bin/bash
# Round-3 sweep B on top of opt+tintt(bt2)+tail(bt2) defaults
cd /root/repo
run() { echo "=== $1 ==="; shift; env "$@" BENCH_ONLY=3 python bench.py 2>&1 | grep -v WARNING; }
run "defaults (recheck: tail bt2 now default)"
run "fori chain" BENCH_LOOP=1
run "b8 planes" TPUFHE_MXU_B8=1
run "mxu4 bt16" TPUFHE_MXU4_BT=16
run "rns bt16" TPUFHE_RNS_BT=16
run "tail bt4" TPUFHE_TAIL_BT=4
echo "=== sweep B done $(date) ==="
