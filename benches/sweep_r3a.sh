#!/bin/bash
# Round-3 sweep A: opt reduction + tensor-intt + relin-tail variants
cd /root/repo
run() { echo "=== $1 ==="; shift; env "$@" BENCH_ONLY=3 python bench.py 2>&1 | grep -v WARNING; }
run "opt-only (tintt=0, tail=0)" TPUFHE_TENSOR_INTT=0 TPUFHE_RELIN_TAIL=0
run "opt+tintt(bt2), tail=0" TPUFHE_RELIN_TAIL=0
run "opt+tintt+tail(bt1) DEFAULT"
run "opt+tintt+tail bt2" TPUFHE_TAIL_BT=2
run "opt+tintt(bt4)+tail(bt2)" TPUFHE_TINTT_BT=4 TPUFHE_TAIL_BT=2
echo "=== sweep done $(date) ==="
