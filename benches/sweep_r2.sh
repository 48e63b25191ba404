#!/bin/bash
# Round-2 sweep: batch sizes x limb widths for the mul+relin bench.
cd /root/repo
for cfg in "62 3 16" "62 3 64" "30 7 16" "30 7 64" "62 3 128" "30 7 128"; do
  set -- $cfg
  echo "=== limb_bits=$1 limbs=$2 batch=$3 ==="
  BENCH_ONLY=3 BENCH_LIMB_BITS=$1 BENCH_LIMBS=$2 BENCH_BATCH=$3 BENCH_ITERS=10 \
    timeout 1800 python bench.py 2>&1 | tail -3
done
