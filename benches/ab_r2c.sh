#!/bin/bash
# Round-2c A/B matrix on the real chip: fused tensor kernel x Karatsuba
# x b8 planes, then the fori_loop chain variant. Serial (one TPU).
# Usage: bash benches/ab_r2c.sh >> benches/logs/ab_r2c.log 2>&1
cd "$(dirname "$0")/.."
run () {
  echo "=== $1 ==="
  shift
  env BENCH_ONLY=3 BENCH_SCALING=0 "$@" timeout 2700 python bench.py 2>&1 | grep -E '^\{' | tail -1
}
run "all off (r2b reference)"
run "kara (graph)" TPUFHE_TENSOR_KARA=1
run "tensor kernel" TPUFHE_PALLAS_TENSOR=1
run "tensor+kara" TPUFHE_PALLAS_TENSOR=1 TPUFHE_TENSOR_KARA=1
run "tensor+kara+b8" TPUFHE_PALLAS_TENSOR=1 TPUFHE_TENSOR_KARA=1 TPUFHE_MXU_B8=1
run "b8 only" TPUFHE_MXU_B8=1
run "fori_loop chain (defaults)" BENCH_LOOP=1
run "ntt in-place alias" TPUFHE_MXU4_ALIAS=1
echo "=== done $(date +%H:%M:%S) ==="
