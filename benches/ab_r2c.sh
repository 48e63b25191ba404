#!/bin/bash
# Round-2c A/B matrix on the real chip: fused tensor kernel x b8 planes,
# then the fori_loop chain variant on the winner. Serial (one TPU).
# Usage: bash benches/ab_r2c.sh >> benches/logs/ab_r2c.log 2>&1
cd "$(dirname "$0")/.."
run () {
  echo "=== $1 ==="
  shift
  env BENCH_ONLY=3 BENCH_SCALING=0 "$@" timeout 2700 python bench.py 2>&1 | grep -E '^\{' | tail -1
}
run "tensor off, b8 off (r2b reference)"
run "tensor on, b8 off" TPUFHE_PALLAS_TENSOR=1
run "tensor on, b8 on" TPUFHE_PALLAS_TENSOR=1 TPUFHE_MXU_B8=1
run "tensor off, b8 on" TPUFHE_MXU_B8=1
run "fori_loop chain (defaults)" BENCH_LOOP=1
echo "=== done $(date +%H:%M:%S) ==="
