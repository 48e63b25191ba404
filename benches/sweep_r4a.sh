#!/bin/bash
# Round-4 headline A/B: bitcast digit extraction (TPUFHE_BC_EXTRACT) and
# rotate/encdec chained configs. Run on the TPU, one process per config
# (env is read at program-build time).
cd "$(dirname "$0")/.." || exit 1
LOG=benches/logs/sweep_r4a.log
: > "$LOG"

run() {
  echo "=== $* ===" | tee -a "$LOG"
  env "$@" BENCH_ONLY=3 BENCH_ITERS=10 timeout 2400 python bench.py 2>/dev/null \
    | tail -1 | tee -a "$LOG"
}

run TPUFHE_BC_EXTRACT=0
run TPUFHE_BC_EXTRACT=1
# interaction with batch tiles: bc shrinks per-row VPU work; retest tiles
run TPUFHE_BC_EXTRACT=1 TPUFHE_MXU4_BT=8
run TPUFHE_BC_EXTRACT=1 TPUFHE_TINTT_BT=4
