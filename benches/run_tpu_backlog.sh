#!/bin/bash
# Phase-1 of the TPU backlog (benches/TPU_BACKLOG.md), run when the axon
# tunnel returns: (1) end-to-end verify drive, (2) the r2c A/B matrix.
# Items 3-5 (trace, paper-scale PIR, full bench refresh) run AFTER the
# A/B results have been reviewed and pipeline defaults flipped.
# Usage: bash benches/run_tpu_backlog.sh 2>&1 | tee -a benches/logs/backlog.log
cd "$(dirname "$0")/.."
mkdir -p benches/logs
echo "=== backlog phase 1 start $(date +%H:%M:%S) ==="
echo "--- 1 verify drive ---"
timeout 900 python benches/verify_drive.py
echo "--- 2 A/B matrix (r2c) ---"
bash benches/ab_r2c.sh 2>&1 | tee -a benches/logs/ab_r2c.log
echo "=== backlog phase 1 done $(date +%H:%M:%S) ==="
