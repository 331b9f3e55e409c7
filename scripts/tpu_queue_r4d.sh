#!/bin/bash
# Round-4d queue: mm_big decomposition — locate the ~80 ms Beaver-wrapper
# overhead at the lm_head shape (triple gen vs PRZS vs trunc vs fused acc).
set -u -o pipefail
LOG=${1:-benchmarks/results/tpu_queue_r4d.log}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* === $(date)" | tee -a "$LOG"
  timeout 3300 env "$@" 2>&1 | grep -vE "machine feat|cpu_aot|WARNING" | tail -40 | tee -a "$LOG"
  echo "--- exit status: $? $(date)" | tee -a "$LOG"
}

run python -u scripts/validate_rbg_tpu.py

run LOOP=8 OUT=benchmarks/results/beaver_big_breakdown.json \
  python -u scripts/profile_breakdown.py \
  mm_big mm_big_pub przs_big triple_big trunc_big mm_acc_big

echo "QUEUE R4D DONE $(date)" | tee -a "$LOG"
