#!/bin/bash
# Round-3h: GPT-2 compressed-path re-measure (ChunkedEmbedding now in),
# function-bench refresh (Newton-refined softmax + fused trunc), stage
# profile with current kernels.
set -u
LOG=${1:-benchmarks/results/tpu_queue_r3h.log}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* === $(date)" | tee -a "$LOG"
  timeout 10800 env "$@" 2>&1 | grep -vE "machine feat|cpu_aot|WARNING" | tail -30 | tee -a "$LOG"
}
run BENCH_MODEL=GPT2 BENCH_COMPRESS=1 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run python -u examples/benches.py --size 4096 --reps 3 --functions sigmoid exp reciprocal gelu --json benchmarks/results/func_bench_tpu_v5e.json
SEQ=64 run python -u scripts/profile_breakdown.py embed block mm_big lm_head vocab_sm
echo "QUEUE R3H DONE $(date)" | tee -a "$LOG"
