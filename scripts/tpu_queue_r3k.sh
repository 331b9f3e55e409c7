#!/bin/bash
# Round-3k: (1) the untried best GPT-2 combo (seed-compressed shares +
# tuple-cache online phase) that was cut off at the previous session end;
# (2) the loop-mode function bench (N=100 iterations in ONE compiled
# program) for per-call medians free of the ~26 ms tunnel dispatch floor.
set -u -o pipefail
LOG=${1:-benchmarks/results/tpu_queue_r3k.log}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* === $(date)" | tee -a "$LOG"
  timeout 2400 env "$@" 2>&1 | grep -vE "machine feat|cpu_aot|WARNING" | tail -60 | tee -a "$LOG"
  echo "--- exit status: $? $(date)" | tee -a "$LOG"
}
run BENCH_CACHE=1 BENCH_COMPRESS=1 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run python -u examples/benches.py --size 4096 --reps 3 --loop 100 \
  --functions sigmoid exp reciprocal gelu \
  --json benchmarks/results/func_bench_tpu_v5e_loop.json
echo "QUEUE R3K DONE $(date)" | tee -a "$LOG"
