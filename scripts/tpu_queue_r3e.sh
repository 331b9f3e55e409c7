#!/bin/bash
# Round-3e: GPT-Neo 1.3B single-chip attempt (seed-compressed shares +
# streaming construction + vocab-chunked head), then GPT-2 with compression
# to quantify the compressed-path overhead.
set -u
LOG=${1:-benchmarks/results/tpu_queue_r3e.log}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* === $(date)" | tee -a "$LOG"
  timeout 10800 env "$@" 2>&1 | grep -vE "machine feat|cpu_aot|WARNING" | tail -25 | tee -a "$LOG"
}
run BENCH_MODEL=GPTNeo BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run BENCH_MODEL=GPT2 BENCH_COMPRESS=1 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
echo "QUEUE R3E DONE $(date)" | tee -a "$LOG"
