#!/bin/bash
# Round-3i: GPT-Neo retry with the full memory-lever stack (ChunkedLinear
# (d,d) slices, premasked reused weights, u32-plane share0, vocab-chunked
# embedding + LM head); then the untried best GPT-2 combo (compress+cache).
set -u
LOG=${1:-benchmarks/results/tpu_queue_r3i.log}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* === $(date)" | tee -a "$LOG"
  timeout 3300 env "$@" 2>&1 | grep -vE "machine feat|cpu_aot|WARNING" | tail -60 | tee -a "$LOG"
}
run BENCH_MODEL=GPTNeo BENCH_SEQ=64 BENCH_VOCAB_CHUNKS=16 BENCH_SANITY=0 python -u bench.py
run BENCH_CACHE=1 BENCH_COMPRESS=1 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
echo "QUEUE R3I DONE $(date)" | tee -a "$LOG"
