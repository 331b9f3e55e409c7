#!/bin/bash
# Round-3f: GPT-Neo retry with vocab-chunked embedding; batch-8 re-measure
# with masked-operand reuse; full log tails for OOM forensics.
set -u
LOG=${1:-benchmarks/results/tpu_queue_r3f.log}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* === $(date)" | tee -a "$LOG"
  timeout 10800 env "$@" 2>&1 | grep -vE "machine feat|cpu_aot|WARNING" | tail -80 | tee -a "$LOG"
}
run BENCH_MODEL=GPTNeo BENCH_SEQ=64 BENCH_VOCAB_CHUNKS=16 BENCH_SANITY=0 python -u bench.py
run BENCH_BATCH=8 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run BENCH_BATCH=8 BENCH_CACHE=1 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
echo "QUEUE R3F DONE $(date)" | tee -a "$LOG"
