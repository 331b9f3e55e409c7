#!/bin/bash
# Round-4a queue: (1) full 12-function loop-mode bench (VERDICT item 4),
# (2) the measurement matrix {GPT-2, GPT-Neo} x {materialized, compressed}
# x {no-cache, cache} x batch (VERDICT item 5). Run AFTER the kernel
# validation sweep releases the chip.
set -u -o pipefail
LOG=${1:-benchmarks/results/tpu_queue_r4a.log}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* === $(date)" | tee -a "$LOG"
  timeout 3300 env "$@" 2>&1 | grep -vE "machine feat|cpu_aot|WARNING" | tail -40 | tee -a "$LOG"
  echo "--- exit status: $? $(date)" | tee -a "$LOG"
}

# 1. all 12 nonlinearities, loop mode (per-call medians free of the ~26 ms
#    dispatch floor) + error metrics at reference domains
run python -u examples/benches.py --size 4096 --reps 3 --loop 100 \
  --json benchmarks/results/func_bench_tpu_v5e_loop.json

# 2. measurement matrix (history.jsonl rows; BENCH_SANITY=0 keeps each run
#    to one compile so the whole matrix fits a chip-day)
run BENCH_COMPRESS=0 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run BENCH_COMPRESS=0 BENCH_CACHE=1 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run BENCH_COMPRESS=1 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run BENCH_COMPRESS=1 BENCH_CACHE=1 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run BENCH_COMPRESS=1 BENCH_BATCH=8 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run BENCH_COMPRESS=1 BENCH_BATCH=8 BENCH_CACHE=1 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run BENCH_MODEL=GPTNeo BENCH_SEQ=64 BENCH_VOCAB_CHUNKS=16 BENCH_SANITY=0 python -u bench.py
run BENCH_MODEL=GPTNeo BENCH_SEQ=64 BENCH_VOCAB_CHUNKS=16 BENCH_BATCH=2 BENCH_SANITY=0 python -u bench.py

echo "QUEUE R4A DONE $(date)" | tee -a "$LOG"
