#!/bin/bash
# Round-4b queue: resume the r4a measurement matrix from where the session
# cut it off (after the two materialized GPT-2 runs), then refresh the
# stage breakdown with the new kernels in place.
set -u -o pipefail
LOG=${1:-benchmarks/results/tpu_queue_r4b.log}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* === $(date)" | tee -a "$LOG"
  timeout 3300 env "$@" 2>&1 | grep -vE "machine feat|cpu_aot|WARNING" | tail -40 | tee -a "$LOG"
  echo "--- exit status: $? $(date)" | tee -a "$LOG"
}

run BENCH_COMPRESS=1 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run BENCH_COMPRESS=1 BENCH_CACHE=1 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run BENCH_COMPRESS=1 BENCH_BATCH=8 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run BENCH_COMPRESS=1 BENCH_BATCH=8 BENCH_CACHE=1 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run BENCH_MODEL=GPTNeo BENCH_SEQ=64 BENCH_VOCAB_CHUNKS=16 BENCH_SANITY=0 python -u bench.py
run BENCH_MODEL=GPTNeo BENCH_SEQ=64 BENCH_VOCAB_CHUNKS=16 BENCH_BATCH=2 BENCH_SANITY=0 python -u bench.py

# Refreshed per-stage breakdown with the triangle-trimmed kernel, shared
# 2-D operands, direct one-hot embedding, and bulk-PRZS paths in place.
run LOOP=8 python -u scripts/profile_breakdown.py

echo "QUEUE R4B DONE $(date)" | tee -a "$LOG"
