#!/bin/bash
# Round-3d queue: fused standalone-EGK-trunc validation, refined-softmax
# headline re-measure, cached mode with consistent fused gating, batch 8.
set -u
LOG=${1:-benchmarks/results/tpu_queue_r3d.log}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* === $(date)" | tee -a "$LOG"
  timeout 7200 "$@" 2>&1 | grep -vE "machine feat|cpu_aot|WARNING" | tail -15 | tee -a "$LOG"
}
run python -u scripts/validate_fused_mul.py
BENCH_SEQ=64 BENCH_SANITY=0 run python -u bench.py
BENCH_CACHE=1 BENCH_SEQ=64 BENCH_SANITY=0 run python -u bench.py
BENCH_BATCH=8 BENCH_SEQ=64 BENCH_SANITY=0 run python -u bench.py
BENCH_CACHE=1 BENCH_BATCH=8 BENCH_SEQ=64 BENCH_SANITY=0 run python -u bench.py
echo "QUEUE R3D DONE $(date)" | tee -a "$LOG"
