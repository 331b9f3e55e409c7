#!/bin/bash
# Round-3 follow-up queue: fused Pallas ring-matmul kernel validation +
# re-measurement of every headline config with it enabled.
# Usage: bash scripts/tpu_queue_r3c.sh [logfile]
set -u
LOG=${1:-benchmarks/results/tpu_queue_r3c_$(date +%m%d_%H%M).log}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* === $(date)" | tee -a "$LOG"
  timeout 7200 "$@" 2>&1 | grep -vE "machine feat|cpu_aot|WARNING" | tail -15 | tee -a "$LOG"
}
# 1. kernel validation + microbench at the hot shapes
run python -u scripts/validate_ring_mm.py
run python -u scripts/validate_fused_mul.py
# 2. stage re-profile: how much did mm_big/embed move
BENCH_SCAN_WIDTH=16384 SEQ=64 run python -u scripts/profile_breakdown.py embed block mm_big lm_head vocab_sm
# 3. headline with the kernel
BENCH_SEQ=64 BENCH_SANITY=0 run python -u bench.py
# 4. cached-mode headline
BENCH_CACHE=1 BENCH_SEQ=64 BENCH_SANITY=0 run python -u bench.py
# 5. batch 8 (kernel shrinks matmul HLO; retry seq 64)
BENCH_BATCH=8 BENCH_SEQ=64 BENCH_SANITY=0 run python -u bench.py
# 6. GPT-Neo
BENCH_MODEL=GPTNeo BENCH_SEQ=64 BENCH_SANITY=0 run python -u bench.py
echo "QUEUE R3C DONE $(date)" | tee -a "$LOG"
