#!/bin/bash
# Serial TPU job queue for round-3 measurements (run when the tunnel is up).
# Usage: bash scripts/tpu_queue_r3.sh [logfile]
# Each stage is independently timeout-guarded; failures don't stop the queue.
set -u
LOG=${1:-benchmarks/results/tpu_queue_r3_$(date +%m%d_%H%M).log}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* === $(date)" | tee -a "$LOG"
  timeout 7200 "$@" 2>&1 | grep -vE "machine feat|cpu_aot|WARNING" | tail -15 | tee -a "$LOG"
}
# 1. kernel validations (fused ltz is new this round)
run python -u scripts/validate_fused_ltz.py
run python -u scripts/validate_fused_max.py
# 2. headline with fused compare (bench enables it on TPU by default)
BENCH_SEQ=64 BENCH_SANITY=0 run python -u bench.py
# 3. stage profile under the headline config
BENCH_SCAN_WIDTH=16384 SEQ=64 run python -u scripts/profile_breakdown.py block gelu_ffn attn_sm layernorm ltz beaver_mm mm_big mm_big_pub rng_big
# 4. offline/online split
BENCH_CACHE=1 BENCH_SEQ=64 BENCH_SANITY=0 run python -u bench.py
# 5. batch 8 (auto head-chunking caps compiler footprint at 64 positions)
BENCH_BATCH=8 BENCH_SEQ=64 BENCH_SANITY=0 run python -u bench.py
# 6. GPT-Neo (2048-dim, 24 blocks)
BENCH_MODEL=GPTNeo BENCH_SEQ=64 BENCH_SANITY=0 run python -u bench.py
# 7. workloads + looped function bench
run python -u scripts/tpu_workloads.py
run python -u examples/benches.py --size 4096 --reps 3 --loop 32 --json benchmarks/results/func_bench_tpu_v5e_looped.json
echo "QUEUE DONE $(date)" | tee -a "$LOG"
