#!/bin/bash
# Serial TPU job queue for round-2 measurements (run when the tunnel is up).
# Usage: bash scripts/tpu_queue.sh [logfile]
# Each stage is independently timeout-guarded; failures don't stop the queue.
set -u
LOG=${1:-benchmarks/results/tpu_queue_$(date +%m%d_%H%M).log}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* === $(date)" | tee -a "$LOG"
  timeout 7200 "$@" 2>&1 | grep -vE "machine feat|cpu_aot|WARNING" | tail -15 | tee -a "$LOG"
}
# NOTE: no BENCH_SCAN_WIDTH override — the W=2048 fold scan stopped compiling
# at seq 64 on the remote compiler (NOTES_ROUND2.md); bench.py picks the best
# known-compiling width per configuration.
run python -u scripts/validate_fused_max.py
BENCH_SEQ=64 run python -u bench.py
BENCH_SEQ=64 SEQ=64 run python -u scripts/profile_breakdown.py vocab_max vocab_exp block lm_head embed gelu_ffn attn_sm layernorm beaver_mm
BENCH_CACHE=1 BENCH_SEQ=64 BENCH_SANITY=0 run python -u bench.py
BENCH_BATCH=8 BENCH_SEQ=64 BENCH_SANITY=0 run python -u bench.py
BENCH_MODEL=GPTNeo BENCH_SEQ=64 BENCH_SANITY=0 run python -u bench.py
run python -u scripts/tpu_workloads.py
run python -u examples/benches.py --size 4096 --reps 3 --loop 32 --json benchmarks/results/func_bench_tpu_v5e_looped.json
echo "QUEUE DONE $(date)" | tee -a "$LOG"
