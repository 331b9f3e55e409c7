#!/bin/bash
# Round-4e queue (run on a QUIET host — earlier stage numbers were inflated
# by concurrent pytest on the tunnel host): hybrid bulk-RNG validation +
# fresh default bench + clean LOOP=32 Beaver decomposition + matrix reruns
# under the new default.
set -u -o pipefail
LOG=${1:-benchmarks/results/tpu_queue_r4e.log}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* === $(date)" | tee -a "$LOG"
  timeout 3300 env "$@" 2>&1 | grep -vE "machine feat|cpu_aot|WARNING" | tail -40 | tee -a "$LOG"
  echo "--- exit status: $? $(date)" | tee -a "$LOG"
}

run python -u scripts/validate_rbg_tpu.py

# fresh default-config bench (auto = rbg on the TPU backend since r4);
# BENCH_SANITY=1 exactly mirrors the driver's bench invocation
run BENCH_SEQ=64 python -u bench.py

# clean decomposition, higher LOOP to crush dispatch noise
run LOOP=32 REPS=3 OUT=benchmarks/results/beaver_big_breakdown.json \
  python -u scripts/profile_breakdown.py \
  mm_big mm_big_pub przs_big triple_big trunc_big mm_acc_big rng_big

# full-stage breakdown refresh under the new default
run LOOP=32 python -u scripts/profile_breakdown.py \
  embed lm_head block vocab_sm embed_onehot embed_mm

# matrix rows under the new default RNG
run BENCH_COMPRESS=1 BENCH_BATCH=8 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run BENCH_COMPRESS=1 BENCH_BATCH=8 BENCH_CACHE=1 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run BENCH_CACHE=1 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run BENCH_MODEL=GPTNeo BENCH_SEQ=64 BENCH_VOCAB_CHUNKS=16 BENCH_SANITY=0 python -u bench.py

echo "QUEUE R4E DONE $(date)" | tee -a "$LOG"
