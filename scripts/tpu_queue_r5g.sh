#!/bin/bash
# Round-5g queue: full measurement pass under the FINAL round-5 default —
# shared-diff select PRZS (XLA, fuses with consumers) + rbg bulk RNG;
# przs Mosaic kernel off by default after the layout finding
# (przs_kernel_ab.json: kernel output relayout costs ~20 ms at the weight
# shape; XLA przs+reveal fuses to 11.8 ms).
set -u -o pipefail
LOG=${1:-benchmarks/results/tpu_queue_r5g.log}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* === $(date)" | tee -a "$LOG"
  timeout 3300 env "$@" 2>&1 | grep -vE "machine feat|cpu_aot|WARNING" | tail -40 | tee -a "$LOG"
  echo "--- exit status: $? $(date)" | tee -a "$LOG"
}

# 1. Beaver decomposition at the weight shape under the final default
run LOOP=32 REPS=3 OUT=benchmarks/results/beaver_big_breakdown.json \
  python -u scripts/profile_breakdown.py \
  mm_big mm_big_pub przs_big triple_big trunc_big mm_acc_big rng_big

# 2. full-stage breakdown refresh
run LOOP=32 python -u scripts/profile_breakdown.py \
  embed lm_head block vocab_sm embed_onehot embed_mm

# 3. headline bench exactly as the driver runs it
run python -u bench.py

# 4. matrix rows
run BENCH_COMPRESS=1 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run BENCH_CACHE=1 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run BENCH_BATCH=8 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run BENCH_COMPRESS=1 BENCH_BATCH=8 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run BENCH_COMPRESS=1 BENCH_BATCH=8 BENCH_CACHE=1 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py

# 5. GPT-Neo rows under the current default (README footnote-1 refresh)
run BENCH_MODEL=GPTNeo BENCH_SEQ=64 BENCH_VOCAB_CHUNKS=16 BENCH_SANITY=0 python -u bench.py
run BENCH_MODEL=GPTNeo BENCH_SEQ=64 BENCH_VOCAB_CHUNKS=16 BENCH_BATCH=2 BENCH_SANITY=0 python -u bench.py

echo "QUEUE R5G DONE $(date)" | tee -a "$LOG"
