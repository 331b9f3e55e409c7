#!/bin/bash
# Round-5i queue: final measurement pass under the FINAL round-5 default —
# native-2-D-tiled PRZS/sharing kernel ON (przs_kernel "auto"), after the
# in-context A/B win (reveal 11.8 -> 3.7 ms, matmul 37.5 -> 28.4 ms at the
# weight shape; tpu_queue_r5h.log). Re-warms the driver's bench program.
set -u -o pipefail
LOG=${1:-benchmarks/results/tpu_queue_r5i.log}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* === $(date)" | tee -a "$LOG"
  timeout 3300 env "$@" 2>&1 | grep -vE "machine feat|cpu_aot|WARNING" | tail -40 | tee -a "$LOG"
  echo "--- exit status: $? $(date)" | tee -a "$LOG"
}

# 1. headline bench exactly as the driver runs it (warms its cache)
run python -u bench.py

# 2. peak-throughput row
run BENCH_BATCH=8 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py

# 3. breakdown artifacts under the final default
run LOOP=32 REPS=3 OUT=benchmarks/results/beaver_big_breakdown.json \
  python -u scripts/profile_breakdown.py \
  mm_big mm_big_pub przs_big triple_big trunc_big mm_acc_big rng_big
run LOOP=32 python -u scripts/profile_breakdown.py \
  embed lm_head block vocab_sm embed_onehot embed_mm

# 4. GPT-Neo headline under the final default
run BENCH_MODEL=GPTNeo BENCH_SEQ=64 BENCH_VOCAB_CHUNKS=16 BENCH_SANITY=0 python -u bench.py

# 5. compressed b1 (the memory-headline config)
run BENCH_COMPRESS=1 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py

echo "QUEUE R5I DONE $(date)" | tee -a "$LOG"
