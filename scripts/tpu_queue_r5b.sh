#!/bin/bash
# Round-5b queue: measure the PRZS share-construction rework (shared-diff
# select replaces per-lane double gathers, random.py:przs_arithmetic) and
# refresh every committed breakdown artifact under the TRUE config default
# (no BENCH_BULK_RNG override — the round-4 advisor flagged that the r4e
# breakdowns were accidentally measured under pallas bulk RNG).
set -u -o pipefail
LOG=${1:-benchmarks/results/tpu_queue_r5b.log}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* === $(date)" | tee -a "$LOG"
  timeout 3300 env "$@" 2>&1 | grep -vE "machine feat|cpu_aot|WARNING" | tail -40 | tee -a "$LOG"
  echo "--- exit status: $? $(date)" | tee -a "$LOG"
}

# 1. Beaver decomposition at the weight shape: przs_big/triple_big are the
#    rows the rework targets (30 ms / 53 ms in r4e)
run LOOP=32 REPS=3 python -u scripts/profile_beaver_big.py \
  przs_big triple_big mm_norescale trunc_out mpc_mm

# 2. mm_big + full-stage refresh (writes breakdown_seq64_b1.json +
#    beaver_big_breakdown.json via profile_breakdown's OUT default)
run LOOP=32 REPS=3 OUT=benchmarks/results/beaver_big_breakdown.json \
  python -u scripts/profile_breakdown.py \
  mm_big mm_big_pub przs_big triple_big trunc_big mm_acc_big rng_big
run LOOP=32 python -u scripts/profile_breakdown.py \
  embed lm_head block vocab_sm embed_onehot embed_mm

# 3. headline bench exactly as the driver runs it
run python -u bench.py

# 4. matrix rows under the current default
run BENCH_COMPRESS=1 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run BENCH_CACHE=1 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run BENCH_BATCH=8 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run BENCH_COMPRESS=1 BENCH_BATCH=8 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run BENCH_COMPRESS=1 BENCH_BATCH=8 BENCH_CACHE=1 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py

# 5. GPT-Neo rows under the current default (README footnote-1 refresh)
run BENCH_MODEL=GPTNeo BENCH_SEQ=64 BENCH_VOCAB_CHUNKS=16 BENCH_SANITY=0 python -u bench.py
run BENCH_MODEL=GPTNeo BENCH_SEQ=64 BENCH_VOCAB_CHUNKS=16 BENCH_BATCH=2 BENCH_SANITY=0 python -u bench.py

echo "QUEUE R5B DONE $(date)" | tee -a "$LOG"
