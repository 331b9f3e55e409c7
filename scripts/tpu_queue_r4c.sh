#!/bin/bash
# Round-4c queue: (1) bulk-RNG backend sweep on the real bench — compile
# time AND latency for xla-threefry (default) vs rbg (one HW RngBitGenerator
# op per draw site) vs pallas_tpu (Mosaic hardware-PRNG kernels); the r3
# breakdown showed PRZS/mask draws dominate the Beaver wrapper overhead.
# (2) composable-vs-fused protocol delta (VERDICT item 6): the vmap-scoped
# protocol kernels disabled = the exact protocol graph the shard_map runtime
# executes per chip. (3) eager-UX timing (VERDICT missing #4).
set -u -o pipefail
LOG=${1:-benchmarks/results/tpu_queue_r4c.log}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* === $(date)" | tee -a "$LOG"
  timeout 3300 env "$@" 2>&1 | grep -vE "machine feat|cpu_aot|WARNING" | tail -40 | tee -a "$LOG"
  echo "--- exit status: $? $(date)" | tee -a "$LOG"
}

# 1. bulk-RNG sweep (fresh programs: BENCH_BULK_RNG changes the graph, so
#    each run pays its own compile — compile_sec is a measurement here)
run BENCH_BULK_RNG=rbg BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py
run BENCH_BULK_RNG=pallas_tpu BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py

# 2. composable protocol path (what shard_map runs per chip): all
#    vmap-scoped fused protocol kernels off; ring_mm stays (runtime-agnostic)
run BENCH_FUSED_MUL=0 BENCH_FUSED_MAX=0 BENCH_FUSED_COMPARE=0 \
  BENCH_FUSED_TRUNC=0 BENCH_LUT_FASTPATH=0 BENCH_SEQ=64 BENCH_SANITY=0 \
  python -u bench.py

# 3. eager per-op UX + lazy() comparison on the real chip
run python -u scripts/eager_ux_bench.py --reps 10

# 4. reruns on a quiet host: the r4b GPTNeo b1 and compressed-b8-cache
#    rows were contended by concurrent CPU work on the tunnel host
run BENCH_MODEL=GPTNeo BENCH_SEQ=64 BENCH_VOCAB_CHUNKS=16 BENCH_SANITY=0 python -u bench.py
run BENCH_COMPRESS=1 BENCH_BATCH=8 BENCH_CACHE=1 BENCH_SEQ=64 BENCH_SANITY=0 python -u bench.py

echo "QUEUE R4C DONE $(date)" | tee -a "$LOG"
