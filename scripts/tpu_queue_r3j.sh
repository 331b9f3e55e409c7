#!/bin/bash
# Round-3j: runs AFTER r3i releases the chip. Loop-mode function bench
# (N=100 iterations in ONE compiled program) to get per-call numbers free
# of the ~26 ms tunnel dispatch floor that dominates the single-shot
# medians in func_bench_tpu_v5e.json.
set -u
LOG=${1:-benchmarks/results/tpu_queue_r3j.log}
cd "$(dirname "$0")/.."
# wait for r3i to finish (sentinel in its log), max ~55 min
for _ in $(seq 330); do
  grep -q "QUEUE R3I DONE" benchmarks/results/tpu_queue_r3i.log 2>/dev/null && break
  sleep 10
done
run() {
  echo "=== $* === $(date)" | tee -a "$LOG"
  timeout 3000 env "$@" 2>&1 | grep -vE "machine feat|cpu_aot|WARNING" | tail -30 | tee -a "$LOG"
}
run python -u examples/benches.py --size 4096 --reps 3 --loop 100 \
  --functions sigmoid exp reciprocal gelu \
  --json benchmarks/results/func_bench_tpu_v5e_loop.json
echo "QUEUE R3J DONE $(date)" | tee -a "$LOG"
