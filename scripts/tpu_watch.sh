#!/bin/bash
# Watch for the TPU tunnel to come back, then run the measurement queue once.
# Usage: bash scripts/tpu_watch.sh
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/results/tpu_watch.log
echo "watch start $(date)" >> "$LOG"
while true; do
  if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "TPU UP $(date)" >> "$LOG"
    bash scripts/tpu_queue.sh
    echo "watch done $(date)" >> "$LOG"
    exit 0
  fi
  echo "down $(date)" >> "$LOG"
  sleep 180
done
