#!/bin/bash
# Probe the axon TPU tunnel until it comes back, then run the queued
# hardware benches sequentially (one at a time -- 1-CPU container).
# Logs: /tmp/tpu_watch.log, /tmp/bench_grid.log, /tmp/bench_semantic.log
# Usage: nohup bash scripts/tpu_watch_and_bench.sh & (or Bash background)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_watch.log
echo "[watch] start $(date -u +%H:%M:%S)" >> "$LOG"
for i in $(seq 1 40); do
    if timeout 300 python -c 'import jax; print(jax.devices())' \
            >> "$LOG" 2>&1; then
        echo "[watch] tunnel UP at $(date -u +%H:%M:%S) (probe $i)" >> "$LOG"
        echo "[watch] running bench_grid..." >> "$LOG"
        timeout 5400 python scripts/bench_grid.py \
            > /tmp/bench_grid.log 2>&1
        echo "[watch] bench_grid rc=$? at $(date -u +%H:%M:%S)" >> "$LOG"
        echo "[watch] running bench_semantic..." >> "$LOG"
        timeout 3600 python scripts/bench_semantic.py \
            > /tmp/bench_semantic.log 2>&1
        echo "[watch] bench_semantic rc=$? at $(date -u +%H:%M:%S)" >> "$LOG"
        echo "[watch] DONE" >> "$LOG"
        exit 0
    fi
    echo "[watch] probe $i failed $(date -u +%H:%M:%S); sleeping 600s" \
        >> "$LOG"
    sleep 600
done
echo "[watch] gave up after 40 probes" >> "$LOG"
exit 1
