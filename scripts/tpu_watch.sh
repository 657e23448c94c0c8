#!/bin/bash
# Probe the axon TPU tunnel; the moment it answers, drain the measurement
# queue. Designed to run for hours in the background:
#   bash scripts/tpu_watch.sh & echo $! > /tmp/tpu_watch.pid
cd "$(dirname "$0")/.."
mkdir -p runs
LOG=runs/tpu_watch.log
echo "=== tpu_watch start: $(date -u) ===" >> "$LOG"
while true; do
    if timeout 150 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" \
        >> "$LOG" 2>&1; then
        echo "=== tunnel UP: $(date -u) — draining queue ===" >> "$LOG"
        bash scripts/tpu_queue.sh >> "$LOG" 2>&1
        echo "=== queue drained: $(date -u) ===" >> "$LOG"
        exit 0
    fi
    echo "probe failed: $(date -u)" >> "$LOG"
    sleep 180
done
