#!/bin/bash
# Re-derive the train-step roofline under the conv-saving remat policy
# (VERDICT round-3 item 3): TPU-lowered cost analysis at the flagship
# batch 16 (plain + convs) and at monolithic batch 32 (convs — the config
# that OOMs without remat).
set -e
cd "$(dirname "$0")/../.."
timeout 1800 python scripts/train_roofline.py --batch-size 16
timeout 1800 python scripts/train_roofline.py --batch-size 16 --grad-checkpoint convs
# batch=32 + convs: XLA buffer assignment itself RESOURCE_EXHAUSTs at
# compile (first drain, 2026-08-19) — the OOM dump of GroupNorm-backward
# fusion temps IS the measurement; no roofline exists for this config.
# Non-fatal so retries of the two rows above don't 3-strike on it.
timeout 1800 python scripts/train_roofline.py --batch-size 32 --grad-checkpoint convs \
  || echo "batch=32+convs roofline: compile-time RESOURCE_EXHAUSTED (expected; see PERF.md)"
