#!/bin/bash
# Re-derive the train-step roofline under the conv-saving remat policy
# (VERDICT round-3 item 3): TPU-lowered cost analysis at the flagship
# batch 16 (plain + convs) and at monolithic batch 32 (convs — the config
# that OOMs without remat).
set -e
cd "$(dirname "$0")/../.."
timeout 1800 python scripts/train_roofline.py --batch-size 16
timeout 1800 python scripts/train_roofline.py --batch-size 16 --grad-checkpoint convs
timeout 1800 python scripts/train_roofline.py --batch-size 32 --grad-checkpoint convs
