#!/bin/bash
# On-chip rows for the conv-saving remat policy (VERDICT round-3 item 2;
# the round-3 bench_train done marker blocked these configs — ADVICE #3).
# Rows: batch=16 remat-convs, batch=32 remat-convs, batch=32 full-remat.
set -e
cd "$(dirname "$0")/../.."
timeout 4500 python scripts/bench_train.py --steps 30 --only remat
