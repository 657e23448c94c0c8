#!/bin/bash
# Clean re-measure of every batch=16 row (plain, remat-convs, depth=4) in
# one quiet session: the first 10_bench_train_remat rows ran while
# host-CPU test jobs were live, which inflates dispatch jitter and drags
# the median (max is robust). A paired same-session measurement removes
# both that and the session-to-session confound.
set -e
cd "$(dirname "$0")/../.."
timeout 4500 python scripts/bench_train.py --steps 30 --only "batch=16"
