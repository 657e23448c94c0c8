#!/bin/bash
# Model-level int8 activation sampling sweep (follows the rent check,
# queue step 57: isolated chain measured 1.42x). Throughput rows for
# PERF.md round 4; quality arms are step 62.
set -e
cd "$(dirname "$0")/../.."
timeout 4800 python scripts/bench_int8_sampling.py
