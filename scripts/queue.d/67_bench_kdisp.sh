#!/bin/bash
# K-steps-per-dispatch train throughput, K in {1,4,16} at batch=16
# (VERDICT r4 item 2): paired same-session rows against the round-4
# median 41.2 / max 47.0 / roofline 65.4 ledger entry. Adoption bar:
# median >= 47 samples/s (72% of roofline).
set -e
cd "$(dirname "$0")/../.."
timeout 5400 python scripts/bench_kdisp.py
