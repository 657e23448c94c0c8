#!/bin/bash
# The 10k-sample quality protocol + DDIM arm (VERDICT round-3 item 1,
# the highest-priority unfinished measurement). Internally resumable:
# retrains the tones checkpoints only if lost, skips finished arms, and
# sample generation resumes batch-exact after a kill.
set -e
cd "$(dirname "$0")/../.."
timeout 28800 bash scripts/quality_eval_r4.sh runs/qeval 10000
