#!/bin/bash
# Save-overlap rows (VERDICT round-3 item 4): async orbax must hide the
# save wall-time behind device compute like the npz async path does.
set -e
cd "$(dirname "$0")/../.."
timeout 7200 python scripts/bench_async_save.py --steps 30
