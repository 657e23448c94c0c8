#!/bin/bash
# int8-stored full-resolution activation rent check (VERDICT round-3
# item 8 stretch) — measures the GN->GELU->conv chain before any model
# code is built around the idea.
set -e
cd "$(dirname "$0")/../.."
timeout 2400 python scripts/bench_int8_rent.py
