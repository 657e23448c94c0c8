#!/bin/bash
# Voice-swap RTF including the new DPM-Solver++ serving arms (5/10 steps).
# Round-3 measured 13.7x (50-step DDPM) and 64.4x (10-step DDIM); the
# dpmpp-5 arm targets ~2x the DDIM serving rate, quality-gated by the
# queued 10k dpmpp quality arms (queue.d/50).
set -e
cd "$(dirname "$0")/../.."
timeout 3600 python scripts/bench_swap_rtf.py
