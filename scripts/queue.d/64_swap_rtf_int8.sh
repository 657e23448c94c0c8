#!/bin/bash
# Voice-swap RTF with the int8 arms added to the ladder (bench_swap_rtf
# now includes 50-step DDPM int8 and 5-step DPM++ int8 rows).
set -e
cd "$(dirname "$0")/../.."
timeout 4800 python scripts/bench_swap_rtf.py
