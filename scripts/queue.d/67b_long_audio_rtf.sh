#!/bin/bash
# VERDICT r4 item 3 (final piece): measured long-audio RTF rows at the
# few-step serving point, on ONE continuous 60 s clip through the
# sequence-parallel conversion path (1-device mesh on the real chip; halo
# edges zero-masked so the math equals the unsharded decode).
#
# Methodology note (learned from the first execution of this step): the
# T=960k 50-step program costs ~34 min of XLA compile through the tunnel
# PER PROCESS, and the persistent compile cache does not serialize it on
# this backend — so each arm runs --repeat 2 in ONE process: run 1 pays
# compile, run 2 is the steady-state serving RTF row. (The CLI now jits
# the convert once per process, so run 2 is a pure cache hit — and the
# jitted program also serializes to the persistent compile cache.)
set -e
cd "$(dirname "$0")/../.."
R=runs/qswap
test -f "$R/vqvae/.done" || { echo "66_qeval_swap10k checkpoint missing"; exit 1; }

python - << 'PYEOF'
import numpy as np
from vq_voice_swap_tpu.data import ChunkWriter

t = np.arange(60 * 16000, dtype=np.float64) / 16000.0
# 300 Hz tone with slow vibrato: in-distribution-ish content, 60 s long.
wav = 0.5 * np.sin(2 * np.pi * 300.0 * t + 2.0 * np.sin(2 * np.pi * 0.25 * t))
w = ChunkWriter("/tmp/long60.wav", 16000)
try:
    w.write(wav.astype(np.float32))
finally:
    w.close()
print("wrote /tmp/long60.wav")
PYEOF

for arm in "dpmpp 5" "ddpm 50"; do
  set -- $arm
  echo "=== long-audio 60s: sampler=$1 steps=$2 (repeat 2) ==="
  timeout 5400 python scripts/long_audio_convert.py \
    --checkpoint-path "$R/vqvae/model.npz" --input /tmp/long60.wav \
    --label 1 --steps "$2" --sampler "$1" --repeat 2 \
    --output "/tmp/long60_${1}${2}.wav"
done
echo "long_audio_rtf: DONE"
