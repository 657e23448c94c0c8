#!/bin/bash
# VERDICT r4 item 3 (final piece): measured long-audio RTF rows at the
# few-step serving point. Converts ONE continuous 60 s clip through the
# sequence-parallel conversion path (scripts/long_audio_convert.py) on the
# real chip (1-device mesh; halo edges zero-masked so the math equals the
# unsharded decode) at 50-step DDPM vs 5-step DPM++. Each arm runs twice —
# the first invocation pays compile (cached to runs/jax_cache), the second
# is the reported row. Uses the swap-protocol VQ-VAE trained by queue
# step 66 (unet32 class-cond, unet encoder).
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

for arm in "ddpm 50" "dpmpp 5"; do
  set -- $arm
  for attempt in compile clean; do
    echo "=== long-audio 60s: sampler=$1 steps=$2 ($attempt) ==="
    timeout 4000 python scripts/long_audio_convert.py \
      --checkpoint-path "$R/vqvae/model.npz" --input /tmp/long60.wav \
      --label 1 --steps "$2" --sampler "$1" \
      --output "/tmp/long60_${1}${2}.wav"
  done
done
echo "long_audio_rtf: DONE"
