#!/bin/bash
# VERDICT r4 item 1: quality-prove the few-step serving point ON THE SWAP
# PATH. Every earlier 10k arm was an unconditional sample_diffusion arm;
# this trains a class-cond VQ-VAE on tones and runs the conditioned
# encode->decode conversion (vq_vae.py:205-270) at n=10k for the four
# serving arms, reporting per arm:
#   - Frechet vs dataset stats + class score (same classifier featurizer)
#   - check-vq re-encode agreement (reference sample_vqvae.py:58-62)
#   - target-tone accuracy / source-tone leak (fixture ground truth)
# Fully resumable: checkpoints gate on .done, arms gate on their stats
# file, and swap_eval.py resumes batch-exact inside an arm.
set -e
cd "$(dirname "$0")/../.."
R=runs/qswap
N=10000
mkdir -p "$R"

if [ ! -f "$R/vqvae/.done" ]; then
  echo "=== train unet32 class-cond VQ-VAE on tones (4k steps) ==="
  timeout 14000 python train_vqvae.py tones --predictor unet \
    --base-channels 32 --class-cond --batch-size 8 \
    --save-interval 1000 --max-steps 4000 --output-dir "$R/vqvae"
  touch "$R/vqvae/.done"
fi
if [ ! -f "$R/clf/.done" ]; then
  echo "=== train classifier on tones (1.5k steps) ==="
  timeout 7200 python train_classifier.py tones --base-channels 32 \
    --batch-size 8 --save-interval 1000 --max-steps 1500 \
    --output-dir "$R/clf"
  touch "$R/clf/.done"
fi

if [ ! -f "$R/stats_data10k.npz" ]; then
  echo "=== dataset stats (tones:3334, n=$N) ==="
  timeout 7200 python stat_generate.py --checkpoint-path "$R/clf/model.npz" \
    --data-dir tones:3334 --num-samples "$N" "$R/stats_data10k.npz"
fi

arm () { # name steps sampler
  local name=$1 steps=$2 sampler=$3
  if [ ! -f "$R/stats_${name}_10k.npz" ]; then
    echo "=== swap $N clips: $name ==="
    timeout 14000 python scripts/swap_eval.py \
      --num-samples "$N" --batch-size 20 --sample-steps "$steps" \
      --sampler "$sampler" --bf16 --seed 7 \
      "$R/vqvae/model.npz" "$R/swap_${name}_10k"
    cp "$R/swap_${name}_10k/report.json" "$R/swapmetrics_${name}_10k.json"
    echo "=== stats: $name ==="
    timeout 7200 python stat_generate.py --checkpoint-path "$R/clf/model.npz" \
      --sample-dir "$R/swap_${name}_10k" "$R/stats_${name}_10k.npz"
    rm -rf "$R/swap_${name}_10k"
  fi
}

arm ddpm50 50 ddpm
arm dpmpp5 5 dpmpp
arm dpmpp10 10 dpmpp
arm ddim10 10 ddim

{
  echo "# swap-path quality protocol (N=$N per arm), $(date -u)"
  echo "# unet32 class-cond VQ-VAE conversions on tones; bf16 serving"
  for name in ddpm50 ddim10 dpmpp10 dpmpp5; do
    echo "--- $name vs data:"
    python stat_compare.py "$R/stats_data10k.npz" "$R/stats_${name}_10k.npz"
    echo "    swap metrics: $(cat "$R/swapmetrics_${name}_10k.json")"
  done
  echo "=== class scores ==="
  python - "$R" <<'EOF'
import sys

import numpy as np

r = sys.argv[1]
for name in ["stats_data10k", "stats_ddpm50_10k", "stats_ddim10_10k",
             "stats_dpmpp10_10k", "stats_dpmpp5_10k"]:
    s = np.load(f"{r}/{name}.npz")
    print(f"{name}: class_score={float(s['class_score']):.4f}")
EOF
} | tee "$R/report_swap10k.txt"
echo "qeval_swap10k: DONE"
