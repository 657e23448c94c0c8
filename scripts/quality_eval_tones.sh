#!/bin/bash
# End-to-end quality loop on the tones fixture (VERDICT.md round-2 item 1b):
# train unet32-class diffusion + a classifier on TPU, generate 1k samples at
# f32 AND bf16 (50 steps, t=s^2 warp - the README eval recipe), compute
# Class/Frechet for both, and print the f32-vs-bf16 quality delta.
#
# Run from the repo root on the TPU (no JAX_PLATFORMS override):
#   bash scripts/quality_eval_tones.sh [RUNS_DIR]
set -e
cd "$(dirname "$0")/.."
R=${1:-runs/qeval}
mkdir -p "$R"

echo "=== [1/8] train unet32 class-cond diffusion on tones ==="
python train_diffusion.py tones --predictor unet --base-channels 32 \
  --class-cond --batch-size 8 --save-interval 1000 --max-steps 4000 \
  --output-dir "$R/diff"

echo "=== [2/8] train classifier on tones ==="
python train_classifier.py tones --base-channels 32 --batch-size 8 \
  --save-interval 1000 --max-steps 1500 --output-dir "$R/clf"

echo "=== [3/8] generate 1000 samples, f32 ==="
python sample_diffusion.py --checkpoint-path "$R/diff/model.npz" \
  --num-samples 1000 --batch-size 20 --sample-steps 50 --schedule quadratic \
  --sample-path "$R/samples_f32" --seed 7

echo "=== [4/8] generate 1000 samples, bf16 ==="
python sample_diffusion.py --checkpoint-path "$R/diff/model.npz" \
  --num-samples 1000 --batch-size 20 --sample-steps 50 --schedule quadratic \
  --sample-path "$R/samples_bf16" --seed 7 --bf16

echo "=== [5/8] dataset stats (tones) ==="
python stat_generate.py --checkpoint-path "$R/clf/model.npz" \
  --data-dir tones --num-samples 1000 "$R/stats_data.npz"

echo "=== [6/8] sample stats (f32) ==="
python stat_generate.py --checkpoint-path "$R/clf/model.npz" \
  --sample-dir "$R/samples_f32" "$R/stats_f32.npz"

echo "=== [7/8] sample stats (bf16) ==="
python stat_generate.py --checkpoint-path "$R/clf/model.npz" \
  --sample-dir "$R/samples_bf16" "$R/stats_bf16.npz"

echo "=== [8/8] Frechet scores ==="
echo "--- f32 vs data:"
python stat_compare.py "$R/stats_data.npz" "$R/stats_f32.npz"
echo "--- bf16 vs data:"
python stat_compare.py "$R/stats_data.npz" "$R/stats_bf16.npz"
echo "--- class scores:"
python - "$R" <<'EOF'
import sys

import numpy as np

r = sys.argv[1]
for name in ["stats_data", "stats_f32", "stats_bf16"]:
    s = np.load(f"{r}/{name}.npz")
    print(f"{name}: class_score={float(s['class_score']):.3f}")
EOF
echo "quality_eval_tones: DONE"
