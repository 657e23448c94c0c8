#!/bin/bash
# DDIM few-step quality arm, reusing the checkpoints + dataset stats from a
# prior quality_eval_tones.sh run: generate 1k samples with 10-step DDIM
# (5x fewer forwards than the 50-step DDPM headline) and compare Frechet /
# Class score against the dataset stats and the 50-step DDPM arms.
#
# Run from the repo root on the TPU after quality_eval_tones.sh:
#   bash scripts/quality_eval_ddim.sh [RUNS_DIR] [STEPS]
set -e
cd "$(dirname "$0")/.."
R=${1:-runs/qeval}
S=${2:-10}
test -f "$R/diff/model.npz" || { echo "run quality_eval_tones.sh first"; exit 1; }

echo "=== generate 1000 samples, ${S}-step DDIM bf16 ==="
python sample_diffusion.py --checkpoint-path "$R/diff/model.npz" \
  --num-samples 1000 --batch-size 20 --sample-steps "$S" \
  --sampler ddim --schedule quadratic \
  --sample-path "$R/samples_ddim$S" --seed 7 --bf16

echo "=== sample stats (ddim$S) ==="
python stat_generate.py --checkpoint-path "$R/clf/model.npz" \
  --sample-dir "$R/samples_ddim$S" "$R/stats_ddim$S.npz"

echo "=== Frechet/Class vs dataset ==="
python stat_compare.py "$R/stats_ddim$S.npz" "$R/stats_data.npz"
echo "=== Frechet/Class vs 50-step DDPM bf16 ==="
python stat_compare.py "$R/stats_ddim$S.npz" "$R/stats_bf16.npz"
