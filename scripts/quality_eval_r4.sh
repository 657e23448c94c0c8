#!/bin/bash
# Round-4 quality protocol: the reference's 10k-sample eval
# (/root/reference/README.md:43) over three sampling arms — f32 50-step
# DDPM, bf16 50-step DDPM (the headline serving config), and bf16 10-step
# DDIM (the 64x-real-time serving arm) — against dataset stats featurized
# by the same classifier.
#
# Fully resumable at every level: checkpoints retrain only if lost (they
# are gitignored working space and did not survive the round-3 boundary),
# finished arms skip on their stats file, and sample generation inside an
# arm resumes batch-exact (sample_diffusion.py seeds each batch
# independently and writes wavs atomically).
#
# Run from the repo root on the TPU:
#   bash scripts/quality_eval_r4.sh [RUNS_DIR] [N]
set -e
cd "$(dirname "$0")/.."
R=${1:-runs/qeval}
N=${2:-10000}
mkdir -p "$R"

# [1] checkpoints. A .done marker (not the ckpt file) gates retraining:
# the train CLIs save every 1000 steps, so a half-trained model.npz exists
# mid-run; relaunching resumes from it via checkpoint discovery. Fresh
# checkpoints invalidate every stats file (Frechet features must come
# from THIS classifier).
if [ ! -f "$R/diff/.done" ] || [ ! -f "$R/clf/.done" ]; then
  rm -f "$R"/stats_*_10k.npz "$R/stats_data10k.npz" "$R/report_10k.txt"
  if [ ! -f "$R/diff/.done" ]; then
    echo "=== train unet32 class-cond diffusion on tones (4k steps) ==="
    python train_diffusion.py tones --predictor unet --base-channels 32 \
      --class-cond --batch-size 8 --save-interval 1000 --max-steps 4000 \
      --output-dir "$R/diff"
    touch "$R/diff/.done"
  fi
  if [ ! -f "$R/clf/.done" ]; then
    echo "=== train classifier on tones (1.5k steps) ==="
    python train_classifier.py tones --base-channels 32 --batch-size 8 \
      --save-interval 1000 --max-steps 1500 --output-dir "$R/clf"
    touch "$R/clf/.done"
  fi
fi

# [2] dataset stats at the 10k scale.
if [ ! -f "$R/stats_data10k.npz" ]; then
  echo "=== dataset stats (tones:3334, n=$N) ==="
  python stat_generate.py --checkpoint-path "$R/clf/model.npz" \
    --data-dir tones:3334 --num-samples "$N" "$R/stats_data10k.npz"
fi

# [3] arms. Keeps the wav dir until the stats exist (for resume), then
# reclaims the ~1.3 GB.
gen () { # name extra-flags...
  local name=$1; shift
  if [ ! -f "$R/stats_${name}_10k.npz" ]; then
    echo "=== generate $N samples: $name ==="
    python sample_diffusion.py --checkpoint-path "$R/diff/model.npz" \
      --num-samples "$N" --batch-size 20 --schedule quadratic \
      --sample-path "$R/samples_${name}_10k" --seed 7 "$@"
    echo "=== stats: $name ==="
    python stat_generate.py --checkpoint-path "$R/clf/model.npz" \
      --sample-dir "$R/samples_${name}_10k" "$R/stats_${name}_10k.npz"
    rm -rf "$R/samples_${name}_10k"
  fi
}

gen bf16 --sample-steps 50 --bf16
gen ddim10 --sample-steps 10 --sampler ddim --bf16
gen f32 --sample-steps 50

# [4] report (committed: runs/qeval/*.txt survives the round boundary).
{
  echo "# 10k-sample quality protocol (quality_eval_r4.sh), $(date -u)"
  echo "# N=$N per arm; unet32 class-cond tones diffusion + classifier"
  echo "=== Frechet vs dataset stats ==="
  for name in f32 bf16 ddim10; do
    echo "--- $name vs data:"
    python stat_compare.py "$R/stats_data10k.npz" "$R/stats_${name}_10k.npz"
  done
  echo "=== pairwise: bf16 vs f32, ddim10 vs bf16 ==="
  python stat_compare.py "$R/stats_f32_10k.npz" "$R/stats_bf16_10k.npz"
  python stat_compare.py "$R/stats_bf16_10k.npz" "$R/stats_ddim10_10k.npz"
  echo "=== class scores ==="
  python - "$R" <<'EOF'
import sys

import numpy as np

r = sys.argv[1]
for name in ["stats_data10k", "stats_f32_10k", "stats_bf16_10k",
             "stats_ddim10_10k"]:
    s = np.load(f"{r}/{name}.npz")
    print(f"{name}: class_score={float(s['class_score']):.4f} "
          f"n={s['probs'].shape[0]}")
EOF
} | tee "$R/report_10k.txt"
echo "quality_eval_r4: DONE"
