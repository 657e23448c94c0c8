#!/bin/bash
# Rerun the tones quality loop at the reference's 10k-sample eval protocol
# (/root/reference/README.md:43) — round-2 VERDICT item 4: 1k samples is too
# thin for ±5% Frechet claims over 512-dim feature covariances.
#
# Reuses the checkpoints + dataset stats from a prior quality_eval_tones.sh
# run; generates 10k samples per arm (f32, bf16, 10-step DDIM) and reports
# Frechet/Class for each. Long (hours on one chip) — run last in the queue.
#   bash scripts/quality_eval_10k.sh [RUNS_DIR]
set -e
cd "$(dirname "$0")/.."
R=${1:-runs/qeval}
N=${2:-10000}
test -f "$R/diff/model.npz" || { echo "run quality_eval_tones.sh first"; exit 1; }

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
    # Reclaim ~2.5 GB of wavs once the stats exist.
    rm -rf "$R/samples_${name}_10k"
  fi
}

gen bf16 --sample-steps 50 --bf16
gen ddim10 --sample-steps 10 --sampler ddim --bf16
gen f32 --sample-steps 50

echo "=== Frechet vs dataset stats (N=${N} per generated arm) ==="
for name in f32 bf16 ddim10; do
  echo "--- $name vs data:"
  python stat_compare.py "$R/stats_data.npz" "$R/stats_${name}_10k.npz"
done
echo "--- class scores:"
python - "$R" <<'EOF'
import sys

import numpy as np

r = sys.argv[1]
for name in ["stats_data", "stats_f32_10k", "stats_bf16_10k",
             "stats_ddim10_10k"]:
    s = np.load(f"{r}/{name}.npz")
    print(f"{name}: class_score={float(s['class_score']):.3f} "
          f"n={s['probs'].shape[0]}")
EOF
echo "quality_eval_10k: DONE"
