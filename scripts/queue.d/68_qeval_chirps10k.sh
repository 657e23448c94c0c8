#!/bin/bash
# VERDICT r4 item 5: protocol portability. Re-runs the sampler-arm ranking
# (ddpm50 / ddim10 / dpmpp10 / dpmpp5, bf16 serving) at the 10k protocol on
# the HARDER synthetic fixture (data/datasets.py::ChirpDataset: 8 AM/FM-chirp
# speakers with noise bursts) to test whether dpmpp5's win on the 3-tone
# manifold survives non-stationary content. Same structure as
# quality_eval_r4.sh; fully resumable (ckpt .done markers, per-arm stats
# files, batch-exact sample resume).
set -e
cd "$(dirname "$0")/../.."
R=runs/qchirp
N=10000
mkdir -p "$R"

if [ ! -f "$R/diff/.done" ]; then
  echo "=== train unet32 class-cond diffusion on chirps:125 (4k steps) ==="
  timeout 14000 python train_diffusion.py chirps:125 --predictor unet \
    --base-channels 32 --class-cond --batch-size 8 \
    --save-interval 1000 --max-steps 4000 --output-dir "$R/diff"
  touch "$R/diff/.done"
fi
if [ ! -f "$R/clf/.done" ]; then
  echo "=== train classifier on chirps:125 (1.5k steps) ==="
  timeout 7200 python train_classifier.py chirps:125 --base-channels 32 \
    --batch-size 8 --save-interval 1000 --max-steps 1500 \
    --output-dir "$R/clf"
  touch "$R/clf/.done"
fi

if [ ! -f "$R/stats_data10k.npz" ]; then
  echo "=== dataset stats (chirps:1250, n=$N) ==="
  timeout 7200 python stat_generate.py --checkpoint-path "$R/clf/model.npz" \
    --data-dir chirps:1250 --num-samples "$N" "$R/stats_data10k.npz"
fi

gen () { # name extra-flags...
  local name=$1; shift
  if [ ! -f "$R/stats_${name}_10k.npz" ]; then
    echo "=== generate $N samples: $name ==="
    timeout 14000 python sample_diffusion.py --checkpoint-path "$R/diff/model.npz" \
      --num-samples "$N" --batch-size 20 --schedule quadratic \
      --sample-path "$R/samples_${name}_10k" --seed 7 "$@"
    echo "=== stats: $name ==="
    timeout 7200 python stat_generate.py --checkpoint-path "$R/clf/model.npz" \
      --sample-dir "$R/samples_${name}_10k" "$R/stats_${name}_10k.npz"
    rm -rf "$R/samples_${name}_10k"
  fi
}

gen ddpm50 --sample-steps 50 --bf16
gen ddim10 --sample-steps 10 --sampler ddim --bf16
gen dpmpp10 --sample-steps 10 --sampler dpmpp --bf16
gen dpmpp5 --sample-steps 5 --sampler dpmpp --bf16

{
  echo "# chirps sampler-arm ranking (N=$N per arm), $(date -u)"
  for name in ddpm50 ddim10 dpmpp10 dpmpp5; do
    echo "--- $name vs data:"
    python stat_compare.py "$R/stats_data10k.npz" "$R/stats_${name}_10k.npz"
  done
  echo "=== class scores ==="
  python - "$R" <<'PYEOF'
import sys

import numpy as np

r = sys.argv[1]
for name in ["stats_data10k", "stats_ddpm50_10k", "stats_ddim10_10k",
             "stats_dpmpp10_10k", "stats_dpmpp5_10k"]:
    s = np.load(f"{r}/{name}.npz")
    print(f"{name}: class_score={float(s['class_score']):.4f}")
PYEOF
} | tee "$R/report_chirps10k.txt"
echo "qeval_chirps10k: DONE"
