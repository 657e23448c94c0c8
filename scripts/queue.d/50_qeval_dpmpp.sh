#!/bin/bash
# DPM-Solver++(2M) quality arms at the 10k protocol: the serving claim is
# that 5-10 dpmpp steps match the 10-step DDIM arm's quality with fewer
# (or equal) predictor calls. Reuses the quality_eval_r4.sh checkpoints +
# dataset stats; resumable per arm on the stats file.
set -e
cd "$(dirname "$0")/../.."
R=runs/qeval
N=10000
test -f "$R/diff/.done" || { echo "quality_eval_r4 checkpoints missing"; exit 1; }

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

gen dpmpp5 --sample-steps 5 --sampler dpmpp --bf16
gen dpmpp10 --sample-steps 10 --sampler dpmpp --bf16

{
  echo "# dpmpp quality arms (N=$N), $(date -u)"
  for name in dpmpp5 dpmpp10; do
    echo "--- $name vs data:"
    python stat_compare.py "$R/stats_data10k.npz" "$R/stats_${name}_10k.npz"
  done
  if [ -f "$R/stats_ddim10_10k.npz" ]; then
    echo "--- dpmpp5 vs ddim10:"
    python stat_compare.py "$R/stats_dpmpp5_10k.npz" "$R/stats_ddim10_10k.npz"
  fi
  python - "$R" <<'EOF'
import sys

import numpy as np

r = sys.argv[1]
for name in ["stats_dpmpp5_10k", "stats_dpmpp10_10k"]:
    s = np.load(f"{r}/{name}.npz")
    print(f"{name}: class_score={float(s['class_score']):.4f}")
EOF
} | tee "$R/report_dpmpp.txt"
echo "qeval_dpmpp: DONE"
