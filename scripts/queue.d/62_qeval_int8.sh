#!/bin/bash
# int8-stored activation quality arms at the 10k protocol (the gate for
# the act_int8_min_t serving knob): 50-step DDPM bf16+int8 isolates the
# quantization effect against the existing bf16 arm; 5-step DPM++ int8
# is the combined fastest serving point. Threshold 16000 = the top three
# UNet levels of a 64000-sample clip, matching the perf arms.
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

gen int8 --sample-steps 50 --bf16 --act-int8 16000
gen int8dpmpp5 --sample-steps 5 --sampler dpmpp --bf16 --act-int8 16000

{
  echo "# int8 quality arms (N=$N, act_int8_min_t=16000), $(date -u)"
  for name in int8 int8dpmpp5; do
    echo "--- $name vs data:"
    python stat_compare.py "$R/stats_data10k.npz" "$R/stats_${name}_10k.npz"
  done
  echo "--- int8 (ddpm50) vs bf16 (ddpm50) pairwise:"
  python stat_compare.py "$R/stats_bf16_10k.npz" "$R/stats_int8_10k.npz"
  if [ -f "$R/stats_dpmpp5_10k.npz" ]; then
    echo "--- int8dpmpp5 vs dpmpp5 pairwise:"
    python stat_compare.py "$R/stats_dpmpp5_10k.npz" "$R/stats_int8dpmpp5_10k.npz"
  fi
  python - "$R" <<'EOF'
import sys

import numpy as np

r = sys.argv[1]
for name in ["stats_int8_10k", "stats_int8dpmpp5_10k"]:
    s = np.load(f"{r}/{name}.npz")
    print(f"{name}: class_score={float(s['class_score']):.4f}")
EOF
} | tee "$R/report_int8.txt"
echo "qeval_int8: DONE"
