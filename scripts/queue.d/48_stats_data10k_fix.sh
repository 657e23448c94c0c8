#!/bin/bash
# Recompute the DATASET side of the 10k protocol at real 10k scale.
#
# The first 20_qeval_10k_r4 run asked stat_generate for 10000 dataset
# segments but the base `tones` fixture only has 30 items (3 speakers x 10
# phases) and the loader is single-epoch, so stats_data10k.npz silently
# landed with n=30 — a 30-sample covariance is a noisy Frechet reference.
# `tones:3334` scales to 3334 phases/speaker = 10002 distinct items from
# the same distribution (phase is the nuisance variable). The model arms
# (n=10000 each) are untouched; this replaces only the data-side stats and
# regenerates the report rows. Runs before 50_qeval_dpmpp so the dpmpp
# report uses the corrected reference too.
set -e
cd "$(dirname "$0")/../.."
R=runs/qeval
N=10000

probs_n=$(python - "$R/stats_data10k.npz" <<'EOF'
import sys

import numpy as np

try:
    print(np.load(sys.argv[1])["probs"].shape[0])
except Exception:
    print(0)
EOF
)
if [ "$probs_n" -lt "$N" ]; then
  echo "=== dataset stats at real 10k scale (tones:3334, was n=$probs_n) ==="
  timeout 7200 python stat_generate.py --checkpoint-path "$R/clf/model.npz" \
    --data-dir tones:3334 --num-samples "$N" "$R/stats_data10k.npz.tmp.npz"
  mv "$R/stats_data10k.npz.tmp.npz" "$R/stats_data10k.npz"
fi

# Regenerate the report for every arm whose stats exist.
{
  echo "# 10k-sample quality protocol (data stats n=$N), $(date -u)"
  for name in f32 bf16 ddim10 dpmpp5 dpmpp10; do
    if [ -f "$R/stats_${name}_10k.npz" ]; then
      echo "--- $name vs data:"
      python stat_compare.py "$R/stats_data10k.npz" "$R/stats_${name}_10k.npz"
    fi
  done
  if [ -f "$R/stats_f32_10k.npz" ] && [ -f "$R/stats_bf16_10k.npz" ]; then
    echo "--- bf16 vs f32:"
    python stat_compare.py "$R/stats_f32_10k.npz" "$R/stats_bf16_10k.npz"
  fi
  if [ -f "$R/stats_ddim10_10k.npz" ] && [ -f "$R/stats_bf16_10k.npz" ]; then
    echo "--- ddim10 vs bf16:"
    python stat_compare.py "$R/stats_bf16_10k.npz" "$R/stats_ddim10_10k.npz"
  fi
  echo "=== class scores ==="
  python - "$R" <<'EOF'
import glob
import os
import sys

import numpy as np

r = sys.argv[1]
for path in [f"{r}/stats_data10k.npz"] + sorted(
    glob.glob(f"{r}/stats_*_10k.npz")
):
    s = np.load(path)
    print(f"{os.path.basename(path)}: "
          f"class_score={float(s['class_score']):.4f} "
          f"n={s['probs'].shape[0]}")
EOF
} | tee "$R/report_10k_fixed.txt"
echo "stats_data10k_fix: DONE"
