#!/bin/bash
# One-command parity harness against the reference's RELEASED checkpoints
# (VERDICT round-3 item 5; reference README.md:25-57 + BASELINE.md north
# star). Executes the full published eval protocol the moment the artifact
# files are available:
#
#   convert .pt -> npz, generate 10k samples (50-step DDPM, t=s^2 warp,
#   the README recipe), featurize with the released eval classifier,
#   and report Class score + Frechet score vs the released dataset stats —
#   next to the published numbers for the named model.
#
# Usage:
#   bash scripts/released_parity.sh DIFFUSION_PT EVAL_CLASSIFIER_PT \
#       DATASET_STATS_NPZ [OUT_DIR]
#
# where the artifacts are the reference's released files
#   DIFFUSION_PT       e.g. unet64's model_ema_0.9999.pt
#                      (data.aqnichol.com/vq-voice-swap/unet64/)
#   EVAL_CLASSIFIER_PT model_classifier.pt
#                      (data.aqnichol.com/vq-voice-swap/eval/)
#   DATASET_STATS_NPZ  train_clean_360.npz (same eval/ directory; our
#                      stat_compare reads the reference npz keys directly)
#
# Published numbers (reference README.md:49-57), reported for context when
# OUT_DIR's basename or the .pt path mentions the model:
#   unet32:              Class 47.1   Frechet 2494
#   unet64:              Class 69.0   Frechet 1834
#   unet64/early_stopped: Class 51.5  Frechet  855
#
# Dry-run-able: N / STEPS / BATCH / DTYPE_FLAG env overrides let the test
# suite run the whole pipeline with a tiny locally-built .pt in seconds
# (tests/test_cli_smoke.py::test_released_parity_harness_dry_run).
set -e
cd "$(dirname "$0")/.."

DIFF_PT=${1:?usage: released_parity.sh DIFFUSION_PT EVAL_CLASSIFIER_PT DATASET_STATS_NPZ [OUT_DIR]}
CLF_PT=${2:?missing EVAL_CLASSIFIER_PT}
DATA_STATS=${3:?missing DATASET_STATS_NPZ}
OUT=${4:-runs/released_parity}
N=${N:-10000}            # the published protocol (README.md:43)
STEPS=${STEPS:-50}       # the published sampling recipe
BATCH=${BATCH:-16}
# Parity claims run f32 (the reference's own numerics); DTYPE_FLAG=--bf16
# adds the serving arm.
DTYPE_FLAG=${DTYPE_FLAG:-}

mkdir -p "$OUT"

echo "=== [1/4] convert checkpoints ==="
if [ ! -f "$OUT/diffusion.npz" ]; then
  python convert_checkpoint.py "$DIFF_PT" "$OUT/diffusion.npz"
fi
if [ ! -f "$OUT/classifier.npz" ]; then
  python convert_checkpoint.py "$CLF_PT" "$OUT/classifier.npz"
fi

echo "=== [2/4] generate $N samples ($STEPS-step DDPM, quadratic warp) ==="
python sample_diffusion.py --checkpoint-path "$OUT/diffusion.npz" \
  --num-samples "$N" --batch-size "$BATCH" --sample-steps "$STEPS" \
  --schedule quadratic --sample-path "$OUT/samples" --seed 7 $DTYPE_FLAG

echo "=== [3/4] featurize with the released eval classifier ==="
python stat_generate.py --checkpoint-path "$OUT/classifier.npz" \
  --sample-dir "$OUT/samples" "$OUT/stats.npz"

echo "=== [4/4] Frechet vs released dataset stats ==="
{
  echo "# released-checkpoint parity run, $(date -u)"
  echo "# diffusion: $DIFF_PT"
  echo "# classifier: $CLF_PT  data stats: $DATA_STATS"
  echo "# N=$N steps=$STEPS dtype=${DTYPE_FLAG:-f32}"
  echo "--- class score:"
  python - "$OUT/stats.npz" <<'EOF'
import sys

import numpy as np

s = np.load(sys.argv[1])
print(float(s["class_score"]))
EOF
  echo "--- Frechet score:"
  python stat_compare.py "$OUT/stats.npz" "$DATA_STATS"
  case "$DIFF_PT$OUT" in
    *early_stopped*) echo "published (unet64/early_stopped): Class 51.5, Frechet 855" ;;
    *unet64*) echo "published (unet64): Class 69.0, Frechet 1834" ;;
    *unet32*) echo "published (unet32): Class 47.1, Frechet 2494" ;;
  esac
  echo "parity bar: Frechet within ±5% of published (BASELINE.md)"
} | tee "$OUT/report.txt"
echo "released_parity: DONE (report: $OUT/report.txt)"
