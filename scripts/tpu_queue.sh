#!/bin/bash
# Drain the queued TPU measurements in sequence (single chip — serialize).
# Usage: bash scripts/tpu_queue.sh >> /tmp/tpu_queue.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

# Mirror everything into the repo so partial results survive a round
# boundary (the driver commits the tree; /tmp may not persist).
mkdir -p runs
exec > >(tee -a runs/tpu_queue_results.log) 2>&1

echo "=== tpu_queue start: $(date -u) ==="

# Chip ownership lock: bench.py (the driver's official headline run) reads
# this and terminates a live queue by PID ancestry to get a quiet chip —
# every step below is resumable, so being killed mid-step only costs a
# rerun of that step on the next drain. VVS_TPU_QUEUE guards the queue's
# own headline step from killing its parent.
echo $$ > runs/tpu_queue.lock
trap 'rm -f runs/tpu_queue.lock' EXIT
export VVS_TPU_QUEUE=1

# Resumable: each step records a done-marker so a relaunched queue (the
# driver/session can die mid-drain) skips completed measurements.
mkdir -p runs/queue_done
step() {
  local name="$1"; shift
  if [ -e "runs/queue_done/$name" ]; then
    echo "=== skip $name (done marker) ==="
    return 0
  fi
  if "$@"; then
    touch "runs/queue_done/$name"
  else
    echo "=== step $name FAILED rc=$? (no marker; will retry on relaunch) ==="
  fi
}

# Persistent XLA compilation cache: each distinct jit program costs
# ~4-5 min to compile through the tunnel; re-runs / resumed queues hit
# the disk cache instead (no-op if the backend can't serialize).
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/repo/runs/jax_cache}"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

# 0. Headline first: if the tunnel dies again before round end, this is
#    the BENCH_r03 number (bench.py emits one JSON line).
step headline bash -c "timeout 1800 python bench.py | tee runs/bench_headline.json"

# 1. Train throughput (VERDICT #5): batch scaling + pipeline depth + f32 row.
step bench_train timeout 4500 python scripts/bench_train.py --steps 30

# 1b. Train-step roofline (FLOPs/bytes from XLA cost analysis). Quick —
#     runs before the long train rows so a short window still lands it.
step roofline_b8 timeout 1200 python scripts/train_roofline.py --batch-size 8
step roofline_b32 timeout 1200 python scripts/train_roofline.py --batch-size 32

# 1a. Large-batch rows rerun: the first drain's batch-32/64 rows died on
#     the 30-item tones fixture cap, and monolithic batch>=32 OOMs the
#     16 GB chip — the rows now use microbatch accumulation / remat
#     (see bench_train.py). Plus the batch=16 depth=4 pipeline row.
#     (batch=32 rows landed 2026-08-18: micro=16 40.8 med / remat 34.6 —
#     recorded in PERF.md; only the remaining rows rerun here.)
step bench_train_large bash -c "timeout 2400 python scripts/bench_train.py --steps 30 --only 'batch=64' && timeout 2400 python scripts/bench_train.py --steps 30 --only 'batch=16 depth'"

# 2. VQ Pallas kernel rent check at large codebooks (VERDICT #7).
step bench_vq timeout 1800 python scripts/bench_vq.py

# 3. XLA scoped-vmem flag sweep on the headline bench.
step xla_flags timeout 3000 python scripts/bench_xla_flags.py

# 4. Donated-buffer sampling row (last unmeasured ledger idea) + matmul-GN.
step bench_sampling timeout 1800 python scripts/bench_sampling.py

# 4a. VQ-VAE voice-swap real-time factor (the second north-star metric).
step swap_rtf timeout 1800 python scripts/bench_swap_rtf.py

# 4b. Profiled short train run: the trace feeds the round-4 training
#     optimization pass (kernel-level breakdown of the 0.19 s step).
step profile_train timeout 1800 python train_vqvae.py tones --predictor unet --base-channels 64 \
  --encoder unet128 --class-cond --bf16 --batch-size 8 --max-steps 12 \
  --save-interval 1000 --profile-dir runs/profile_train \
  --output-dir /tmp/profile_train_ckpt

# 5. Quality loop prerequisites: runs/ is gitignored, so the round-2
#    qeval checkpoints did not survive the round boundary — retrain the
#    tones diffusion + classifier (and land the 1k f32/bf16 arms while
#    we're at it; they double as an early fallback datapoint).
step qeval_tones timeout 7200 bash scripts/quality_eval_tones.sh runs/qeval

# 5b. DDIM few-step quality arm (reuses runs/qeval checkpoints).
step qeval_ddim timeout 3000 bash scripts/quality_eval_ddim.sh runs/qeval 10

# 6. Rerun the quality loop at the reference's 10k-sample protocol
#    (/root/reference/README.md:43); long — intentionally last.
step qeval_10k timeout 18000 bash scripts/quality_eval_10k.sh runs/qeval

echo "=== tpu_queue done: $(date -u) ==="
