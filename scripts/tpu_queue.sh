#!/bin/bash
# Drain the queued TPU measurements in sequence (single chip — serialize).
# Usage: bash scripts/tpu_queue.sh >> /tmp/tpu_queue.log 2>&1 &
#
# Round-4 design: measurements live as drop-in scripts under
# scripts/queue.d/NN_name.sh, executed in sorted order. The drain loop
# re-globs after each full pass, so steps added while a drain is running
# are picked up without a relaunch. Each step is resumable (done marker
# on success, fail counter with a 3-strike cap on persistent failure).
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
# rerun of that step on the next drain (bench.py re-arms the queue when
# it finishes). VVS_TPU_QUEUE guards the queue's own python steps from
# killing their parent. Refuse to start if another live queue holds the
# lock (stale locks from dead queues are reaped).
if [ -f runs/tpu_queue.lock ] && kill -0 "$(cat runs/tpu_queue.lock)" 2>/dev/null; then
  echo "tpu_queue: another drain is live (pid $(cat runs/tpu_queue.lock)); exiting"
  exit 0
fi
echo $$ > runs/tpu_queue.lock
trap 'rm -f runs/tpu_queue.lock' EXIT
export VVS_TPU_QUEUE=1

mkdir -p runs/queue_done

# Persistent XLA compilation cache: each distinct jit program costs
# ~4-5 min to compile through the tunnel; re-runs / resumed queues hit
# the disk cache instead (no-op if the backend can't serialize).
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/repo/runs/jax_cache}"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

# Wait out tunnel outages (round-2 failure mode: the backend can be down
# for hours). The probe runs in a subprocess because `import jax` itself
# hangs when the tunnel is dead.
wait_for_backend() {
  until timeout 180 python -c \
    "import jax; d = jax.devices(); assert d[0].platform == 'tpu', d"; do
    echo "=== backend unreachable: $(date -u); retrying in 300 s ==="
    sleep 300
  done
}

# Content-addressed done markers: the marker name embeds a hash of the
# step script, so EDITING a step automatically re-runs it (round-3
# failure mode: a stale bare-name marker silently skipped a re-queued
# bench). Legacy bare-name markers from rounds <= 4 are still honored
# for unchanged scripts via the explicit migration below.
marker_name() { # script-path -> marker name
  local f="$1"
  echo "$(basename "$f" .sh).$(sha1sum "$f" | cut -c1-10)"
}

step() {
  local name="$1"; shift
  if [ -e "runs/queue_done/$name" ]; then
    echo "=== skip $name (done marker) ==="
    return 0
  fi
  local fails=0
  [ -f "runs/queue_done/$name.fails" ] && fails=$(cat "runs/queue_done/$name.fails")
  if [ "$fails" -ge 3 ]; then
    echo "=== skip $name (failed $fails times; clear runs/queue_done/$name.fails to retry) ==="
    return 0
  fi
  wait_for_backend
  if "$@"; then
    touch "runs/queue_done/$name"
    rm -f "runs/queue_done/$name.fails"
  else
    echo "$((fails + 1))" > "runs/queue_done/$name.fails"
    echo "=== step $name FAILED rc=$? (attempt $((fails + 1))/3) ==="
  fi
}

# Drain passes: re-glob after each pass so drop-ins added mid-drain run
# without a relaunch; stop when a pass finds nothing left to do.
# One-time migration: a legacy bare-name marker means the CURRENT text of
# that step already ran to completion in a previous round — re-stamp it
# with the current hash so only future EDITS re-run it.
for f in scripts/queue.d/*.sh; do
  [ -e "$f" ] || continue
  bare="runs/queue_done/$(basename "$f" .sh)"
  if [ -e "$bare" ] && [ ! -e "runs/queue_done/$(marker_name "$f")" ]; then
    mv "$bare" "runs/queue_done/$(marker_name "$f")"
  fi
done

while :; do
  ran_any=0
  for f in scripts/queue.d/*.sh; do
    [ -e "$f" ] || continue
    name=$(marker_name "$f")
    if [ ! -e "runs/queue_done/$name" ]; then
      fails=0
      [ -f "runs/queue_done/$name.fails" ] && fails=$(cat "runs/queue_done/$name.fails")
      [ "$fails" -ge 3 ] && continue
      ran_any=1
    fi
    step "$name" bash "$f"
  done
  [ "$ran_any" = 0 ] && break
done

echo "=== tpu_queue done: $(date -u) ==="
