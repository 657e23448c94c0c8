"""K-steps-per-dispatch training throughput (VERDICT r4 item 2).

Round-4 ledger: clean paired batch=16 rows gave median 41.2 vs max 47.0
samples/s against a 65.4 roofline — a 12% median-max spread attributed to
tunnel dispatch jitter. --steps-per-dispatch K fuses K optimizer steps into
one jitted lax.scan over K pre-staged batches, amortizing EVERY host
round-trip (dispatch, Python step overhead, metric fetch) over K updates —
the standard TPU mitigation. This measures K in {1, 4, 16} in one quiet
session (paired: the K=1 row is the same-session control).

Within a K-window every logged step carries the dispatch-average rate, so
the per-step median (skipping the first window, which absorbs compile) is
the per-window median.

Run on TPU:  python scripts/bench_kdisp.py [--only "K=4"]
"""

import argparse
import os
import re
import statistics
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_config(label, extra, steps, skip):
    out = tempfile.mkdtemp(prefix="bench_kdisp_")
    cmd = [
        sys.executable, os.path.join(ROOT, "train_vqvae.py"), "tones:40",
        "--max-steps", str(steps), "--save-interval", str(10 * steps),
        "--output-dir", out,
        "--predictor", "unet", "--base-channels", "64",
        "--encoder", "unet128", "--class-cond", "--bf16",
        "--batch-size", "16",
    ] + extra
    res = subprocess.run(cmd, capture_output=True, text=True,
                         env=dict(os.environ), timeout=3000)
    if res.returncode != 0:
        print(f"{label}: FAILED\n{res.stdout[-2000:]}\n{res.stderr[-2000:]}")
        return None
    rates = []
    for line in open(os.path.join(out, "train_log.txt")):
        m = re.search(r"samples_per_sec=([0-9.]+)", line)
        sm = re.match(r"step (\d+):", line)
        if m and sm and int(sm.group(1)) > skip:
            rates.append(float(m.group(1)))
    if not rates:
        print(f"{label:44s} no steady-state steps logged")
        return None
    med = statistics.median(rates)
    print(f"{label:44s} median {med:8.1f} samples/s "
          f"(n={len(rates)}, max {max(rates):.1f})", flush=True)
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    # (label, steps-per-dispatch, total steps, warmup steps to skip).
    # K>1 rows skip the first full window (it absorbs compile); the K=1
    # control skips the same 5 steps bench_train.py does.
    configs = [
        ("vqvae unet64-class bf16 batch=16 K=1", 1, 64, 5),
        ("vqvae unet64-class bf16 batch=16 K=4", 4, 64, 8),
        ("vqvae unet64-class bf16 batch=16 K=16", 16, 128, 16),
    ]
    for label, k, steps, skip in configs:
        if args.only and args.only not in label:
            continue
        extra = [] if k == 1 else ["--steps-per-dispatch", str(k)]
        run_config(label, extra, steps, skip)


if __name__ == "__main__":
    main()
