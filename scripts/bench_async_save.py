"""Checkpoint-save overlap benchmark (VERDICT round-3 item 4).

Runs the flagship VQ-VAE train CLI with a deliberately hot save cadence
(--save-interval 5) for each of {npz, orbax} x {sync, async} and reports
median steady-state samples/s plus total wall time. With --async-save the
fetch+write runs on a worker thread, so the save wall-time should hide
behind device compute: async rows should match the no-save baseline within
noise, sync rows should be visibly slower.

Run on TPU:  python scripts/bench_async_save.py [--steps 30]
"""

import argparse
import os
import re
import statistics
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_config(label, extra, steps, save_interval):
    out = tempfile.mkdtemp(prefix="bench_async_save_")
    cmd = [
        sys.executable, os.path.join(ROOT, "train_vqvae.py"), "tones:40",
        "--predictor", "unet", "--base-channels", "64",
        "--encoder", "unet128", "--class-cond", "--bf16",
        "--batch-size", "16",
        "--max-steps", str(steps),
        "--save-interval", str(save_interval),
        "--output-dir", out,
    ] + extra
    start = time.perf_counter()
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=2400)
    wall = time.perf_counter() - start
    if res.returncode != 0:
        print(f"{label}: FAILED\n{res.stdout[-2000:]}\n{res.stderr[-2000:]}")
        return None
    rates = []
    for line in open(os.path.join(out, "train_log.txt")):
        m = re.search(r"samples_per_sec=([0-9.]+)", line)
        sm = re.match(r"step (\d+):", line)
        if m and sm and int(sm.group(1)) > 5:
            rates.append(float(m.group(1)))
    med = statistics.median(rates) if rates else float("nan")
    print(f"{label:40s} median {med:8.1f} samples/s  wall {wall:6.1f} s "
          f"(n={len(rates)})", flush=True)
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--save-interval", type=int, default=5)
    ap.add_argument("--only", type=str, default=None,
                    help="run only configs whose label contains this "
                         "substring")
    args = ap.parse_args()

    configs = [
        ("no saves (baseline)", ["--save-interval", str(10 * args.steps)]),
        ("npz sync", []),
        ("npz async host-snap", ["--async-save"]),
        ("orbax sync", ["--checkpoint-format", "orbax"]),
        ("orbax async host-snap",
         ["--checkpoint-format", "orbax", "--async-save"]),
    ]
    for label, extra in configs:
        if args.only and args.only not in label:
            continue
        run_config(label, extra, args.steps, args.save_interval)


if __name__ == "__main__":
    main()
