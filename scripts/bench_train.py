"""Training-throughput benchmark (PERF.md round-2, VERDICT item 5).

Runs the unet64-class VQ-VAE train CLI (the round-1 reference config) on
the real chip for a few dozen steps across batch sizes and reports median
steady-state samples/sec from the train log, plus the device-step/dispatch
breakdown.

Run on TPU:  python scripts/bench_train.py [--steps 30]
"""

import argparse
import os
import re
import statistics
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_config(label, cli, extra, steps):
    out = tempfile.mkdtemp(prefix="bench_train_")
    # tones:40 = 120 items (the default 30-item fixture caps batch_size
    # under drop_last); identical shapes/compute per step either way.
    cmd = [
        sys.executable, os.path.join(ROOT, cli), "tones:40",
        "--max-steps", str(steps), "--save-interval", str(10 * steps),
        "--output-dir", out,
    ] + extra
    env = dict(os.environ)
    res = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         timeout=1800)
    if res.returncode != 0:
        print(f"{label}: FAILED\n{res.stdout[-2000:]}\n{res.stderr[-2000:]}")
        return None
    rates = []
    log = os.path.join(out, "train_log.txt")
    for line in open(log):
        m = re.search(r"samples_per_sec=([0-9.]+)", line)
        sm = re.match(r"step (\d+):", line)
        if m and sm and int(sm.group(1)) > 5:  # skip compile/warmup steps
            rates.append(float(m.group(1)))
    if not rates:
        print(f"{label:44s} no steady-state steps logged (run too short?)")
        return None
    med = statistics.median(rates)
    print(f"{label:44s} median {med:8.1f} samples/s "
          f"(n={len(rates)}, max {max(rates):.1f})", flush=True)
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--only", default=None,
                    help="substring filter on config labels (rerun one row)")
    args = ap.parse_args()

    base = ["--predictor", "unet", "--base-channels", "64",
            "--encoder", "unet128", "--class-cond", "--bf16"]
    configs = []
    for bs in (8, 16):
        configs.append((f"vqvae unet64-class bf16 batch={bs}",
                        base + ["--batch-size", str(bs)]))
    # Monolithic batch>=32 OOMs the 16 GB v5e HBM (bf16 [32,32000,128]
    # activation temps alone are 250 MB each); the large-batch rows use the
    # same two tools a real run would: microbatch accumulation (the
    # reference's own answer, train_loop.py:99-112) or per-block remat.
    configs.append(("vqvae unet64-class bf16 batch=32 micro=16",
                    base + ["--batch-size", "32", "--microbatch", "16"]))
    configs.append(("vqvae unet64-class bf16 batch=32 remat",
                    base + ["--batch-size", "32", "--grad-checkpoint"]))
    # Policy remat ("convs"): saves only conv outputs, recomputes the
    # norm/GELU chains — targets saved-activation HBM bytes, the training
    # roofline's limiter, without paying conv FLOPs twice.
    configs.append(("vqvae unet64-class bf16 batch=16 remat-convs",
                    base + ["--batch-size", "16",
                            "--grad-checkpoint", "convs"]))
    configs.append(("vqvae unet64-class bf16 batch=32 remat-convs",
                    base + ["--batch-size", "32",
                            "--grad-checkpoint", "convs"]))
    configs.append(("vqvae unet64-class bf16 batch=64 micro=16",
                    base + ["--batch-size", "64", "--microbatch", "16"]))
    # Deeper metric pipeline: smooths tunnel dispatch jitter (the round-2
    # median-vs-peak gap) without changing the device program.
    for bs in (8, 16):
        configs.append((f"vqvae unet64-class bf16 batch={bs} depth=4",
                        base + ["--batch-size", str(bs),
                                "--pipeline-depth", "4"]))
    # f32 reference point at the round-1 config.
    configs.append(("vqvae unet64-class f32 batch=8",
                    [a for a in base if a != "--bf16"]
                    + ["--batch-size", "8"]))
    for label, extra in configs:
        if args.only and args.only not in label:
            continue
        run_config(label, "train_vqvae.py", extra, args.steps)


if __name__ == "__main__":
    main()
