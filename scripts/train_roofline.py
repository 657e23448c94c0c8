"""Roofline for the TRAINING step (VERDICT round-2 item 2): FLOPs + bytes
from XLA cost analysis of the exact jitted train step the CLI runs, and the
implied compute/memory-bound step times at chip peak.

Counterpart of the sampling roofline in PERF.md. NOTE: "bytes accessed"
comes from the backend's post-fusion HLO, so only a TPU run gives the real
memory-bound figure (the CPU lowering fuses far less and overstates bytes
~10x). Run on the TPU:

    python scripts/train_roofline.py [--batch-size 8] [--measured-ms 190]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

# TPU v5e peaks (same constants as the PERF.md sampling roofline).
PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBPS = 819.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--no-bf16", dest="bf16", action="store_false")
    ap.add_argument("--measured-ms", type=float, default=None,
                    help="measured steady-state step time to compare")
    ap.add_argument("--microbatch", type=int, default=None,
                    help="accumulate in microbatches (required for the "
                         "batch>=32 configs: monolithic steps OOM 16GB HBM)")
    ap.add_argument("--grad-checkpoint", nargs="?", const="full",
                    default=False, choices=["full", "convs"])
    args = ap.parse_args()

    from vq_voice_swap_tpu.train import VQVAETrainLoop

    loop_args = VQVAETrainLoop.arg_parser().parse_args(
        [
            "--predictor", "unet", "--base-channels", "64",
            "--encoder", "unet128", "--class-cond",
            "--batch-size", str(args.batch_size),
            "--output-dir", "/tmp/train_roofline_ckpt",
            *(["--bf16"] if args.bf16 else []),
            *(["--microbatch", str(args.microbatch)]
              if args.microbatch else []),
            *(["--grad-checkpoint", args.grad_checkpoint]
              if args.grad_checkpoint else []),
            # tones:40 = 120 items; the 30-item fixture caps batch_size.
            "tones:40",
        ]
    )
    loop = VQVAETrainLoop(loop_args)

    batch = next(iter(loop.data_loader))
    from vq_voice_swap_tpu.parallel import global_batch_from_local

    device_batch = global_batch_from_local(
        loop.mesh, loop.prepare_batch(batch)
    )
    rng = jax.random.key(0)
    lowered = loop.train_step.lower(
        loop.state, device_batch, rng, loop.frozen_ctx
    )
    cost = lowered.compile().cost_analysis()
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))

    tf = flops / 1e12
    gb = bytes_accessed / 1e9
    t_compute = tf / PEAK_BF16_TFLOPS * 1e3
    t_memory = gb / PEAK_HBM_GBPS * 1e3
    bound = max(t_compute, t_memory)
    print(f"train step (vqvae unet64-class, batch={args.batch_size}, "
          f"{'bf16' if args.bf16 else 'f32'}):")
    print(f"  {tf:8.2f} TFLOP  {gb:8.1f} GB accessed")
    print(f"  compute bound: {t_compute:7.1f} ms   "
          f"memory bound: {t_memory:7.1f} ms   -> roofline {bound:7.1f} ms")
    print(f"  roofline throughput: "
          f"{args.batch_size / bound * 1e3:8.1f} samples/s")
    if args.measured_ms:
        mfu = t_compute / args.measured_ms * 100
        hbm = t_memory / args.measured_ms * 100
        print(f"  measured {args.measured_ms:.1f} ms = "
              f"{args.batch_size / args.measured_ms * 1e3:.1f} samples/s   "
              f"MFU {mfu:.1f}%   HBM util {hbm:.1f}%")


if __name__ == "__main__":
    main()
