"""Measure the PyTorch reference's CPU sampling throughput (the baseline for
bench.py's vs_baseline ratio).

Runs the reference package in-process from /root/reference (execution only;
no code is copied). Sampling cost is dominated by the epsilon-predictor
forward pass, so we time a few forward passes of the unet64 predictor on a
4 s clip and extrapolate to the 50-step sampler.

Usage: python scripts/measure_reference_cpu.py [--steps 3] [--base-channels 64]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/reference")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--base-channels", type=int, default=64)
    args = parser.parse_args()

    import torch

    from vq_voice_swap.diffusion_model import DiffusionModel  # reference pkg

    torch.set_num_threads(1)
    model = DiffusionModel(
        pred_name="unet", base_channels=args.base_channels
    )
    model.eval()

    x = torch.randn(1, 1, 64000)
    ts = torch.full((1,), 0.5)

    with torch.no_grad():
        model.predictor(x, ts)  # warmup / allocator
        start = time.perf_counter()
        for _ in range(args.steps):
            model.predictor(x, ts)
        per_step = (time.perf_counter() - start) / args.steps

    sample_time = per_step * 50  # 50-step sampler, predictor-dominated
    samples_per_sec = 64000 / sample_time
    print(f"predictor forward: {per_step:.2f} s/step")
    print(f"extrapolated 50-step sample time: {sample_time:.1f} s")
    print(f"throughput: {samples_per_sec:.1f} audio samples/sec (CPU)")


if __name__ == "__main__":
    main()
