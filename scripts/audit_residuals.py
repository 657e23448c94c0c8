"""Saved-residual dtype audit for the flagship train step (the round-4
"train bytes pass", VERDICT round-3 item 3).

The training roofline (PERF.md) says bytes — dominated by linearization
residuals saved between forward and backward — bound the step. This tool
prints what jax AD actually saves for the flagship VQ-VAE loss under each
remat policy, grouped by dtype, so f32 leaks in a bf16 forward are visible
(a single f32 residual at [N, 64000, C] costs 2x its bf16 counterpart).

Shapes/dtypes are lowering-independent, so this runs on CPU:

    JAX_PLATFORMS=cpu python scripts/audit_residuals.py [--batch-size 8]
"""

import argparse
import contextlib
import io
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def summarize(text, label):
    """Parse print_saved_residuals output into per-dtype byte totals."""
    itemsize = {"f32": 4, "bf16": 2, "f16": 2, "i32": 4, "u32": 4,
                "i8": 1, "u8": 1, "f64": 8, "i64": 8, "bool": 1, "u64": 8}
    per_dtype = defaultdict(int)
    rows = []
    for line in text.splitlines():
        m = re.match(r"\s*(\w+)\[([\d,]*)\]", line)
        if not m:
            continue
        dt, dims = m.group(1), m.group(2)
        shape = tuple(int(d) for d in dims.split(",") if d)
        size = int(np.prod(shape)) if shape else 1
        nbytes = size * itemsize.get(dt, 4)
        per_dtype[dt] += nbytes
        rows.append((nbytes, dt, shape, line.strip()))

    total = sum(per_dtype.values())
    print(f"\n=== {label}: {total / 1e9:.3f} GB saved residuals ===")
    for dt, b in sorted(per_dtype.items(), key=lambda kv: -kv[1]):
        print(f"  {dt:6s} {b / 1e9:8.3f} GB ({b / max(total, 1) * 100:5.1f}%)")
    print("  top 12 tensors:")
    for nbytes, dt, shape, line in sorted(rows, key=lambda r: -r[0])[:12]:
        print(f"    {nbytes / 1e6:9.1f} MB  {line[:100]}")
    return total, per_dtype


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--no-bf16", dest="bf16", action="store_false",
                    default=True)
    args = ap.parse_args()

    from vq_voice_swap_tpu.train import VQVAETrainLoop

    results = {}
    for remat in (None, "convs", "full"):
        loop_args = VQVAETrainLoop.arg_parser().parse_args(
            [
                "--predictor", "unet", "--base-channels", "64",
                "--encoder", "unet128", "--class-cond",
                "--batch-size", str(args.batch_size),
                "--output-dir", "/tmp/audit_residuals_ckpt",
                *(["--bf16"] if args.bf16 else []),
                *(["--grad-checkpoint", remat] if remat else []),
                "tones:40",
            ]
        )
        loop = VQVAETrainLoop(loop_args)
        batch = loop.prepare_batch(next(iter(loop.data_loader)))
        loss_fn = loop.build_loss_fn()
        buffers = loop.state.buffers
        rng = jax.random.key(0)

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            jax.ad_checkpoint.print_saved_residuals(
                lambda p: loss_fn(p, buffers, rng, batch, loop.frozen_ctx),
                loop.state.params,
            )
        results[remat or "none"] = summarize(
            buf.getvalue(),
            f"remat={remat or 'none'} (batch={args.batch_size}, "
            f"{'bf16' if args.bf16 else 'f32'})",
        )

    base = results["none"][0]
    print("\n=== relative ===")
    for k, (total, _) in results.items():
        print(f"  {k:6s} {total / 1e9:8.3f} GB "
              f"({total / max(base, 1) * 100:5.1f}% of no-remat)")


if __name__ == "__main__":
    main()
