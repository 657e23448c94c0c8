"""Evaluate a diffusion model's held-out epsilon-MSE by timestep quantile.

Capability parity with /root/reference/eval_diffusion.py: iterates a dataset,
noises with random ts, and reports windowed per-quantile MSE averages. The
loss evaluation is a single jitted function reused across batches.
"""

import argparse
from functools import partial

import jax
import jax.numpy as jnp

from vq_voice_swap_tpu.data import create_data_loader
from vq_voice_swap_tpu.diffusion_model import DiffusionModel
from vq_voice_swap_tpu.observe import LossTracker


def main():
    args = arg_parser().parse_args()

    data_loader, _ = create_data_loader(
        directory=args.data_dir, batch_size=args.batch_size,
        encoding=args.encoding,
    )

    print("loading model from checkpoint...")
    model, variables = DiffusionModel.load(args.checkpoint_path)

    @jax.jit
    def eval_batch(rng, samples, labels):
        x = samples[..., None]
        # Class-conditional models are evaluated with the true labels.
        lab = labels if model.num_labels is not None else None
        # Same code path as training: DiffusionModel.losses draws ts/noise
        # and returns the per-element eps-MSE.
        losses, ts = model.losses(variables, rng, x, labels=lab)
        return ts, losses

    tracker = LossTracker(avg_size=1_000_000)
    num_samples = 0
    root = jax.random.key(args.seed)
    for i, batch in enumerate(data_loader):
        ts, losses = eval_batch(jax.random.fold_in(root, i),
                                jnp.asarray(batch["samples"]),
                                jnp.asarray(batch["label"]))
        tracker.add(ts, losses)
        num_samples += len(batch["samples"])
        msg = " ".join(
            f"{k}={v:.06f}" for k, v in tracker.log_dict().items()
        )
        print(f"{num_samples} samples: {msg}")


def arg_parser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--encoding", type=str, default="linear",
                        help="waveform encoding the model was trained with")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("checkpoint_path", type=str)
    parser.add_argument("data_dir", type=str)
    return parser


if __name__ == "__main__":
    main()
