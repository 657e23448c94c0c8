"""Evaluate how much a trained VQ-VAE leverages speaker labels.

Rebuilds the *capability* of /root/reference/eval_vqvae.py (whose import of a
stale ConcreteVQVAE API is broken upstream): measure how much worse the
diffusion loss becomes when the label is randomized, plus the standard
per-quantile loss tracking and conditioning-signal output statistics.
"""

import argparse

import jax
import jax.numpy as jnp

from vq_voice_swap_tpu.data import create_data_loader
from vq_voice_swap_tpu.observe import LossTracker
from vq_voice_swap_tpu.vq import vq_forward
from vq_voice_swap_tpu.vq_vae import VQVAE


def main():
    args = arg_parser().parse_args()

    data_loader, num_labels = create_data_loader(
        directory=args.data_dir, batch_size=args.batch_size,
        encoding=args.encoding,
    )

    print("loading model from checkpoint...")
    model, variables = VQVAE.load(args.checkpoint_path)
    assert model.num_labels == num_labels, (
        f"model has {model.num_labels} labels, dataset has {num_labels}"
    )

    @jax.jit
    def eval_batch(rng, samples, labels):
        x = samples[..., None]
        t_rng, n_rng, l_rng = jax.random.split(rng, 3)
        ts = jax.random.uniform(t_rng, (x.shape[0],))
        noise = jax.random.normal(n_rng, x.shape, dtype=x.dtype)
        noised = model.diffusion.sample_q(x, ts, epsilon=noise)

        enc = model.encode_raw(variables, x)
        cond = vq_forward(
            variables["params"]["vq"]["dictionary"], enc
        )["passthrough"]

        def mses_for(lab):
            pred = model.predict_eps(variables, noised, ts, cond=cond,
                                     labels=lab)
            sq = jnp.square(noise - pred)
            return jnp.mean(jnp.reshape(sq, (x.shape[0], -1)), axis=1)

        rand_labels = jax.random.randint(
            l_rng, labels.shape, 0, model.num_labels
        )
        cond_std = jnp.std(jnp.reshape(cond, (cond.shape[0], -1)), axis=1)
        return ts, mses_for(labels), mses_for(rand_labels), cond_std

    trackers = {
        "cond": LossTracker(avg_size=1_000_000, prefix="cond_"),
        "rand": LossTracker(avg_size=1_000_000, prefix="rand_"),
        "cond_std": LossTracker(avg_size=1_000_000, prefix="cond_std_"),
    }
    num_samples = 0
    root = jax.random.key(args.seed)
    for i, batch in enumerate(data_loader):
        ts, cond_mses, rand_mses, cond_std = eval_batch(
            jax.random.fold_in(root, i),
            jnp.asarray(batch["samples"]),
            jnp.asarray(batch["label"]),
        )
        trackers["cond"].add(ts, cond_mses)
        trackers["rand"].add(ts, rand_mses)
        trackers["cond_std"].add(ts, cond_std)
        num_samples += len(batch["samples"])
        log = {}
        for t in trackers.values():
            log.update(t.log_dict())
        msg = " ".join(f"{k}={v:.06f}" for k, v in log.items())
        print(f"{num_samples} samples: {msg}")


def arg_parser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--encoding", type=str, default="linear",
                        help="waveform encoding the model was trained with "
                             "(ulaw for the conv-mfcc-ulaw recipes)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("checkpoint_path", type=str)
    parser.add_argument("data_dir", type=str)
    return parser


if __name__ == "__main__":
    main()
