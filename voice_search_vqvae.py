"""Rank speaker labels by reconstruction error for a clip ("which voice is
this?").

Capability parity with /root/reference/voice_search_vqvae.py: evaluate the
diffusion epsilon-MSE for every label over a linspace of timesteps with fixed
noise seeds, average per label, and report the top-k. All (label, t) pairs
are evaluated in jitted batches.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from vq_voice_swap_tpu.data import read_audio_input
from vq_voice_swap_tpu.vq_vae import VQVAE


def main():
    args = arg_parser().parse_args()

    print("loading model from checkpoint...")
    model, variables = VQVAE.load(args.checkpoint_path)

    print(f"loading waveform from {args.input_file}...")
    chunk = read_audio_input(
        args.input_file, args.sample_rate, args.seconds, args.encoding
    )
    target = jnp.asarray(chunk, dtype=jnp.float32)[None, :, None]

    print("encoding audio sequence...")
    encoded = model.embed_codes(variables, model.encode(variables, target))

    labels = jnp.asarray(
        [i for i in range(model.num_labels)
         for _ in range(args.num_timesteps)],
        dtype=jnp.int32,
    )
    ts = jnp.tile(
        jnp.linspace(0.0, 1.0, args.num_timesteps), model.num_labels
    )
    epsilons = jax.random.normal(
        jax.random.key(args.seed),
        (args.num_seeds,) + target.shape,
        dtype=jnp.float32,
    )

    @jax.jit
    def eval_mb(labels_mb, ts_mb):
        n = labels_mb.shape[0]
        cond_mb = jnp.tile(encoded, (n, 1, 1))
        target_mb = jnp.tile(target, (n, 1, 1))

        def per_seed(eps):
            eps_mb = jnp.tile(eps, (n, 1, 1))
            noised = model.diffusion.sample_q(target_mb, ts_mb, epsilon=eps_mb)
            pred = model.predict_eps(
                variables, noised, ts_mb, cond=cond_mb, labels=labels_mb
            )
            sq = jnp.square(pred - eps_mb)
            return jnp.mean(jnp.reshape(sq, (n, -1)), axis=1)

        return jnp.mean(jax.vmap(per_seed)(epsilons), axis=0)

    print("evaluating all losses...")
    results = []
    for i in range(0, len(labels), args.batch_size):
        mb_labels = labels[i : i + args.batch_size]
        mb_ts = ts[i : i + args.batch_size]
        # Pad the tail so the jitted shape is stable.
        pad = args.batch_size - len(mb_labels)
        if pad:
            mb_labels = jnp.pad(mb_labels, (0, pad))
            mb_ts = jnp.pad(mb_ts, (0, pad))
        mses = np.asarray(eval_mb(mb_labels, mb_ts))
        results.append(mses[: args.batch_size - pad] if pad else mses)
        print(f"  {min(i + args.batch_size, len(labels))}/{len(labels)}")

    losses = (
        np.concatenate(results)
        .reshape(-1, args.num_timesteps)
        .mean(-1)
        .tolist()
    )

    print(f"top {min(args.top_k, len(losses))} sorted losses")
    print("-------")
    for label, loss in sorted(enumerate(losses), key=lambda x: x[1])[
        : args.top_k
    ]:
        print(f"{label}\t\t{loss:.6f}")


def arg_parser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("--sample-rate", type=int, default=16000)
    parser.add_argument("--seconds", type=int, default=4)
    parser.add_argument("--encoding", type=str, default="linear")
    parser.add_argument("--num-timesteps", type=int, default=16)
    parser.add_argument("--num-seeds", type=int, default=1)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--top-k", type=int, default=20)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--input-file", type=str, required=True)
    parser.add_argument("checkpoint_path", type=str)
    return parser


if __name__ == "__main__":
    main()
