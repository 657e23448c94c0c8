"""Speaker conversion with classifier-free guidance.

Capability parity with /root/reference/sample_vqvae_uncond.py: decode with
--guide-label-scale / --guide-vq-scale through the 3x-batch CFG predictor of
a model fine-tuned by train_vqvae_uncond.py; the sample-time schedule is a
named warp instead of an eval()'d lambda.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from vq_voice_swap_tpu.data import ChunkWriter, read_audio_input
from vq_voice_swap_tpu.diffusion import make_warp
from vq_voice_swap_tpu.vq_vae import VQVAE


def main():
    args = arg_parser().parse_args()
    warp = make_warp(args.schedule)
    # Fail flag conflicts BEFORE the (potentially minutes-long) decode.
    assert not (args.check_vq and args.no_vq), (
        "--check-vq requires VQ codes; incompatible with --no-vq"
    )

    print("loading model from checkpoint...")
    model, variables = VQVAE.load(
        args.checkpoint_path, act_int8_min_t=args.act_int8 or None
    )
    # Both bounds: label -1 would hit the reserved unconditional token
    # (labels shift by +1 inside decode_uncond_guidance) and other
    # negatives clamp to speaker 0 inside jit — all silently.
    assert 0 <= args.label and args.label + 1 < model.num_labels, (
        "label out of range"
    )
    if args.tensor_parallel > 1:
        # Serve a model too big for one chip: 2-D data x model mesh, weights
        # sharded on their output-feature axis (parallel/tensor.py).
        from vq_voice_swap_tpu.parallel import create_mesh_2d, tp_shardings

        mesh = create_mesh_2d(args.tensor_parallel)
        variables = jax.tree.map(
            jax.device_put, variables, tp_shardings(mesh, variables)
        )

    print(f"loading waveform from {args.input_file}...")
    chunk = read_audio_input(
        args.input_file, args.sample_rate, args.seconds, args.encoding
    )
    in_seq = jnp.asarray(chunk, dtype=jnp.float32)[None, :, None]

    print("encoding audio sequence...")
    if args.no_vq:
        encoded = model.encode_raw(variables, in_seq)
    else:
        encoded = model.encode(variables, in_seq)

    print("decoding audio samples...")
    labels = jnp.asarray([args.label], dtype=jnp.int32)
    sample = jax.jit(
        lambda v, codes, lab, rng: model.decode_uncond_guidance(
            v, codes, rng,
            labels=lab,
            steps=args.sample_steps,
            constrain=True,
            label_scale=args.guide_label_scale,
            vq_scale=args.guide_vq_scale,
            sampler=args.sampler,
            eta=args.eta,
            warp=warp,
        )
    )(variables, encoded, labels, jax.random.key(args.seed))

    if args.check_vq:
        assert not args.no_vq
        re_encoded = model.encode(variables, sample)
        agreement = float(jnp.mean((re_encoded == encoded).astype(jnp.float32)))
        print(f"fraction of consistent VQ codes: {agreement}")

    out = np.clip(np.asarray(sample).reshape(-1), -1, 1)
    print(f"saving result to {args.output_file}...")
    with ChunkWriter(
        args.output_file, sample_rate=args.sample_rate, encoding=args.encoding
    ) as writer:
        writer.write(out)


def arg_parser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("--sample-rate", type=int, default=16000)
    parser.add_argument("--sample-steps", type=int, default=100)
    parser.add_argument("--seconds", type=int, default=4)
    parser.add_argument("--label", type=int, required=True)
    parser.add_argument("--input-file", type=str, required=True)
    parser.add_argument("--encoding", type=str, default="linear")
    parser.add_argument("--schedule", default="linear", type=str,
                        help="named time warp: linear|quadratic|sqrt|pow:X")
    parser.add_argument("--guide-label-scale", type=float, default=1.0)
    parser.add_argument("--guide-vq-scale", type=float, default=0.0)
    parser.add_argument("--sampler", type=str, default="ddpm",
                        choices=("ddpm", "ddim", "dpmpp"),
                        help="ddim / dpmpp (beyond-reference) allow far "
                             "fewer steps; dpmpp = DPM-Solver++(2M), "
                             "second-order")
    parser.add_argument("--eta", type=float, default=0.0,
                        help="DDIM stochasticity (0 = deterministic)")
    parser.add_argument("--no-vq", action="store_true")
    parser.add_argument("--check-vq", action="store_true")
    parser.add_argument("--act-int8", default=0, type=int, metavar="MIN_T",
                        help="serve the decoder with int8-stored "
                             "activations at UNet levels with T >= MIN_T "
                             "(0 = off); see PERF.md round 4")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tensor-parallel", default=1, type=int,
                        help="model-axis size of a 2-D data x model mesh; "
                             "shards the weights over chips")
    parser.add_argument("checkpoint_path", type=str)
    parser.add_argument("output_file", type=str)
    return parser


if __name__ == "__main__":
    main()
