"""Speaker conversion: encode a clip with the VQ-VAE, decode as a target
speaker.

Capability parity with /root/reference/sample_vqvae.py: reads >= N seconds
of audio, encodes to VQ codes (or raw encoder output with --no-vq), decodes
with --label and constrain=True, optional encoder-predictor gradient
guidance (--enc-pred-path/--enc-pred-scale), and --check-vq re-encode
consistency reporting. The whole reverse process runs as one jitted lax.scan
on device.

Example:
    python sample_vqvae.py --label 3 --sample-steps 100 \
        --input-file speech.wav ckpt_vqvae/model.npz converted.wav
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from vq_voice_swap_tpu.classifier_model import EncoderPredictorModel
from vq_voice_swap_tpu.data import ChunkWriter, read_audio_input
from vq_voice_swap_tpu.vq_vae import VQVAE


def read_input(args) -> jnp.ndarray:
    chunk = read_audio_input(
        args.input_file, args.sample_rate, args.seconds, args.encoding
    )
    return jnp.asarray(chunk, dtype=jnp.float32)[None, :, None]


def convert(args, model, variables, enc_pred, in_seq):
    """Encode -> decode with the target label; returns (audio, codes)."""
    if args.no_vq:
        encoded = model.encode_raw(variables, in_seq)
    else:
        encoded = model.encode(variables, in_seq)

    # Unconditional models take no label (the predictor asserts on one).
    labels = (
        jnp.asarray([args.label], dtype=jnp.int32)
        if model.num_labels is not None
        else None
    )
    decode = jax.jit(
        lambda v, codes, lab, rng: model.decode(
            v, codes, rng,
            labels=lab,
            steps=args.sample_steps,
            constrain=True,
            enc_pred=enc_pred,
            enc_pred_scale=args.enc_pred_scale,
            sampler=args.sampler,
            eta=args.eta,
        )
    )
    audio = decode(variables, encoded, labels, jax.random.key(args.seed))
    return audio, encoded


def main():
    args = arg_parser().parse_args()
    # Fail flag conflicts BEFORE the (potentially minutes-long) decode.
    assert not (args.check_vq and args.no_vq), (
        "--check-vq requires VQ codes; incompatible with --no-vq"
    )

    print("loading model from checkpoint...")
    model, variables = VQVAE.load(
        args.checkpoint_path, act_int8_min_t=args.act_int8 or None
    )
    # Both bounds: embedding lookups clamp inside jit, so a negative label
    # would silently convert to speaker 0. Unconditional models
    # (num_labels=None) ignore the label entirely.
    if model.num_labels is not None:
        assert 0 <= args.label < model.num_labels, "label out of range"
    if args.tensor_parallel > 1:
        # Serve a model too big for one chip: 2-D data x model mesh, weights
        # sharded on their output-feature axis (parallel/tensor.py).
        from vq_voice_swap_tpu.parallel import create_mesh_2d, tp_shardings

        mesh = create_mesh_2d(args.tensor_parallel)
        variables = jax.tree.map(
            jax.device_put, variables, tp_shardings(mesh, variables)
        )

    enc_pred = None
    if args.enc_pred_path:
        print("loading encoder predictor...")
        ep_model, ep_vars = EncoderPredictorModel.load(args.enc_pred_path)
        enc_pred = (ep_model.module, ep_vars)

    print(f"loading waveform from {args.input_file}...")
    in_seq = read_input(args)

    print("encoding and decoding...")
    sample, encoded = convert(args, model, variables, enc_pred, in_seq)

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
    parser.add_argument("--enc-pred-path", type=str, default=None)
    parser.add_argument("--enc-pred-scale", type=float, default=1.0)
    parser.add_argument("--no-vq", action="store_true")
    parser.add_argument("--check-vq", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--sampler", type=str, default="ddpm",
                        choices=("ddpm", "ddim", "dpmpp"),
                        help="ddim / dpmpp (beyond-reference) allow far "
                             "fewer steps; dpmpp = DPM-Solver++(2M), "
                             "second-order")
    parser.add_argument("--eta", type=float, default=0.0,
                        help="DDIM stochasticity (0 = deterministic)")
    parser.add_argument("--act-int8", default=0, type=int, metavar="MIN_T",
                        help="serve the decoder with int8-stored "
                             "activations at UNet levels with T >= MIN_T "
                             "(0 = off); see PERF.md round 4")
    parser.add_argument("--tensor-parallel", default=1, type=int,
                        help="model-axis size of a 2-D data x model mesh; "
                             "shards the weights over chips")
    parser.add_argument("checkpoint_path", type=str)
    parser.add_argument("output_file", type=str)
    return parser


if __name__ == "__main__":
    main()
