"""Minutes-long speaker conversion via sequence parallelism.

Runs the full VQ-VAE conversion (encode -> VQ -> 1000s-of-steps diffusion
decode) with the waveform's TIME axis sharded over a device mesh
(parallel/sequence.py): each chip holds a slice of the audio, convolutions
exchange halos over the ICI ring, and GroupNorm statistics psum across the
mesh. The reference (vq_voice_swap/sample_vqvae.py) is bounded to clips that
fit one device; this path scales audio length linearly with the mesh.

Works on any mesh size, including a virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/long_audio_convert.py --checkpoint-path vqvae.npz \
      --input long.wav --label 2 --output converted.wav --steps 50

Requires a VQVAE whose encoder is UNet-family (unet / unet128 variants).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from vq_voice_swap_tpu.data import ChunkReader, ChunkWriter
from vq_voice_swap_tpu.parallel.sequence import (
    SEQ_AXIS,
    create_seq_mesh,
    seq_parallel_vqvae_convert,
)
from vq_voice_swap_tpu.vq_vae import VQVAE

SAMPLE_RATE = 16000


def main():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("--checkpoint-path", type=str, required=True)
    parser.add_argument("--input", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--label", type=int, required=True,
                        help="target speaker id")
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--sampler", type=str, default="ddpm",
                        choices=("ddpm", "ddim", "dpmpp"))
    parser.add_argument("--eta", type=float, default=0.0)
    parser.add_argument("--encoding", type=str, default="linear")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max-seconds", type=float, default=None,
                        help="truncate the input to this many seconds")
    parser.add_argument("--repeat", type=int, default=1,
                        help="run the conversion N times and report each "
                             "run's RTF: run 1 pays the (one-off, per-"
                             "process) XLA compile; later runs measure the "
                             "steady-state serving rate")
    args = parser.parse_args()

    model, variables = VQVAE.load(args.checkpoint_path)
    # Embedding lookups clamp out-of-range indices inside jit: without
    # this check a wrong --label would silently convert to a DIFFERENT
    # speaker after the full (minutes-long) decode. Unconditional models
    # take no label at all.
    if model.num_labels is not None:
        assert 0 <= args.label < model.num_labels, (
            f"--label {args.label} out of range for a model with "
            f"{model.num_labels} speakers"
        )

    mesh = create_seq_mesh()
    n_shards = mesh.devices.size
    # T must divide evenly into shards and the model's downsample pyramid.
    quantum = model.downsample_rate * n_shards

    reader = ChunkReader(args.input, SAMPLE_RATE, encoding=args.encoding)
    try:
        limit = (
            int(args.max_seconds * SAMPLE_RATE) if args.max_seconds else 1 << 62
        )
        wav = reader.read(limit)
    finally:
        reader.close()
    if wav is None:
        raise SystemExit(
            f"could not decode any audio from {args.input!r} (missing file, "
            f"unsupported codec, or empty stream)"
        )
    usable = (len(wav) // quantum) * quantum
    if not usable:
        raise SystemExit(
            f"input too short: {len(wav)} samples < one quantum ({quantum})"
        )
    wav = wav[:usable]
    print(
        f"converting {usable / SAMPLE_RATE:.1f}s of audio over "
        f"{n_shards} device(s), {args.steps} steps"
    )

    x = jax.device_put(
        jnp.asarray(wav, dtype=jnp.float32)[None, :, None],
        NamedSharding(mesh, P(None, SEQ_AXIS, None)),
    )
    labels = (
        jnp.asarray([args.label]) if model.num_labels is not None else None
    )

    # ONE jitted callable for all runs: the convert body builds fresh
    # closures per call, so calling it eagerly retraces AND recompiles the
    # whole T-sharded reverse process every time (measured: ~20-35 min per
    # call at T=960k through the tunnel). Under an outer jit the second
    # call is a cache hit — pure execution, the steady-state serving rate.
    convert = jax.jit(
        lambda v, xs, key: seq_parallel_vqvae_convert(
            mesh, model, v, xs, key, labels=labels, steps=args.steps,
            constrain=True, sampler=args.sampler, eta=args.eta,
        )
    )
    for run in range(max(1, args.repeat)):
        start = time.perf_counter()
        out = convert(variables, x, jax.random.key(args.seed))
        out = np.asarray(out)  # host fetch = the only reliable barrier here
        elapsed = time.perf_counter() - start
        rtf = (usable / SAMPLE_RATE) / elapsed
        tag = " (incl. compile)" if run == 0 else ""
        print(f"decoded in {elapsed:.1f}s ({rtf:.2f}x real time){tag}")

    writer = ChunkWriter(args.output, SAMPLE_RATE, encoding=args.encoding)
    try:
        writer.write(out[0, :, 0])
    finally:
        writer.close()
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
