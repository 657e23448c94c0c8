"""Sample an unconditional / class-conditional / classifier-guided diffusion
model and write .wav files.

Capability parity with /root/reference/sample_diffusion.py: single or many
samples, classifier guidance (grad of log p(y|x,t) scaled by
--classifier-scale), fixed or random target class, x0-constraining, and a
sample-time timestep schedule — which here is a *named* warp
(--schedule quadratic reproduces the README's t=s^2 recipe) instead of an
eval()'d lambda. The whole reverse process runs as one jitted lax.scan; with
--num-samples the batched sampler is reused across batches (one compile).
"""

import argparse
import math
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vq_voice_swap_tpu.classifier_model import ClassifierModel
from vq_voice_swap_tpu.data import ChunkWriter
from vq_voice_swap_tpu.diffusion import make_warp
from vq_voice_swap_tpu.diffusion_model import DiffusionModel
from vq_voice_swap_tpu.parallel import DATA_AXIS, batch_sharding, create_mesh

SAMPLE_LEN = 64000
SAMPLE_RATE = 16000


def main():
    args = arg_parser().parse_args()
    warp = make_warp(args.schedule)

    model, variables = DiffusionModel.load(
        args.checkpoint_path,
        dtype="bfloat16" if args.bf16 else None,
        act_int8_min_t=args.act_int8 or None,
    )

    classifier = None
    clf_vars = None
    if args.classifier_path:
        classifier, clf_vars = ClassifierModel.load(args.classifier_path)

    def build_cond_fn(labels):
        if classifier is None:
            return None

        def cond_fn(x, ts):
            def logprob_sum(xx):
                logits = classifier.logits(clf_vars, xx, ts)
                logp = jax.nn.log_softmax(logits, axis=-1)
                return jnp.sum(
                    jnp.take_along_axis(logp, labels[:, None], axis=-1)
                )

            return jax.grad(logprob_sum)(x) * args.classifier_scale

        return cond_fn

    # Batched sampling shards the batch axis over all available chips
    # (a no-op on one chip; linear scaling on a pod slice). With
    # --tensor-parallel N the mesh is 2-D data x model and the weights
    # shard on their output-feature axis (models too big for one chip).
    if args.tensor_parallel > 1:
        from vq_voice_swap_tpu.parallel import create_mesh_2d, tp_shardings

        mesh = create_mesh_2d(args.tensor_parallel)
        variables = jax.tree.map(
            jax.device_put, variables, tp_shardings(mesh, variables)
        )
    else:
        mesh = create_mesh()
    sharding = batch_sharding(mesh) if mesh.devices.size > 1 else None

    @partial(jax.jit, static_argnames=("batch",))
    def sample_batch(rng, labels, batch):
        noise_rng, samp_rng = jax.random.split(rng)
        x_T = jax.random.normal(noise_rng, (batch, SAMPLE_LEN, 1))
        if sharding is not None and batch % mesh.shape[DATA_AXIS] == 0:
            x_T = jax.lax.with_sharding_constraint(x_T, sharding)
        pred = (
            (lambda xs, ts: model.predict_eps(variables, xs, ts, labels=labels))
            if model.num_labels is not None
            else (lambda xs, ts: model.predict_eps(variables, xs, ts))
        )
        if args.sampler == "ddim":
            return model.diffusion.ddim_sample(
                x_T,
                pred,
                steps=args.sample_steps,
                rng=samp_rng,
                eta=args.eta,
                constrain=args.constrain,
                cond_fn=build_cond_fn(labels),
                warp=warp,
            )
        if args.sampler == "dpmpp":
            return model.diffusion.dpmpp_sample(
                x_T,
                pred,
                steps=args.sample_steps,
                constrain=args.constrain,
                cond_fn=build_cond_fn(labels),
                warp=warp,
            )
        return model.diffusion.ddpm_sample(
            x_T,
            pred,
            steps=args.sample_steps,
            rng=samp_rng,
            constrain=args.constrain,
            cond_fn=build_cond_fn(labels),
            warp=warp,
        )

    def sample_labels(rng, batch):
        # Guidance labels come from the classifier when the diffusion model
        # itself is unconditional (reference sample_diffusion.py semantics).
        num_labels = model.num_labels
        if num_labels is None and classifier is not None:
            num_labels = classifier.num_labels
        if num_labels is None:
            return None
        if args.target_class is not None:
            # jnp.take clamps out-of-range indices inside jit, which would
            # silently sample the wrong class (torch raises here).
            if not 0 <= args.target_class < num_labels:
                raise SystemExit(
                    f"--target-class {args.target_class} out of range for a "
                    f"{num_labels}-class model"
                )
            return jnp.full((batch,), args.target_class, dtype=jnp.int32)
        return jax.random.randint(rng, (batch,), 0, num_labels)

    root = jax.random.key(args.seed)
    if args.num_samples is None:
        rng, label_rng = jax.random.split(root)
        labels = sample_labels(label_rng, 1)
        sample = sample_batch(rng, labels, 1)
        write_wav(args.sample_path, sample[0, :, 0], args.encoding)
        print(f"wrote {args.sample_path}")
    else:
        os.makedirs(args.sample_path, exist_ok=True)
        count = 0
        num_batches = int(math.ceil(args.num_samples / args.batch_size))
        for i in range(num_batches):
            lo = i * args.batch_size
            hi = min(lo + args.batch_size, args.num_samples)
            paths = [
                os.path.join(args.sample_path, f"sample_{c:06}.wav")
                for c in range(lo, hi)
            ]
            # Exact resume: each batch is seeded independently via
            # fold_in(root, i), so skipping fully-written batches
            # reproduces the same sample stream as a fresh run. Files are
            # written atomically below, so existence implies completeness
            # (a killed 10k-sample run loses at most one batch).
            if all(os.path.exists(p) for p in paths):
                count = hi
                continue
            rng, label_rng = jax.random.split(jax.random.fold_in(root, i))
            labels = sample_labels(label_rng, args.batch_size)
            samples = np.asarray(sample_batch(rng, labels, args.batch_size))
            for seq, path in zip(samples, paths):
                write_wav(path, seq[:, 0], args.encoding)
                count += 1
            count = hi
            print(f"generated {count}/{args.num_samples}")


def write_wav(path, samples, encoding):
    # Atomic: encode to a temp .wav, then rename — so an existing file is
    # always a complete one (the resume path above relies on this).
    tmp = path + ".tmp.wav"
    writer = ChunkWriter(tmp, SAMPLE_RATE, encoding=encoding)
    try:
        writer.write(np.asarray(samples).reshape(-1))
    finally:
        writer.close()
    os.replace(tmp, path)


def arg_parser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("--checkpoint-path", default="model_diffusion.npz",
                        type=str)
    parser.add_argument("--sample-steps", default=100, type=int)
    parser.add_argument("--batch-size", default=1, type=int)
    parser.add_argument("--constrain", action="store_true")
    parser.add_argument("--sample-path", default="sample.wav", type=str)
    parser.add_argument("--num-samples", default=None, type=int)
    parser.add_argument("--classifier-path", default=None, type=str)
    parser.add_argument("--classifier-scale", default=1.0, type=float)
    parser.add_argument("--target-class", default=None, type=int)
    parser.add_argument("--schedule", default="linear", type=str,
                        help="named time warp: linear|quadratic|sqrt|pow:X")
    parser.add_argument("--encoding", default="linear", type=str)
    parser.add_argument("--sampler", default="ddpm", type=str,
                        choices=("ddpm", "ddim", "dpmpp"),
                        help="ddim / dpmpp (beyond-reference) allow far "
                             "fewer steps; dpmpp = DPM-Solver++(2M), "
                             "second-order")
    parser.add_argument("--eta", default=0.0, type=float,
                        help="DDIM stochasticity (0 = deterministic)")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--bf16", action="store_true",
                        help="compute in bfloat16 (params stay float32)")
    parser.add_argument("--act-int8", default=0, type=int, metavar="MIN_T",
                        help="serve with int8-stored activations at UNet "
                             "levels whose time axis is >= MIN_T (0 = off; "
                             "e.g. 16000 quantizes the top three levels of "
                             "a 4-s 16 kHz clip). Quality-gated by the 10k "
                             "Frechet protocol — see PERF.md round 4")
    parser.add_argument("--tensor-parallel", default=1, type=int,
                        help="model-axis size of a 2-D data x model mesh; "
                             "shards the weights over chips")
    return parser


if __name__ == "__main__":
    main()
