"""Batch quality evaluation ON THE VOICE-SWAP PATH (VERDICT r4 item 1).

Every 10k quality arm so far was an unconditional `sample_diffusion` arm;
the serving headline (5-step DPM++ swap at 123-129x real time) is the
conditioned `VQVAE.decode` path (vq_vae.py:205-270), which was never
quality-measured — and the int8 experiment proved few-step solvers can
collapse quality while 50-step arms stay clean (runs/qeval/report_int8.txt).

This script runs the swap path at eval scale: draw N source clips from the
tones fixture (3 sine "speakers" at 300/500/1000 Hz, data/datasets.py:165),
encode -> VQ -> decode with a DIFFERENT target label, and report the three
swap-specific metrics the reference protocol implies:

  * check-vq agreement: fraction of VQ codes that survive a re-encode of
    the converted audio (reference sample_vqvae.py:58-62, `--check-vq`) —
    computed inside the same jit as the decode;
  * target-tone accuracy: the converted clip's FFT peak must sit nearest
    the TARGET speaker's frequency (the fixture's ground-truth notion of
    "the conversion took");
  * source-tone leak rate: fraction whose peak stayed at the SOURCE.

Converted wavs are written `sample_%06d.wav` so `stat_generate.py
--sample-dir` can featurize them for Frechet/class-score rows against
dataset stats (same classifier featurizer as the unconditional arms).

Resume is batch-exact like sample_diffusion.py: every batch is seeded via
fold_in(root, batch_index), wavs are written atomically, and per-batch
metrics land in an adjacent metrics_%05d.json — a killed 10k run loses at
most one batch.

Run (TPU):
  python scripts/swap_eval.py --num-samples 10000 --sample-steps 5 \
      --sampler dpmpp --bf16 runs/qswap/vqvae/model.npz runs/qswap/swap_dpmpp5
"""

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from vq_voice_swap_tpu.data import ChunkWriter
from vq_voice_swap_tpu.data.datasets import ToneDataset
from vq_voice_swap_tpu.vq_vae import VQVAE

SAMPLE_RATE = 16000
CLIP_LEN = 64000


def main():
    args = arg_parser().parse_args()
    os.makedirs(args.sample_path, exist_ok=True)

    model, variables = VQVAE.load(
        args.checkpoint_path, dtype="bfloat16" if args.bf16 else None
    )
    assert model.num_labels is not None, "swap eval needs a class-cond VQVAE"

    dataset = ToneDataset(phases=int(math.ceil(args.num_samples / 3)))
    freqs = np.asarray(dataset.speaker_ids, dtype=np.float64)
    n_speakers = len(freqs)

    @jax.jit
    def swap(audio, labels, rng):
        codes = model.encode(variables, audio)
        out = model.decode(
            variables, codes, rng, labels=labels,
            steps=args.sample_steps, sampler=args.sampler, eta=args.eta,
            constrain=True,
        )
        re_codes = model.encode(variables, out)
        agreement = jnp.mean((re_codes == codes).astype(jnp.float32), axis=-1)
        return out, agreement

    root = jax.random.key(args.seed)
    num_batches = int(math.ceil(args.num_samples / args.batch_size))
    for b in range(num_batches):
        lo = b * args.batch_size
        hi = min(lo + args.batch_size, args.num_samples)
        metrics_path = os.path.join(args.sample_path, f"metrics_{b:05}.json")
        wav_paths = [
            os.path.join(args.sample_path, f"sample_{c:06}.wav")
            for c in range(lo, hi)
        ]
        if os.path.exists(metrics_path) and all(
            os.path.exists(p) for p in wav_paths
        ):
            continue

        # Sources cycle speakers deterministically; the target is always
        # the NEXT speaker, so every conversion crosses speakers.
        idxs = np.arange(lo, hi)
        src = idxs % n_speakers
        tgt = (src + 1) % n_speakers
        audio = np.stack([dataset[i]["samples"] for i in idxs])[..., None]
        out, agree = swap(
            jnp.asarray(audio, jnp.float32),
            jnp.asarray(tgt, jnp.int32),
            jax.random.fold_in(root, b),
        )
        out = np.asarray(out, np.float32)
        agree = np.asarray(agree, np.float32)

        # FFT peak -> nearest fixture frequency = predicted speaker.
        spec = np.abs(np.fft.rfft(out[:, :, 0], axis=-1))
        peak_hz = np.argmax(spec, axis=-1) * (SAMPLE_RATE / CLIP_LEN)
        pred = np.argmin(np.abs(peak_hz[:, None] - freqs[None, :]), axis=-1)

        for seq, path in zip(out, wav_paths):
            write_wav(path, seq[:, 0])
        write_json(metrics_path, {
            "agreement": agree.tolist(),
            "target_hit": (pred == tgt).tolist(),
            "source_leak": (pred == src).tolist(),
            "peak_hz": peak_hz.tolist(),
        })
        print(f"converted {hi}/{args.num_samples}", flush=True)

    report = aggregate(args.sample_path, num_batches)
    write_json(os.path.join(args.sample_path, "report.json"), report)
    print(json.dumps(report))


def aggregate(sample_path, num_batches):
    agree, hit, leak = [], [], []
    for b in range(num_batches):
        with open(os.path.join(sample_path, f"metrics_{b:05}.json")) as f:
            m = json.load(f)
        agree += m["agreement"]
        hit += m["target_hit"]
        leak += m["source_leak"]
    return {
        "n": len(agree),
        "check_vq_agreement": float(np.mean(agree)),
        "target_tone_acc": float(np.mean(hit)),
        "source_tone_leak": float(np.mean(leak)),
    }


def write_wav(path, samples):
    tmp = path + ".tmp.wav"
    writer = ChunkWriter(tmp, SAMPLE_RATE)
    try:
        writer.write(np.clip(np.asarray(samples).reshape(-1), -1, 1))
    finally:
        writer.close()
    os.replace(tmp, path)


def write_json(path, obj):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def arg_parser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("--num-samples", type=int, default=10000)
    parser.add_argument("--batch-size", type=int, default=20)
    parser.add_argument("--sample-steps", type=int, default=50)
    parser.add_argument("--sampler", type=str, default="ddpm",
                        choices=("ddpm", "ddim", "dpmpp"))
    parser.add_argument("--eta", type=float, default=0.0)
    parser.add_argument("--seed", type=int, default=7)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("checkpoint_path", type=str)
    parser.add_argument("sample_path", type=str)
    return parser


if __name__ == "__main__":
    main()
