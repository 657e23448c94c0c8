"""Real-time factor for VQ-VAE voice swap — the second north-star metric
(BASELINE.json: "real-time factor for VQ-VAE swap").

Encode + decode (speaker-convert) batches of 4 s / 16 kHz clips with the
released conversion topology (unet64 predictor + conv-mfcc-ulaw encoder,
reference vqvae-unet-mfcc; model init here — weights don't change FLOPs) and
report seconds-of-audio-converted per wall-second per chip:

    RTF = batch * 4 s / elapsed        (RTF > 1 means faster than real time)

Arms: 50-step DDPM (the reference protocol, sample_vqvae.py default 100 is
halved by its README recipe) and 10-step DDIM (beyond-reference serving arm).

Run on TPU:  python scripts/bench_swap_rtf.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from vq_voice_swap_tpu.vq_vae import VQVAE

SECONDS = 4
SAMPLE_RATE = 16000
SAMPLE_LEN = SECONDS * SAMPLE_RATE
BATCH = 16
REPEATS = 3


def make_model(act_int8_min_t=0):
    return VQVAE(
        pred_name="unet",
        base_channels=64,
        enc_name="conv-mfcc-ulaw",
        dictionary_size=512,
        num_labels=251,  # LibriSpeech train-clean-100 speaker count
        dtype="bfloat16",
        act_int8_min_t=act_int8_min_t,
    )


def main():
    variables = make_model().init_variables(
        jax.random.key(0), seq_len=SAMPLE_LEN
    )

    rng0 = np.random.RandomState(0)
    audio = jnp.asarray(rng0.randn(BATCH, SAMPLE_LEN, 1) * 0.1, jnp.float32)
    labels = jnp.asarray(rng0.randint(0, 251, BATCH), jnp.int32)

    def make_swap(steps, sampler, eta=0.0, act_int8_min_t=0):
        model = make_model(act_int8_min_t)

        @jax.jit
        def swap(variables, audio, labels, rng):
            codes = model.encode(variables, audio)
            out = model.decode(
                variables, codes, rng, labels=labels, steps=steps,
                sampler=sampler, eta=eta,
            )
            return jnp.sum(out.astype(jnp.float32))

        return swap

    for label, steps, sampler, min_t in (
        ("50-step DDPM swap", 50, "ddpm", 0),
        ("10-step DDIM swap", 10, "ddim", 0),
        ("10-step DPM++ swap", 10, "dpmpp", 0),
        ("5-step DPM++ swap", 5, "dpmpp", 0),
        # int8-stored activations at the top three UNet levels
        # (ops/qact.py; quality arms: queue step 62).
        ("50-step DDPM int8 swap", 50, "ddpm", 16000),
        ("5-step DPM++ int8 swap", 5, "dpmpp", 16000),
    ):
        swap = make_swap(steps, sampler, act_int8_min_t=min_t)
        np.asarray(swap(variables, audio, labels, jax.random.key(1)))  # warm
        times = []
        for i in range(REPEATS):
            start = time.perf_counter()
            np.asarray(swap(variables, audio, labels, jax.random.key(2 + i)))
            times.append(time.perf_counter() - start)
        best = min(times)
        rtf = BATCH * SECONDS / best
        print(f"{label:24s} {best:6.2f} s / {BATCH * SECONDS} s audio  "
              f"-> RTF {rtf:8.1f}x real time", flush=True)


if __name__ == "__main__":
    main()
