"""Sampling-throughput benchmark for the flagship model.

Measures generated audio throughput (waveform samples/sec/chip) for 50-step
DDPM sampling with the unet64-class predictor (~50M params) — the headline
configuration of BASELINE.md — and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against the PyTorch reference running the same
50-step unet64 sampling on this host's CPU (measured with
scripts/measure_reference_cpu.py; see BASELINE_CPU_SAMPLES_PER_SEC below).
"""

import json
import time

import jax
import jax.numpy as jnp

from vq_voice_swap_tpu.diffusion import make_warp
from vq_voice_swap_tpu.diffusion_model import DiffusionModel

# Reference (torch CPU, 1x this host) throughput for 50-step unet64 sampling,
# in generated waveform samples per second. Measured via
# scripts/measure_reference_cpu.py on 2026-08-16 (batch 1, 4 s clip):
# one 50-step sample took ~873 s of CPU time => ~73 samples/sec.
BASELINE_CPU_SAMPLES_PER_SEC = 73.0

SAMPLE_LEN = 64000
STEPS = 50
BATCH = 4
REPEATS = 3


def main():
    model = DiffusionModel(pred_name="unet", base_channels=64)
    variables = model.init_variables(jax.random.key(0), seq_len=SAMPLE_LEN)
    warp = make_warp("quadratic")  # the README t=s^2 eval recipe

    @jax.jit
    def sample(variables, rng):
        noise_rng, samp_rng = jax.random.split(rng)
        x_T = jax.random.normal(noise_rng, (BATCH, SAMPLE_LEN, 1))
        return model.diffusion.ddpm_sample(
            x_T,
            lambda xs, ts: model.predict_eps(variables, xs, ts),
            steps=STEPS,
            rng=samp_rng,
            warp=warp,
        )

    # Warmup / compile.
    out = sample(variables, jax.random.key(1))
    out.block_until_ready()

    start = time.perf_counter()
    for i in range(REPEATS):
        out = sample(variables, jax.random.key(2 + i))
    out.block_until_ready()
    elapsed = time.perf_counter() - start

    samples_per_sec = REPEATS * BATCH * SAMPLE_LEN / elapsed
    print(
        json.dumps(
            {
                "metric": "unet64 50-step sampling throughput",
                "value": round(samples_per_sec, 1),
                "unit": "audio samples/sec/chip",
                "vs_baseline": round(
                    samples_per_sec / BASELINE_CPU_SAMPLES_PER_SEC, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
