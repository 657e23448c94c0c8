"""Diagnose sampling timing on the tunneled TPU runtime."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vq_voice_swap_tpu.diffusion import make_warp
from vq_voice_swap_tpu.diffusion_model import DiffusionModel


def main():
    model = DiffusionModel(pred_name="unet", base_channels=64)
    t0 = time.time()
    variables = model.init_variables(jax.random.key(0), seq_len=64000)
    jax.block_until_ready(variables)
    print("init", round(time.time() - t0, 1), flush=True)
    warp = make_warp("quadratic")

    def sample(variables, rng):
        noise_rng, samp_rng = jax.random.split(rng)
        x_T = jax.random.normal(noise_rng, (4, 64000, 1))
        return model.diffusion.ddpm_sample(
            x_T,
            lambda xs, ts: model.predict_eps(variables, xs, ts),
            steps=50,
            rng=samp_rng,
            warp=warp,
        )

    t0 = time.time()
    compiled = jax.jit(sample).lower(variables, jax.random.key(1)).compile()
    print("compile", round(time.time() - t0, 1), flush=True)

    t0 = time.time()
    out = compiled(variables, jax.random.key(1))
    out.block_until_ready()
    print("exec1 (block)", round(time.time() - t0, 2), flush=True)

    t0 = time.time()
    host = np.asarray(out)
    print("fetch", round(time.time() - t0, 2), "std", host.std(), flush=True)

    for i in range(2):
        t0 = time.time()
        out = compiled(variables, jax.random.key(2 + i))
        host = np.asarray(out)
        print(f"exec{i + 2}+fetch", round(time.time() - t0, 2), flush=True)


if __name__ == "__main__":
    main()
