"""int8-stored activation sampling bench (PERF.md round 4).

The rent check (bench_int8_rent.py, queue step 57) measured the isolated
full-resolution GN->GELU->conv chain at 1.42x under int8 storage. This is
the model-level follow-up: the flagship unet64 50-step sampler with
``act_int8_min_t`` swept over level cutoffs:

  - 64000: only the full-resolution level stores int8
  - 16000: the top three levels (~3/4 of forward bytes)
  -  4000: everything down to T=4000

against the bf16 baseline. Throughput-only — quality is gated separately
by the 10k Frechet protocol arms (queue step 62).

Run on TPU:  python scripts/bench_int8_sampling.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from vq_voice_swap_tpu.diffusion import make_warp
from vq_voice_swap_tpu.diffusion_model import DiffusionModel

SAMPLE_LEN = 64000
STEPS = 50
BATCH = 16


def main():
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), "..", "runs", "jax_cache"),
    )
    warp = make_warp("quadratic")
    variables = None

    for label, min_t in (
        ("bf16 baseline", 0),
        ("int8 @ T>=64000 (top level)", 64000),
        ("int8 @ T>=16000 (top 3)", 16000),
        ("int8 @ T>=4000 (top 5)", 4000),
    ):
        model = DiffusionModel(pred_name="unet", base_channels=64,
                               dtype="bfloat16", act_int8_min_t=min_t)
        if variables is None:
            variables = model.init_variables(
                jax.random.key(0), seq_len=SAMPLE_LEN
            )

        @jax.jit
        def sample(variables, rng):
            noise_rng, samp_rng = jax.random.split(rng)
            x_T = jax.random.normal(noise_rng, (BATCH, SAMPLE_LEN, 1))
            out = model.diffusion.ddpm_sample(
                x_T,
                lambda xs, ts: model.predict_eps(variables, xs, ts),
                steps=STEPS, rng=samp_rng, warp=warp,
            )
            return jnp.sum(out.astype(jnp.float32))

        np.asarray(sample(variables, jax.random.key(1)))  # warm/compile
        times = []
        for i in range(3):
            start = time.perf_counter()
            np.asarray(sample(variables, jax.random.key(2 + i)))
            times.append(time.perf_counter() - start)
        best = min(times)
        tput = BATCH * SAMPLE_LEN / best
        print(f"{label:30s} {best * 1e3 / STEPS:8.2f} ms/step  "
              f"{tput:12.0f} samples/s", flush=True)


if __name__ == "__main__":
    main()
