"""Sampling-path shootout on the real chip (PERF.md ledger).

Rows: baseline DiffusionModel ddpm_sample, the donated-buffer scan (the
last unmeasured ledger idea: x_T handed to the jitted sampler with
donate_argnums so XLA may alias it into the scan carry, halving transient
HBM), and the MXU-routed GroupNorm variant (VVS_MATMUL_GN).

The measured-slower Pallas megakernel/channel-packing variants were retired
to attic/ (see attic/README.md); their shootout rows remain in PERF.md.

Run on TPU:  python scripts/bench_sampling.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from vq_voice_swap_tpu.diffusion import make_warp
from vq_voice_swap_tpu.diffusion_model import DiffusionModel

SAMPLE_LEN = 64000
STEPS = 50
BATCH = 16


def timed(label, fn, *args, repeats=3, steps=STEPS, fresh_args=None):
    """All timed fns return a device SCALAR: fetching the full sample tensor
    through the tunnel costs ~1 s and would pollute the measurement.
    ``fresh_args``: callable producing new positional args per repeat (needed
    when the fn donates one of its inputs)."""
    np.asarray(fn(*(fresh_args() if fresh_args else args)))  # warm
    times = []
    for _ in range(repeats):
        call_args = fresh_args() if fresh_args else args
        start = time.perf_counter()
        np.asarray(fn(*call_args))
        times.append(time.perf_counter() - start)
    best = min(times)
    tput = BATCH * SAMPLE_LEN / best
    print(f"{label:34s} {best * 1e3 / steps:8.2f} ms/step  "
          f"{tput:12.0f} samples/s", flush=True)
    return best


def main():
    model = DiffusionModel(pred_name="unet", base_channels=64,
                           dtype="bfloat16")
    variables = model.init_variables(jax.random.key(0), seq_len=SAMPLE_LEN)
    warp = make_warp("quadratic")

    def pred(variables, xs, ts):
        return model.predict_eps(variables, xs, ts)

    def make_sampler():
        def sample(variables, rng):
            noise_rng, samp_rng = jax.random.split(rng)
            x_T = jax.random.normal(noise_rng, (BATCH, SAMPLE_LEN, 1))
            out = model.diffusion.ddpm_sample(
                x_T, lambda xs, ts: pred(variables, xs, ts),
                steps=STEPS, rng=samp_rng, warp=warp,
            )
            return jnp.sum(out.astype(jnp.float32))
        return jax.jit(sample)

    timed("50-step sampling baseline", make_sampler(),
          variables, jax.random.key(1))

    # Donated-buffer scan: x_T produced by a separate program and DONATED to
    # the sampler, letting XLA alias the input buffer into the scan carry.
    noise_fn = jax.jit(
        lambda rng: jax.random.normal(rng, (BATCH, SAMPLE_LEN, 1))
    )

    @partial(jax.jit, donate_argnums=(1,))
    def donated_sample(variables, x_T, rng):
        out = model.diffusion.ddpm_sample(
            x_T, lambda xs, ts: pred(variables, xs, ts),
            steps=STEPS, rng=rng, warp=warp,
        )
        return jnp.sum(out.astype(jnp.float32))

    counter = iter(range(1_000_000))

    def fresh():
        rng = jax.random.fold_in(jax.random.key(1), next(counter))
        x_T = noise_fn(rng)
        x_T.block_until_ready()
        return variables, x_T, rng

    timed("50-step sampling donated x_T", donated_sample,
          fresh_args=fresh)

    # MXU-routed GroupNorm statistics (VVS_MATMUL_GN), baseline model.
    os.environ["VVS_MATMUL_GN"] = "1"
    timed("50-step sampling matmul-GN", make_sampler(),
          variables, jax.random.key(1))
    del os.environ["VVS_MATMUL_GN"]


if __name__ == "__main__":
    main()
