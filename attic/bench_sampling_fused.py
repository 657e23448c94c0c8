"""Continuation of bench_sampling.py: fused-ResBlock and matmul-GN rows only
(the full script front-loads ~30 min of baseline/packed compiles).

Run on TPU:  python scripts/bench_sampling_fused.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from vq_voice_swap_tpu.diffusion import make_warp
from vq_voice_swap_tpu.diffusion_model import DiffusionModel
from vq_voice_swap_tpu.ops.packed_unet import packed_unet_predict

# Shared constants + timing methodology: numbers from this script are only
# comparable with bench_sampling.py's because these are the same objects.
from bench_sampling import BATCH, SAMPLE_LEN, STEPS, timed  # noqa: E402

INNER = 20


def main():
    model = DiffusionModel(pred_name="unet", base_channels=64,
                           dtype="bfloat16")
    variables = model.init_variables(jax.random.key(0), seq_len=SAMPLE_LEN)
    warp = make_warp("quadratic")

    def make_sampler(pred_fn):
        def sample(variables, rng):
            noise_rng, samp_rng = jax.random.split(rng)
            x_T = jax.random.normal(noise_rng, (BATCH, SAMPLE_LEN, 1))
            out = model.diffusion.ddpm_sample(
                x_T, lambda xs, ts: pred_fn(variables, xs, ts),
                steps=STEPS, rng=samp_rng, warp=warp,
            )
            return jnp.sum(out.astype(jnp.float32))
        return jax.jit(sample)

    def baseline_pred(variables, xs, ts):
        return model.predict_eps(variables, xs, ts)

    rng0 = np.random.RandomState(0)
    xs = jnp.asarray(rng0.randn(BATCH, SAMPLE_LEN, 1), jnp.float32)
    ts = jnp.full((BATCH,), 0.5, jnp.float32)

    def chain(pred_fn):
        @jax.jit
        def run(v):
            def body(h, _):
                return pred_fn(v, h, ts).astype(h.dtype), 0.0
            h, _ = jax.lax.scan(body, xs, None, length=INNER)
            return jnp.sum(h.astype(jnp.float32))
        return run

    def fused_pred_k(k):
        def pred(variables, xs, ts):
            return packed_unet_predict(
                model.predictor, variables["params"]["predictor"],
                xs, ts, pack_levels=0, fuse_levels=k,
            )
        return pred

    fwd_base = jax.jit(lambda v: baseline_pred(v, xs, ts))
    b = np.asarray(fwd_base(variables), np.float32)
    f = np.asarray(
        jax.jit(lambda v: fused_pred_k(2)(v, xs, ts))(variables), np.float32
    )
    print(f"fused-vs-baseline forward max|diff| = {np.abs(b - f).max():.3e}",
          flush=True)
    for k in (1, 2):
        timed(f"forward fused k={k}", chain(fused_pred_k(k)), variables,
              steps=INNER)
        timed(f"50-step sampling fused k={k}",
              make_sampler(fused_pred_k(k)), variables, jax.random.key(1))

    os.environ["VVS_MATMUL_GN"] = "1"
    timed("50-step sampling matmul-GN", make_sampler(baseline_pred),
          variables, jax.random.key(1))
    del os.environ["VVS_MATMUL_GN"]


if __name__ == "__main__":
    main()
