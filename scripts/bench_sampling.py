"""Compare sampling-path variants on the real chip (PERF.md round-2).

Baseline: current DiffusionModel.predict_eps (flax forward).
Variants: channel-packed execution of the C=64 full-resolution levels
(ops/packed_unet.py), donated sampling buffers.

Run on TPU:  python scripts/bench_sampling.py
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
from vq_voice_swap_tpu.ops.packed_unet import (
    pack_unet_params,
    packed_unet_predict,
)

SAMPLE_LEN = 64000
STEPS = 50
BATCH = 16


def timed(label, fn, *args, repeats=2, steps=STEPS):
    # All timed fns return a device SCALAR: fetching the full sample tensor
    # through the tunnel costs ~1 s and would pollute the measurement. The
    # remaining wall time is device compute + one dispatch (~0.1 s, noted).
    np.asarray(fn(*args))  # warm (compile + program load)
    times = []
    for _ in range(repeats):
        start = time.perf_counter()
        np.asarray(fn(*args))
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

    def make_sampler(pred_fn, donate=False):
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

    def packed_pred_k(k):
        def pred(variables, xs, ts):
            return packed_unet_predict(
                model.predictor, variables["params"]["predictor"],
                xs, ts, pack_levels=k,
            )
        return pred

    # Chained-forward comparison first (isolates the model from the
    # sampling update): INNER data-dependent forwards in one program,
    # reduced to a scalar on device.
    INNER = 20
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

    timed("forward baseline", chain(baseline_pred), variables, steps=INNER)
    for k in (1, 2):
        timed(f"forward packed k={k}", chain(packed_pred_k(k)), variables,
              steps=INNER)

    # Numerical sanity in bf16: packed vs baseline forward.
    fwd_base = jax.jit(lambda v: baseline_pred(v, xs, ts))
    b = np.asarray(fwd_base(variables), np.float32)
    p = np.asarray(
        jax.jit(lambda v: packed_pred_k(2)(v, xs, ts))(variables), np.float32
    )
    print(f"packed-vs-baseline forward max|diff| = {np.abs(b - p).max():.3e} "
          f"(bf16 reassociation)")

    timed("50-step sampling baseline", make_sampler(baseline_pred),
          variables, jax.random.key(1))
    for k in (1, 2):
        timed(f"50-step sampling packed k={k}",
              make_sampler(packed_pred_k(k)), variables, jax.random.key(1))

    # Prepacked weights: kernel repacking hoisted out of the sampling scan.
    def make_prepacked_sampler(k):
        def sample(variables, rng):
            prep = pack_unet_params(
                model.predictor, variables["params"]["predictor"],
                pack_levels=k,
            )

            def pred(xs, ts):
                return packed_unet_predict(
                    model.predictor, variables["params"]["predictor"],
                    xs, ts, pack_levels=k, prepacked=prep,
                )

            noise_rng, samp_rng = jax.random.split(rng)
            x_T = jax.random.normal(noise_rng, (BATCH, SAMPLE_LEN, 1))
            out = model.diffusion.ddpm_sample(
                x_T, pred, steps=STEPS, rng=samp_rng, warp=warp,
            )
            return jnp.sum(out.astype(jnp.float32))
        return jax.jit(sample)

    for k in (1, 2):
        timed(f"50-step sampling prepacked k={k}",
              make_prepacked_sampler(k), variables, jax.random.key(1))

    # Fused ResBlock megakernel variants (ops/fused_resblock.py).
    def fused_pred_k(k):
        def pred(variables, xs, ts):
            return packed_unet_predict(
                model.predictor, variables["params"]["predictor"],
                xs, ts, pack_levels=0, fuse_levels=k,
            )
        return pred

    b = np.asarray(fwd_base(variables), np.float32)
    f = np.asarray(
        jax.jit(lambda v: fused_pred_k(2)(v, xs, ts))(variables), np.float32
    )
    print(f"fused-vs-baseline forward max|diff| = {np.abs(b - f).max():.3e}")
    for k in (1, 2):
        timed(f"forward fused k={k}", chain(fused_pred_k(k)), variables,
              steps=INNER)
        timed(f"50-step sampling fused k={k}",
              make_sampler(fused_pred_k(k)), variables, jax.random.key(1))

    # MXU-routed GroupNorm statistics (VVS_MATMUL_GN), baseline model.
    os.environ["VVS_MATMUL_GN"] = "1"
    timed("50-step sampling matmul-GN", make_sampler(baseline_pred),
          variables, jax.random.key(1))
    del os.environ["VVS_MATMUL_GN"]


if __name__ == "__main__":
    main()
