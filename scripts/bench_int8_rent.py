"""Rent check for int8-stored full-resolution activations (VERDICT round-3
item 8: the sampling forward is pinned at ~2x the HBM roofline by GroupNorm
re-reads of [16, 64000, C] activations; PERF.md's conclusion is that only a
numerics change — e.g. int8 storage at the full-resolution levels — can cut
those bytes further).

Before building a quality-gated int8 path through the UNet, measure whether
the core chain even pays rent on this chip. The unit under test is the
full-resolution ResBlock inner pattern:

    GroupNorm -> GELU -> conv(k=3, C->C)

- baseline: activations materialized bf16 (2 B/elem reads+writes)
- int8-stored: activations materialized int8 (1 B/elem) with per-tensor
  dynamic scales; GN statistics read the int8 tensor and convert
  in-register; the conv runs int8 x int8 -> int32 on the MXU.

If the int8 chain is not measurably faster, the idea is dead on arrival
and the ledger records a negative result without touching model code.

Run on TPU:  python scripts/bench_int8_rent.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

N, T, C = 16, 64000, 64
GROUPS = 32
REPEAT = 30


def group_norm_f(x32, scale, bias):
    """GN over [N, T, C] given f32 inputs (stats in f32, fast variance)."""
    g = GROUPS
    xg = x32.reshape(N, T, g, C // g)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(xg), axis=(1, 3), keepdims=True)
        - jnp.square(mean), 0.0,
    )
    normed = (xg - mean) * jax.lax.rsqrt(var + 1e-5)
    return normed.reshape(N, T, C) * scale + bias


def conv_bf16(x, kernel):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16),
        window_strides=(1,), padding="SAME",
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )


def conv_int8(xq, kq):
    return jax.lax.conv_general_dilated(
        xq, kq, window_strides=(1,), padding="SAME",
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.int32,
    )


def quantize(x32):
    """Symmetric per-tensor int8 quantization."""
    amax = jnp.maximum(jnp.max(jnp.abs(x32)), 1e-6)
    s = amax / 127.0
    q = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    return q, s


def main():
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), "..", "runs", "jax_cache"),
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, T, C), jnp.bfloat16)
    kernel = jnp.asarray(rng.randn(3, C, C) * 0.05, jnp.float32)
    scale = jnp.asarray(rng.rand(C) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)

    # Chain the op CHAIN_LEN times so the measurement is dominated by
    # steady-state HBM traffic, not call overhead.
    CHAIN = 8

    @jax.jit
    def chain_bf16(x):
        h = x
        for _ in range(CHAIN):
            y = group_norm_f(h.astype(jnp.float32), scale, bias)
            y = jax.nn.gelu(y, approximate=False)
            h = conv_bf16(y, kernel).astype(jnp.bfloat16)
        return h

    xq0, s0 = quantize(jnp.asarray(x, jnp.float32))
    kq, ks = quantize(kernel)

    @jax.jit
    def chain_int8(xq, s):
        h, hs = xq, s
        for _ in range(CHAIN):
            # GN stats/normalize read the int8 tensor (1 B/elem), convert
            # in-register; output re-quantizes to int8 for the conv.
            y = group_norm_f(h.astype(jnp.float32) * hs, scale, bias)
            y = jax.nn.gelu(y, approximate=False)
            yq, ys = quantize(y)
            acc = conv_int8(yq, kq)  # int8 x int8 -> int32 MXU
            h32 = acc.astype(jnp.float32) * (ys * ks)
            h, hs = quantize(h32)
        return h, hs

    def bench(fn, *args):
        np.asarray(jax.tree.leaves(fn(*args))[0])  # warm/compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(REPEAT):
                out = fn(*args)
            np.asarray(jax.tree.leaves(out)[0])
            times.append((time.perf_counter() - t0) / REPEAT / CHAIN * 1e3)
        return min(times)

    ms_b = bench(chain_bf16, x)
    ms_q = bench(chain_int8, xq0, s0)
    # Ideal-byte bound: bf16 chain moves ~3 full tensors x 2 B/elem per op
    # (GN read + normalized write + conv read ~ fused, conv write); int8
    # halves the materialized ones.
    elems = N * T * C
    print(f"GN->GELU->conv chain at [{N},{T},{C}] ({elems / 1e6:.0f}M elem):")
    print(f"  bf16-stored: {ms_b:7.3f} ms/op")
    print(f"  int8-stored: {ms_q:7.3f} ms/op   speedup {ms_b / ms_q:5.2f}x")
    # Numerical sanity: the int8 chain should still correlate with bf16.
    hb = np.asarray(chain_bf16(x), np.float32).ravel()
    hq8, hs8 = chain_int8(xq0, s0)
    hq = (np.asarray(hq8, np.float32) * float(hs8)).ravel()
    cc = np.corrcoef(hb, hq)[0, 1]
    print(f"  correlation after {CHAIN} chained ops: {cc:.4f} "
          "(quality gate would be the 10k Frechet protocol, not this)")


if __name__ == "__main__":
    main()
