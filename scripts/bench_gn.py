"""Micro-benchmark GroupNorm formulations on TPU (PERF.md round-2 lever).

The round-1 profile put GN statistics (convert_reduce fusions) at the top of
the unet64 forward. This measures isolated formulations on the hot shapes
([16, 64000, 64] bf16 etc.) to find which reduce lowering hits the HBM
roofline before integrating anything:

  a) flax nn.GroupNorm (current implementation)
  b) reshape-reduce: (N,T,G,c) sum/sumsq in f32, normalize
  c) matmul-reduce: ones-vector dot over T on the MXU, then group-sum
  d) transpose to [N, C, T], stats over minor T, normalize in NTC

All formulations are numerically verified against (a) before timing.
Sync via np.asarray (block_until_ready unreliable on this runtime).

Run on the real chip:  python scripts/bench_gn.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-5


def _normalize(x, mean, var, scale, bias, groups):
    """Apply per-(n,g) stats to [N, T, C] x."""
    n, t, c = x.shape
    cg = c // groups
    inv = jax.lax.rsqrt(var + EPS)  # [N, G]
    inv_c = jnp.repeat(inv, cg, axis=1)[:, None, :]  # [N, 1, C]
    mean_c = jnp.repeat(mean, cg, axis=1)[:, None, :]
    out = (x.astype(jnp.float32) - mean_c) * inv_c
    return (out * scale + bias).astype(x.dtype)


def gn_flax(x, scale, bias, groups):
    import flax.linen as nn

    return nn.GroupNorm(num_groups=groups, epsilon=EPS, name="gn").apply(
        {"params": {"scale": scale, "bias": bias}}, x
    )


def gn_reshape(x, scale, bias, groups):
    n, t, c = x.shape
    xf = x.astype(jnp.float32)
    g = jnp.reshape(xf, (n, t, groups, c // groups))
    mean = jnp.mean(g, axis=(1, 3))
    var = jnp.mean(jnp.square(g), axis=(1, 3)) - jnp.square(mean)
    return _normalize(x, mean, var, scale, bias, groups)


def gn_matmul(x, scale, bias, groups):
    n, t, c = x.shape
    xf = x.astype(jnp.float32)
    ones = jnp.ones((t,), jnp.float32)
    s1 = jnp.einsum("ntc,t->nc", xf, ones)                 # MXU reduce over T
    s2 = jnp.einsum("ntc,ntc->nc", xf, xf)                 # elementwise+reduce
    cg = c // groups
    s1 = jnp.sum(jnp.reshape(s1, (n, groups, cg)), axis=-1)
    s2 = jnp.sum(jnp.reshape(s2, (n, groups, cg)), axis=-1)
    count = t * cg
    mean = s1 / count
    var = s2 / count - jnp.square(mean)
    return _normalize(x, mean, var, scale, bias, groups)


def gn_nct(x, scale, bias, groups):
    n, t, c = x.shape
    xt = jnp.transpose(x, (0, 2, 1)).astype(jnp.float32)   # [N, C, T]
    g = jnp.reshape(xt, (n, groups, (c // groups) * t))
    mean = jnp.mean(g, axis=-1)
    var = jnp.mean(jnp.square(g), axis=-1) - jnp.square(mean)
    return _normalize(x, mean, var, scale, bias, groups)


FORMULATIONS = [
    ("flax_groupnorm", gn_flax),
    ("reshape_reduce", gn_reshape),
    ("matmul_reduce", gn_matmul),
    ("nct_transpose", gn_nct),
]

SHAPES = [
    ((16, 64000, 64), 32),    # unet64 level-0 hot shape
    ((16, 16000, 128), 32),   # level-2
    ((16, 2000, 256), 32),    # mid pyramid
]


def timeit(fn, *args, repeats=3):
    np.asarray(fn(*args))  # warm: compile + device program load
    times = []
    for _ in range(repeats):
        start = time.perf_counter()
        np.asarray(fn(*args))
        times.append(time.perf_counter() - start)
    return min(times)


def main():
    dtype = jnp.bfloat16
    for shape, groups in SHAPES:
        n, t, c = shape
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(*shape), dtype=dtype)
        scale = jnp.asarray(1.0 + 0.1 * rng.randn(c), jnp.float32)
        bias = jnp.asarray(0.1 * rng.randn(c), jnp.float32)

        bytes_touched = 2 * np.prod(shape) * x.dtype.itemsize
        roofline_ms = bytes_touched / 819e9 * 1e3

        ref = None
        print(f"\n[{shape} {np.dtype(x.dtype).name} G={groups}] "
              f"HBM roofline ~{roofline_ms:.2f} ms (r+w once)")
        for name, fn in FORMULATIONS:
            jf = jax.jit(lambda xx, s, b, f=fn: f(xx, s, b, groups))
            out = np.asarray(jf(x, scale, bias), dtype=np.float32)
            if ref is None:
                ref = out
                err = 0.0
            else:
                err = float(np.max(np.abs(out - ref)))
            ms = timeit(jf, x, scale, bias) * 1e3
            print(f"  {name:16s} {ms:8.3f} ms   ({ms / roofline_ms:5.1f}x "
                  f"roofline)  max|err|={err:.2e}")


if __name__ == "__main__":
    main()
