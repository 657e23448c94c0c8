"""Microbenchmark: one same-resolution ResBlock, XLA vs Pallas megakernel.

Isolates ops/fused_resblock.py from full-model fusion effects at the three
shapes that dominate the unet64 forward (PERF.md roofline).

Run on TPU:  python scripts/bench_fused_block.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from vq_voice_swap_tpu.models.layers import ResBlock, adaptive_group_count
from vq_voice_swap_tpu.ops.fused_resblock import fused_resblock

N = 16
EMB = 256


def bench(label, fn, *args, repeats=3, inner=20):
    # fn returns a device SCALAR (sum of the block output): fetching the
    # full [N, T, C] output through the tunnel costs ~20 s and would swamp
    # the measurement. ``inner`` chained applications amortise dispatch.
    np.asarray(fn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        times.append(time.perf_counter() - t0)
    ms = min(times) * 1e3 / inner
    print(f"{label:40s} {ms:8.3f} ms")
    return ms


def run_shape(t, cin, cout, dilation=2, dtype=jnp.bfloat16):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, t, cin), dtype)
    emb = jnp.asarray(rng.randn(N, EMB), dtype)
    block = ResBlock(out_channels=cout, use_emb=True, dilation=dilation,
                     dtype=dtype)
    params = block.init(jax.random.key(0), x, emb)["params"]
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.randn(*p.shape) * 0.1, p.dtype), params
    )

    INNER = 20

    def chain(f):
        # 20 chained block applications in one program; data-dependent so
        # XLA cannot elide any, reduced to a scalar at the end.
        @jax.jit
        def run(xx):
            def body(h, _):
                out = f(h)
                return (out if cin == cout
                        else jnp.concatenate([out, out], -1)[..., :cin]), 0.0
            h, _ = jax.lax.scan(body, xx, None, length=INNER)
            return jnp.sum(h.astype(jnp.float32))
        return run

    xla = chain(lambda xx: block.apply({"params": params}, xx, emb))

    fused = chain(
        lambda xx: fused_resblock(
            xx, params, emb,
            groups_in=adaptive_group_count(cin),
            groups_out=adaptive_group_count(cout),
            dilation=dilation,
        )
    )
    name = f"[{N},{t},{cin}->{cout}] d={dilation}"
    a = bench(f"xla        {name}", xla, x, inner=INNER)
    b = bench(f"fused      {name}", fused, x, inner=INNER)
    one_x = jax.jit(lambda xx: block.apply({"params": params}, xx, emb))
    one_f = jax.jit(lambda xx: fused_resblock(
        xx, params, emb, groups_in=adaptive_group_count(cin),
        groups_out=adaptive_group_count(cout), dilation=dilation))
    diff = float(jnp.max(jnp.abs(
        one_x(x).astype(jnp.float32) - one_f(x).astype(jnp.float32))))
    print(f"  speedup {a / b:5.2f}x   max|diff| {diff:.3e}")


def run_two_input(t, c, dtype=jnp.bfloat16):
    """Up-path block: fused-with-x2 (no concat materialisation) vs XLA on
    the materialised concat."""
    rng = np.random.RandomState(1)
    h = jnp.asarray(rng.randn(N, t, c), dtype)
    skip = jnp.asarray(rng.randn(N, t, c), dtype)
    emb = jnp.asarray(rng.randn(N, EMB), dtype)
    block = ResBlock(out_channels=c, use_emb=True, dilation=2, dtype=dtype)
    params = block.init(
        jax.random.key(0), jnp.concatenate([h, skip], -1), emb
    )["params"]
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.randn(*p.shape) * 0.1, p.dtype), params
    )
    INNER = 20

    def chain2(f):
        @jax.jit
        def run(a, b):
            hh, _ = jax.lax.scan(lambda carry, _: (f(carry, b), 0.0),
                                 a, None, length=INNER)
            return jnp.sum(hh.astype(jnp.float32))
        return run

    xla = chain2(lambda a, b: block.apply(
        {"params": params}, jnp.concatenate([a, b], -1), emb))
    fused = chain2(lambda a, b: fused_resblock(
        a, params, emb, groups_in=adaptive_group_count(2 * c),
        groups_out=adaptive_group_count(c), dilation=2, x2=b))
    name = f"[{N},{t},{c}+{c}->{c}] concat"
    a = bench(f"xla        {name}", xla, h, skip, inner=INNER)
    b = bench(f"fused x2   {name}", fused, h, skip, inner=INNER)
    one_x = jax.jit(lambda a, b: block.apply(
        {"params": params}, jnp.concatenate([a, b], -1), emb))
    one_f = jax.jit(lambda a, b: fused_resblock(
        a, params, emb, groups_in=adaptive_group_count(2 * c),
        groups_out=adaptive_group_count(c), dilation=2, x2=b))
    diff = float(jnp.max(jnp.abs(
        one_x(h, skip).astype(jnp.float32)
        - one_f(h, skip).astype(jnp.float32))))
    print(f"  speedup {a / b:5.2f}x   max|diff| {diff:.3e}")


def main():
    run_shape(64000, 64, 64)        # level-0 down block
    run_shape(64000, 128, 64)       # level-0 up block (concat input)
    run_shape(32000, 64, 64)        # level-1 down block
    run_shape(16000, 128, 128)      # level-2
    run_shape(64000, 64, 64, dilation=1)
    run_two_input(64000, 64)        # level-0 up block, halves kept apart


if __name__ == "__main__":
    main()
