"""Benchmark the Pallas VQ assignment vs the XLA path on the real chip.

VERDICT.md round-2 item 7: the kernel must win somewhere real or be retired.
Measures the memory-bound regime the reference's embedding_distances chunking
exists for (/root/reference/vq_voice_swap/vq.py:199-221): large codebooks.

Run on TPU:  python scripts/bench_vq.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from vq_voice_swap_tpu.ops.vq_pallas import _xla_assign, vq_assign_pallas

CASES = [
    # (B rows, D codes, C channels)
    (1600, 512, 512),     # flagship: unet128 encoder, batch 8 x T1=200
    (6400, 512, 512),     # batch 32
    (1600, 4096, 512),    # large codebook
    (6400, 4096, 512),
    (1600, 4096, 128),    # large codebook, narrow code dim
    (25600, 1024, 128),
]


def timeit(fn, *args, repeats=30, rounds=3):
    """Per-call time with async dispatch amortisation.

    These kernels run in 0.1-5 ms, far below the tunnel round-trip, so
    timing one synchronous call measures the tunnel, not the kernel.
    Queue ``repeats`` async dispatches and block once; the device executes
    them back-to-back while dispatch latency overlaps.
    """
    jax.block_until_ready(fn(*args))  # compile + warm
    times = []
    for _ in range(rounds):
        start = time.perf_counter()
        out = None
        for _ in range(repeats):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - start) / repeats)
    return min(times)


def main():
    print(f"backend: {jax.default_backend()}")
    for b, d, c in CASES:
        rng = np.random.RandomState(0)
        dictionary = jnp.asarray(rng.randn(d, c), jnp.float32)
        x = jnp.asarray(rng.randn(b, c), jnp.float32)

        xla = jax.jit(_xla_assign)
        pal = jax.jit(lambda dd, xx: vq_assign_pallas(dd, xx, tile=512))

        ix, ux = xla(dictionary, x)
        ip, up = pal(dictionary, x)
        same = bool(
            np.array_equal(np.asarray(ix), np.asarray(ip))
            and np.array_equal(np.asarray(ux), np.asarray(up))
        )

        t_xla = timeit(xla, dictionary, x) * 1e3
        t_pal = timeit(pal, dictionary, x) * 1e3
        print(
            f"B={b:6d} D={d:5d} C={c:4d}  xla {t_xla:7.3f} ms  "
            f"pallas {t_pal:7.3f} ms  speedup {t_xla / t_pal:5.2f}x  "
            f"exact={same}"
        )


if __name__ == "__main__":
    main()
