"""Experimental Pallas GroupNorm (+ optional GELU) for [N, T, C] activations.

Status: OPT-IN (VVS_FUSED_GROUPNORM=1), measured end-to-end SLOWER than the
default flax GroupNorm inside the full UNet and therefore disabled by
default — see PERF.md for the analysis. Kept because the isolated statistic
reduction genuinely is the dominant kernel class in the profile
(convert_reduce_fusion ~57% of forward device time), and a future
whole-block megakernel will want these pieces.

Contents:
  - a Pallas stats kernel: tiles over T, accumulating per-channel
    sum / sum-of-squares in VMEM f32 (single sequential pass);
  - per-group statistics + folded affine in plain XLA (tiny [N, C] work);
  - normalize + exact GELU in XLA so they keep fusing with neighbors
    (a Pallas apply kernel, kept below for reference, measured worse);
  - a custom VJP whose backward differentiates the reference XLA
    implementation, so the op is trainable either way.

Semantics match flax.linen.GroupNorm(num_groups, epsilon) followed by exact
GELU. Off-TPU or for awkward shapes it falls back to the XLA reference.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["fused_group_norm", "reference_group_norm", "pick_tile",
           "fused_norm_enabled", "matmul_norm_enabled", "matmul_group_norm"]


def fused_norm_enabled() -> bool:
    """Opt-in flag for the experimental Pallas GroupNorm (see _supported)."""
    import os

    return os.environ.get("VVS_FUSED_GROUPNORM", "0") == "1"


def matmul_norm_enabled() -> bool:
    """Opt-in flag for MXU-routed GroupNorm statistics (matmul_group_norm)."""
    import os

    return os.environ.get("VVS_MATMUL_GN", "0") == "1"


def reference_group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float,
    use_gelu: bool,
) -> jnp.ndarray:
    """Plain-XLA GroupNorm(+GELU), the semantic reference and fallback."""
    n, t, c = x.shape
    xf = x.astype(jnp.float32)
    grouped = jnp.reshape(xf, (n, t, num_groups, c // num_groups))
    mean = jnp.mean(grouped, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(grouped - mean), axis=(1, 3), keepdims=True)
    normed = (grouped - mean) * jax.lax.rsqrt(var + eps)
    normed = jnp.reshape(normed, (n, t, c))
    out = normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if use_gelu:
        out = jax.nn.gelu(out, approximate=False)
    return out.astype(x.dtype)


def pick_tile(t: int, c: int, dtype) -> Optional[int]:
    """A T-tile that divides t, aligned to the sublane count, and small
    enough that the double-buffered blocks + f32 temporaries fit VMEM."""
    align = 16 if dtype == jnp.bfloat16 else 8
    # Keep the bf16/f32 block at <= 512 KB: with in/out double buffering and
    # f32 compute temporaries this stays well under the 16 MB VMEM budget.
    bytes_per = 2 if dtype == jnp.bfloat16 else 4
    max_tile = max(align, (512 * 1024) // (c * bytes_per))
    best = None
    for tile in range(align, min(t, max_tile) + 1, align):
        if t % tile == 0:
            best = tile
    return best


def _stats_kernel(x_ref, sum_ref, sq_ref):
    from jax.experimental import pallas as pl

    t_idx = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)  # [tile, C]
    part_sum = jnp.sum(x, axis=0, keepdims=True)  # [1, C]
    part_sq = jnp.sum(jnp.square(x), axis=0, keepdims=True)

    @pl.when(t_idx == 0)
    def _():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sq_ref[:] = jnp.zeros_like(sq_ref)

    sum_ref[0] = sum_ref[0] + part_sum
    sq_ref[0] = sq_ref[0] + part_sq


def _erf(x: jnp.ndarray) -> jnp.ndarray:
    """erf via Abramowitz-Stegun 7.1.26 (|err| < 1.5e-7): the Pallas TPU
    backend has no erf/erfc primitive."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429,
    )
    s = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + p * z)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-z * z))


def _apply_kernel(use_gelu, x_ref, a_ref, b_ref, out_ref):
    x = x_ref[0].astype(jnp.float32)  # [tile, C]
    y = x * a_ref[0] + b_ref[0]  # a/b blocks are [1, 1, C], broadcast
    if use_gelu:
        y = 0.5 * y * (1.0 + _erf(y * 0.7071067811865476))
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "use_gelu", "tile")
)
def _fused_forward(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float,
    use_gelu: bool,
    tile: int,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, t, c = x.shape
    grid = (n, t // tile)

    sums, sqs = pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ],
    )(x)
    sums = sums[:, 0, :]
    sqs = sqs[:, 0, :]
    return _finish_from_channel_stats(
        x, sums, sqs, scale, bias, num_groups, eps, use_gelu
    )


def _finish_from_channel_stats(x, sums, sqs, scale, bias, num_groups, eps,
                               use_gelu):
    """Per-channel f32 sum / sum-of-squares -> group stats -> folded affine
    -> normalize (+ GELU), all as tiny-[N, C] XLA ops plus one elementwise
    pass over x that fuses with the surrounding graph."""
    n, t, c = x.shape
    count = t * (c // num_groups)
    g_sum = jnp.sum(jnp.reshape(sums, (n, num_groups, -1)), axis=-1)
    g_sq = jnp.sum(jnp.reshape(sqs, (n, num_groups, -1)), axis=-1)
    mean = g_sum / count
    # Clamp at 0 like flax nn.GroupNorm: f32 cancellation in the one-pass
    # E[x^2] - mean^2 can go slightly negative for large-mean groups, and
    # rsqrt(<0 + eps) is NaN.
    var = jnp.maximum(g_sq / count - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)  # [N, G]
    inv_c = jnp.repeat(inv, c // num_groups, axis=-1)  # [N, C]
    mean_c = jnp.repeat(mean, c // num_groups, axis=-1)
    a = inv_c * scale.astype(jnp.float32)[None, :]
    b = bias.astype(jnp.float32)[None, :] - mean_c * a

    # Normalize + GELU in plain XLA: these elementwise ops fuse into the
    # surrounding graph (resize/conv inputs), so only the reduction — the
    # part XLA lowers badly for this shape — runs as a custom kernel.
    # (A Pallas apply kernel was measured slower overall: it breaks XLA's
    # fusion chain and forces extra materialisations at the call boundary.)
    out = x.astype(jnp.float32) * a[:, None, :] + b[:, None, :]
    if use_gelu:
        out = jax.nn.gelu(out, approximate=False)
    return out.astype(x.dtype)


def matmul_group_norm(x, scale, bias, num_groups, eps, use_gelu):
    """GroupNorm(+GELU) with the statistic reductions routed through the MXU.

    The profiled cost of the default GroupNorm on [N, T>=32k, C<=512] is the
    statistic reduction: XLA lowers the (T, C/G)-axis reduce at a fraction of
    HBM bandwidth (~57 GB/s measured for [16, 64000, 64] bf16). Dot products
    over the T axis hit the MXU at memory speed instead:

      - per-channel sums:      ones[8, T] @ x -> [8, N, C], row 0
      - per-channel sum-of-sq: diagonal of the batched Gram x^T x [N, C, C]

    Both are EXACT in f32 accumulation (bf16 x bf16 products have <= 16
    mantissa bits, representable exactly in f32), so this matches the f32
    two-pass statistics up to summation order. Everything stays inside XLA —
    no custom-call boundary, fusion with neighbors is preserved.
    """
    sums, sqs = mxu_channel_stats(x)
    return _finish_from_channel_stats(
        x, sums, sqs, scale, bias, num_groups, eps, use_gelu
    )


def mxu_channel_stats(x):
    """Per-channel f32 (sum, sum-of-squares) of [N, T, C] as MXU dots:
    ones[8, T] @ x (row 0) and the diagonal of the batched Gram x^T x.
    Shared by matmul_group_norm and the fused-ResBlock kernels."""
    n, t, c = x.shape
    ones = jnp.ones((8, t), x.dtype)
    # HIGHEST precision: DEFAULT would round f32 operands to bf16 on the
    # MXU, breaking the exact-f32-accumulation claim for f32 models (bf16
    # inputs are unaffected — their products are exact in f32 either way).
    sums = jax.lax.dot_general(
        ones, x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )[0]  # [N, C]
    gram = jax.lax.dot_general(
        x, x, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [N, C, C]
    sqs = jnp.diagonal(gram, axis1=1, axis2=2)  # [N, C]
    return sums, sqs


def _supported(x: jnp.ndarray) -> Optional[int]:
    # Opt-in only: end-to-end measurement showed the pure-XLA GroupNorm wins
    # inside the full UNet — XLA fuses the statistic reduction with producer
    # ops, and a custom-call boundary forces extra materialisations that
    # cost more than the faster reduce saves (see PERF.md). Kept for shape
    # regimes where the reduce dominates in isolation.
    import os

    if os.environ.get("VVS_FUSED_GROUPNORM", "0") != "1":
        return None
    if jax.default_backend() != "tpu" or jax.device_count() != 1:
        return None
    if x.ndim != 3:
        return None
    n, t, c = x.shape
    if t < 512:  # small tensors: XLA is fine
        return None
    return pick_tile(t, c, x.dtype)


def _impl(x, scale, bias, num_groups, eps, use_gelu):
    tile = _supported(x)
    if tile is None:
        return reference_group_norm(x, scale, bias, num_groups, eps, use_gelu)
    return _fused_forward(x, scale, bias, num_groups, eps, use_gelu, tile)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_group_norm(x, scale, bias, num_groups, eps, use_gelu):
    """GroupNorm(+GELU) over [N, T, C]; Pallas on TPU, XLA elsewhere."""
    return _impl(x, scale, bias, num_groups, eps, use_gelu)


def _fgn_fwd(x, scale, bias, num_groups, eps, use_gelu):
    out = _impl(x, scale, bias, num_groups, eps, use_gelu)
    return out, (x, scale, bias)


def _fgn_bwd(num_groups, eps, use_gelu, residuals, g):
    x, scale, bias = residuals
    _, vjp = jax.vjp(
        lambda xx, ss, bb: reference_group_norm(
            xx, ss, bb, num_groups, eps, use_gelu
        ),
        x, scale, bias,
    )
    return vjp(g)


fused_group_norm.defvjp(_fgn_fwd, _fgn_bwd)
