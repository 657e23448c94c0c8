"""int8-stored activations for the bandwidth-bound serving path.

PERF.md's sampling ledger concludes that the UNet forward is pinned at
~2x the HBM roofline by GroupNorm re-reads of [N, T, C] full-resolution
activations, and that only a numerics change can cut those bytes further
(every scheduling-level attempt measurably lost to XLA's own fusions).
The rent check (scripts/bench_int8_rent.py, queue step 57) measured the
core GN -> GELU -> conv chain at [16, 64000, 64] on the v5e chip:
int8-stored activations run **1.42x faster** than bf16-stored ones, with
0.988 correlation after 8 chained ops.

This module is the model-level realisation: activations that cross XLA
fusion boundaries at the full-resolution UNet levels are materialised as
int8 (1 B/elem instead of bf16's 2) with dynamic symmetric scales;
consumers dequantize in-register, and the convolutions execute as
int8 x int8 -> int32 on the MXU. Weights stay float32/bf16 in the
checkpoint — they are quantized per-output-channel at trace time, which
XLA hoists out of the sampling scan (loop-invariant).

Quality is gated by the 10k-sample Frechet protocol (PERF.md round 4),
not by local error bounds: the knob is serving-only and off by default.

Scale-shape convention: ``QAct.scale`` is float32 with shape () for a
per-tensor scale or (C,) for per-channel-block scales (produced only by
``concat`` of per-tensor-scaled halves). Shapes are static, so code can
branch on ``scale.ndim`` at trace time. Per-channel input scales do not
factor out of a convolution's channel contraction, so ``conv1d_int8``
folds them into the weight before quantizing it (dynamic fold — only hit
by skip projections reading concatenated skips; everything else keeps
static weight quantization that XLA hoists out of the sampler scan).

No reference counterpart: the reference serves f32 end-to-end
(/root/reference/vq_voice_swap/diffusion.py:106-131).
"""

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = [
    "QAct",
    "quantize",
    "dequantize",
    "qact_concat",
    "qact_avg_pool",
    "qact_upsample",
    "qact_group_norm",
    "conv1d_int8",
]

Dtype = Any

# Symmetric int8 range; +-127 keeps the grid symmetric (no -128).
_QMAX = 127.0
# Guards zero-range tensors (e.g. the zero-init conv_out at fresh init).
_EPS = 1e-12


class QAct(NamedTuple):
    """An int8-stored activation: ``value = q * scale`` (broadcast on C)."""

    q: jnp.ndarray  # int8 [..., C]
    scale: jnp.ndarray  # f32 () per-tensor, or (C,) per-channel-block


def quantize(x: jnp.ndarray) -> QAct:
    """Symmetric per-tensor dynamic quantization to int8.

    The amax reduce reads the producer's output before the quantized
    write; the rent check's measured 1.42x already pays for this second
    pass (XLA rematerialises cheap elementwise producers into the
    quantizing fusion rather than spilling the f32 intermediate).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf)), _EPS)
    scale = amax / _QMAX
    q = jnp.clip(jnp.round(xf / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return QAct(q, scale)


def dequantize(qa: QAct, dtype: Optional[Dtype] = None) -> jnp.ndarray:
    """Back to real values; f32 by default (GN statistics run in f32)."""
    out = qa.q.astype(jnp.float32) * qa.scale
    return out.astype(dtype) if dtype is not None else out


def qact_concat(a: QAct, b: QAct) -> QAct:
    """Channel-axis concat; scales widen to per-channel vectors so each
    half keeps its own quantization grid (consumers broadcast on C)."""
    ca, cb = a.q.shape[-1], b.q.shape[-1]
    sa = jnp.broadcast_to(a.scale, (ca,)) if a.scale.ndim == 0 else a.scale
    sb = jnp.broadcast_to(b.scale, (cb,)) if b.scale.ndim == 0 else b.scale
    return QAct(
        jnp.concatenate([a.q, b.q], axis=-1),
        jnp.concatenate([sa, sb], axis=0),
    )


def qact_avg_pool(qa: QAct, factor: int) -> QAct:
    """Non-overlapping average pool over T of [N, T, C], staying int8.

    Averaging never leaves the quantization range, so the scale is
    unchanged; the re-round costs at most half an LSB.
    """
    n, t, c = qa.q.shape
    assert t % factor == 0, f"length {t} not divisible by {factor}"
    pooled = jnp.mean(
        jnp.reshape(qa.q.astype(jnp.float32), (n, t // factor, factor, c)),
        axis=2,
    )
    return QAct(jnp.round(pooled).astype(jnp.int8), qa.scale)


def qact_upsample(qa: QAct, factor: int) -> QAct:
    """Nearest-neighbor upsample over T — a pure gather, exact in int8."""
    return QAct(jnp.repeat(qa.q, factor, axis=1), qa.scale)


def qact_group_norm(
    qa: QAct,
    scale_param: jnp.ndarray,
    bias_param: jnp.ndarray,
    groups: int,
    epsilon: float,
    use_gelu: bool,
    dtype: Optional[Dtype] = None,
) -> jnp.ndarray:
    """GroupNorm over [N, T, C] reading the int8 payload (1 B/elem).

    Dequantization happens in-register inside the stats and normalize
    fusions; statistics run in float32, matching flax nn.GroupNorm
    (contiguous channel groups, stats over T and the in-group channels).
    """
    n, t, c = qa.q.shape
    xf = dequantize(qa)  # f32, in-register for both passes
    xg = xf.reshape(n, t, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(xg), axis=(1, 3), keepdims=True)
        - jnp.square(mean),
        0.0,
    )
    normed = ((xg - mean) * jax.lax.rsqrt(var + epsilon)).reshape(n, t, c)
    out = normed * scale_param + bias_param
    if use_gelu:
        out = jax.nn.gelu(out, approximate=False)
    return out.astype(dtype) if dtype is not None else out


def conv1d_int8(
    qa: QAct,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    *,
    stride: int = 1,
    dilation: int = 1,
    dtype: Optional[Dtype] = None,
) -> jnp.ndarray:
    """1-D convolution of an int8 activation with float weights.

    The weight is quantized per-output-channel to int8 at trace time and
    the contraction runs int8 x int8 -> int32 on the MXU; the epilogue
    applies ``act_scale * weight_scale`` and the bias, producing a plain
    tensor (conv outputs feed a single GroupNorm consumer, where staying
    bf16 is byte-cheaper than a re-quantization pass — see the PERF.md
    round-4 int8 section for the per-link accounting).

    Per-tensor activation scales keep the weight quantization static
    (XLA hoists it out of the sampling scan). Per-channel scales — from
    concatenated skips — are folded into the weight first:
    ``sum_kc W[k,c,o] q[t+k,c] s[c] == conv(q, W * s[c])``.
    """
    kf = kernel.astype(jnp.float32)
    act_scale = qa.scale
    if act_scale.ndim:  # (C,): fold into the contraction weights
        kf = kf * act_scale[None, :, None]
        act_scale = None

    w_amax = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1)), _EPS)  # (Cout,)
    w_scale = w_amax / _QMAX
    kq = jnp.clip(jnp.round(kf / w_scale), -_QMAX, _QMAX).astype(jnp.int8)

    pad = (kernel.shape[0] - 1) * dilation // 2
    acc = jax.lax.conv_general_dilated(
        qa.q,
        kq,
        window_strides=(stride,),
        padding=[(pad, pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * w_scale
    if act_scale is not None:
        out = out * act_scale
    if bias is not None:
        out = out + bias
    return out.astype(dtype) if dtype is not None else out
