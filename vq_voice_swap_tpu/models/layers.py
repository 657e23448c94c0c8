"""Shared neural building blocks for the 1-D audio model zoo.

All modules use channel-last [N, T, C] layout: the channel axis maps onto TPU
vector lanes and conv/matmul contractions hit the MXU without layout
transposes (the reference uses torch-style [N, C, T]).

Capability parity sources (cited per block):
  - TimeEmbedding: /root/reference/vq_voice_swap/models/wavegrad.py:352-373
  - ResBlock / Resize / normalization / scale_module:
    /root/reference/vq_voice_swap/models/unet.py:248-356
"""

import math
from typing import Any, Callable, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..ops.qact import (
    QAct,
    conv1d_int8,
    dequantize,
    qact_avg_pool,
    qact_group_norm,
    qact_upsample,
    quantize,
)

__all__ = [
    "TimeEmbedding",
    "ResBlock",
    "Conv1d",
    "adaptive_group_count",
    "GroupNorm",
    "scaled_init",
    "gelu",
    "avg_pool_1d",
    "nearest_upsample_1d",
    "nearest_resize_1d",
]

Dtype = Any


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf-based) GELU, matching torch nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)


def scaled_init(base: Callable, scale: float) -> Callable:
    """Wrap an initializer, multiplying its output by ``scale``.

    Used for zero-init output convs (scale=0) and 0.1-scaled conditioning
    layers (reference unet.py:277, 352-356).
    """
    if scale == 0.0:
        return nn.initializers.zeros_init()

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * scale

    return init


def adaptive_group_count(ch: int, max_groups: int = 32) -> int:
    """Largest power-of-two group count <= max_groups dividing ch."""
    g = max_groups
    while ch % g:
        g //= 2
    return g


class Conv1d(nn.Module):
    """1-D convolution over [N, T, C] with 'SAME'-style explicit padding.

    kernel layout (K, C_in, C_out); lowers to lax.conv_general_dilated which
    XLA maps onto the MXU for large channel counts.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Union[jnp.ndarray, QAct]) -> jnp.ndarray:
        if isinstance(x, QAct):
            # int8-stored serving path (ops/qact.py): same param tree as
            # the nn.Conv branch — _ConvParams mirrors its names/shapes —
            # so trained checkpoints serve through either branch.
            kernel, bias = _ConvParams(
                kernel_shape=(self.kernel_size, x.q.shape[-1], self.features),
                features=self.features,
                use_bias=self.use_bias,
                kernel_init=self.kernel_init,
                bias_init=self.bias_init,
                name="conv",
            )()
            return conv1d_int8(
                x, kernel, bias,
                stride=self.stride, dilation=self.dilation, dtype=self.dtype,
            )
        pad = (self.kernel_size - 1) * self.dilation // 2
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            padding=[(pad, pad)],
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            dtype=self.dtype,
            name="conv",
        )(x)


class _ConvParams(nn.Module):
    """Owns a convolution's kernel/bias with nn.Conv-compatible paths, for
    execution paths that bypass nn.Conv (the int8 serving branch)."""

    kernel_shape: Tuple[int, int, int]  # (K, C_in, C_out)
    features: int
    use_bias: bool
    kernel_init: Callable
    bias_init: Callable

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init, self.kernel_shape)
        bias = (
            self.param("bias", self.bias_init, (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


class _NormParams(nn.Module):
    """Owns GroupNorm's scale/bias with nn.GroupNorm-compatible paths."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones_init(), (self.features,)
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,)
        )
        return scale, bias


class GroupNorm(nn.Module):
    """GroupNorm over the channel axis of [N, T, C], adaptive group count,
    optionally fused with an exact GELU.

    Mirrors the reference's `normalization()` helper (unet.py:345-349): 32
    groups, halved until it divides the channel count. Statistics in float32.
    On single-chip TPU the stats + normalize run as fused Pallas kernels
    (ops/fused_norm.py) — XLA's reduction lowering for this shape is the
    dominant cost of the UNet forward otherwise.
    """

    max_groups: int = 32
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None
    use_gelu: bool = False

    @nn.compact
    def __call__(self, x: Union[jnp.ndarray, QAct]) -> jnp.ndarray:
        from ..ops.fused_norm import (
            fused_norm_enabled,
            fused_group_norm,
            matmul_norm_enabled,
            matmul_group_norm,
        )

        if isinstance(x, QAct):
            # int8-stored serving path: stats + normalize read the int8
            # payload (1 B/elem) and dequantize in-register (ops/qact.py).
            ch = x.q.shape[-1]
            groups = adaptive_group_count(ch, self.max_groups)
            scale, bias = _NormParams(ch, name="norm")()
            return qact_group_norm(
                x, scale, bias, groups, self.epsilon, self.use_gelu,
                self.dtype,
            )

        ch = x.shape[-1]
        groups = adaptive_group_count(ch, self.max_groups)
        if matmul_norm_enabled() and x.ndim == 3 and x.shape[1] >= 4096:
            # MXU-routed statistics; only worthwhile where the T-axis reduce
            # dominates (full-resolution levels).
            scale, bias = _NormParams(ch, name="norm")()
            out = matmul_group_norm(
                x, scale, bias, groups, self.epsilon, self.use_gelu
            )
            if self.dtype is not None:
                out = out.astype(self.dtype)
            return out
        if fused_norm_enabled():
            # Experimental Pallas stats kernel (see ops/fused_norm.py).
            scale, bias = _NormParams(ch, name="norm")()
            out = fused_group_norm(
                x, scale, bias, groups, self.epsilon, self.use_gelu
            )
            if self.dtype is not None:
                out = out.astype(self.dtype)
            return out
        out = nn.GroupNorm(
            num_groups=groups,
            epsilon=self.epsilon,
            dtype=self.dtype,
            name="norm",
        )(x)
        if self.use_gelu:
            out = gelu(out)
        return out


def sinusoidal_time_features(ts: jnp.ndarray, channels: int) -> jnp.ndarray:
    """[N] ts in [0, 1] -> [N, channels] cos/sin features with frequencies
    geometric in [0.1, 100] (reference wavegrad.py:352-373).

    Pure function so the sequence-parallel predictor (parallel/sequence.py)
    shares the EXACT numerics — these constants must never diverge between
    the flax module and the T-sharded reimplementation.
    """
    assert channels % 2 == 0, "time-embedding channels must be even"
    half = channels // 2
    min_coeff, max_coeff = 0.1, 100.0
    exponents = jnp.arange(half, dtype=jnp.float32) / (half - 1)
    freqs = max_coeff * jnp.exp(-math.log(max_coeff / min_coeff) * exponents)
    args = ts.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class TimeEmbedding(nn.Module):
    """Sinusoidal timestep embedding with frequencies geometric in
    [0.1, 100], followed by a linear projection.

    Capability parity: reference wavegrad.py:352-373. Input ts is [N] in
    [0, 1]; output is [N, channels].
    """

    channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, ts: jnp.ndarray) -> jnp.ndarray:
        emb = sinusoidal_time_features(ts, self.channels)
        if self.dtype is not None:
            emb = emb.astype(self.dtype)
        return nn.Dense(self.channels, dtype=self.dtype, name="proj")(emb)


def avg_pool_1d(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Non-overlapping average pooling over the T axis of [N, T, C]."""
    n, t, c = x.shape
    assert t % factor == 0, f"length {t} not divisible by pool factor {factor}"
    return jnp.mean(jnp.reshape(x, (n, t // factor, factor, c)), axis=2)


def nearest_upsample_1d(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Nearest-neighbor upsampling over the T axis of [N, T, C]."""
    return jnp.repeat(x, factor, axis=1)


def nearest_resize_1d(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Nearest-neighbor resize of [N, T, C] to [N, out_len, C].

    Index selection matches torch F.interpolate(mode="nearest"):
    src = floor(i * T / out_len).
    """
    t = x.shape[1]
    if t == out_len:
        return x
    idx = jnp.floor(jnp.arange(out_len) * (t / out_len)).astype(jnp.int32)
    return jnp.take(x, idx, axis=1)


class ResBlock(nn.Module):
    """The UNet residual block (reference unet.py:248-316).

    Structure: [GroupNorm, GELU, resize, conv3, GroupNorm] -> optional
    FiLM-ish scale/shift from an embedding (h * (a + 1) + b, with the
    embedding MLP 0.1-scaled at init) -> [GELU, dropout?, dilated conv3
    zero-init]; skip path resizes and 1x1-projects when channels change.

    scale_factor 1.0 = identity, 0.5 = avg-pool x2 down, 2.0 = nearest x2 up.

    ``act_int8_min_t`` > 0 enables int8 activation storage (ops/qact.py)
    for tensors whose T axis is at least that long: conv inputs are
    quantized, convs run int8 x int8 -> int32 on the MXU, and the block
    output is returned as a QAct for the next block / skip store. A
    serving-only knob — quality-gated by the 10k Frechet protocol.
    """

    out_channels: Optional[int] = None
    use_emb: bool = False
    scale_factor: float = 1.0
    dilation: int = 2
    dropout: float = 0.0
    dtype: Optional[Dtype] = None
    act_int8_min_t: int = 0

    def _resize(
        self, x: Union[jnp.ndarray, QAct]
    ) -> Union[jnp.ndarray, QAct]:
        if self.scale_factor == 1.0:
            return x
        if self.scale_factor < 1.0:
            factor = int(round(1.0 / self.scale_factor))
            assert abs(1.0 / factor - self.scale_factor) < 1e-5
            if isinstance(x, QAct):
                return qact_avg_pool(x, factor)
            return avg_pool_1d(x, factor)
        factor = int(round(self.scale_factor))
        assert abs(float(factor) - self.scale_factor) < 1e-5
        if isinstance(x, QAct):
            return qact_upsample(x, factor)
        return nearest_upsample_1d(x, factor)

    def _maybe_quantize(
        self, h: jnp.ndarray
    ) -> Union[jnp.ndarray, QAct]:
        if self.act_int8_min_t and h.shape[1] >= self.act_int8_min_t:
            return quantize(h)
        return h

    @nn.compact
    def __call__(
        self,
        x: Union[jnp.ndarray, QAct],
        emb: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Union[jnp.ndarray, QAct]:
        in_ch = (x.q if isinstance(x, QAct) else x).shape[-1]
        out_ch = self.out_channels or in_ch
        assert (emb is not None) == self.use_emb

        h = GroupNorm(dtype=self.dtype, use_gelu=True, name="norm_in")(x)
        h = self._resize(h)
        h = Conv1d(out_ch, 3, dtype=self.dtype, name="conv_in")(
            self._maybe_quantize(h)
        )
        # Tag for the "convs" remat policy (unet.py): save this conv output
        # across the fwd/bwd boundary and recompute the cheap
        # norm/GELU/FiLM chains from it. Identity outside a policy remat.
        h = checkpoint_name(h, "rb_conv_in")
        h = GroupNorm(dtype=self.dtype, name="norm_mid")(h)

        if self.use_emb:
            cond = gelu(emb)
            cond_ab = nn.Dense(
                out_ch * 2,
                kernel_init=scaled_init(nn.initializers.lecun_normal(), 0.1),
                bias_init=scaled_init(nn.initializers.zeros_init(), 0.1),
                dtype=self.dtype,
                name="cond_proj",
            )(cond)
            cond_a, cond_b = jnp.split(cond_ab[:, None, :], 2, axis=-1)
            h = h * (cond_a + 1.0) + cond_b

        h = gelu(h)
        if self.dropout > 0.0:
            h = nn.Dropout(rate=self.dropout, deterministic=not train)(h)
        h = Conv1d(
            out_ch,
            3,
            dilation=self.dilation,
            kernel_init=scaled_init(nn.initializers.lecun_normal(), 0.0),
            dtype=self.dtype,
            name="conv_out",
        )(self._maybe_quantize(h))

        skip = self._resize(x)
        if in_ch != out_ch:
            skip = Conv1d(out_ch, 1, dtype=self.dtype, name="skip_proj")(skip)
        if isinstance(skip, QAct):
            skip = dequantize(skip, h.dtype)
        out = skip + h
        return self._maybe_quantize(out)
