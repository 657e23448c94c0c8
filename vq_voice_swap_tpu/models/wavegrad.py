"""WaveGrad-style predictor/encoder (GAN-TTS lineage).

Capability parity with /root/reference/vq_voice_swap/models/wavegrad.py:16-389:
a DBlock downsampling stack (x64 total), UBlock upsampling stack driven by the
conditioning sequence with three FiLM layers per block (time + optional
zero-init label embedding + cond sequence -> (alpha, beta)), layer-norm over
channels, and a zero-init output conv.

Layout is channel-last [N, T, C]; the reference's NCT permute-LayerNorm-permute
(wavegrad.py:376-389) becomes a plain LayerNorm over the trailing axis.
"""

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from .layers import Conv1d, avg_pool_1d, gelu, nearest_upsample_1d, scaled_init

__all__ = ["WaveGradPredictor", "WaveGradEncoder"]

Dtype = Any


class FiLM(nn.Module):
    """Conditioning layer producing (alpha, beta) from timestep, optional
    label, and the conditioning sequence (reference wavegrad.py:280-336)."""

    out_channels: int
    num_labels: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        inputs: jnp.ndarray,
        cond: jnp.ndarray,
        ts: jnp.ndarray,
        labels: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        from .layers import TimeEmbedding

        hidden = self.out_channels * 2
        emb = TimeEmbedding(hidden, dtype=self.dtype, name="time_emb")(ts)
        assert (labels is None) == (self.num_labels is None)
        if labels is not None:
            # Zero-init label embeddings (random init hurts, per reference
            # wavegrad.py:306-308).
            emb = emb + nn.Embed(
                self.num_labels,
                hidden,
                embedding_init=nn.initializers.zeros_init(),
                dtype=self.dtype,
                name="label_emb",
            )(labels)
        c = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="cond_norm")(cond)
        c = Conv1d(hidden, 3, dtype=self.dtype, name="cond_conv")(c)
        emb = emb[:, None, :] + c
        ab = Conv1d(
            self.out_channels * 2,
            3,
            kernel_init=scaled_init(nn.initializers.lecun_normal(), 0.1),
            dtype=self.dtype,
            name="out_conv",
        )(gelu(emb))
        alpha, beta = jnp.split(ab, 2, axis=-1)
        return inputs * (1.0 + alpha) + beta


class UBlock(nn.Module):
    """Upsampling block with three FiLM stages (reference wavegrad.py:163-225)."""

    out_channels: int
    upsample_rate: int
    num_labels: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        h: jnp.ndarray,
        z: jnp.ndarray,
        ts: jnp.ndarray,
        labels: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        def film(name):
            return FiLM(
                self.out_channels,
                num_labels=self.num_labels,
                dtype=self.dtype,
                name=name,
            )

        res = nearest_upsample_1d(h, self.upsample_rate)
        res = Conv1d(self.out_channels, 3, dtype=self.dtype, name="res_conv")(res)

        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_1")(h)
        out = nearest_upsample_1d(gelu(out), self.upsample_rate)
        out = Conv1d(self.out_channels, 3, dtype=self.dtype, name="conv_1")(out)
        out = film("film_1")(out, z, ts, labels=labels)
        out = Conv1d(
            self.out_channels, 3, dilation=2, dtype=self.dtype, name="conv_2"
        )(gelu(out))
        out = out + res

        res = out
        out = film("film_2")(out, z, ts, labels=labels)
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_3")(out)
        out = Conv1d(
            self.out_channels, 3, dilation=4, dtype=self.dtype, name="conv_3"
        )(gelu(out))
        out = film("film_3")(out, z, ts, labels=labels)
        out = Conv1d(
            self.out_channels, 3, dilation=8, dtype=self.dtype, name="conv_4"
        )(gelu(out))
        out = Conv1d(
            self.out_channels, 3, dilation=16, dtype=self.dtype, name="conv_5"
        )(gelu(out))
        return out + res


class DBlock(nn.Module):
    """Downsampling block (reference wavegrad.py:232-277)."""

    out_channels: int
    downsample_rate: int
    extra_blocks: int = 0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        res = Conv1d(self.out_channels, 3, dtype=self.dtype, name="res_conv")(h)
        res = avg_pool_1d(res, self.downsample_rate)

        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_in")(h)
        out = avg_pool_1d(out, self.downsample_rate)
        out = Conv1d(self.out_channels, 3, dtype=self.dtype, name="conv_1")(
            gelu(out)
        )
        out = Conv1d(
            self.out_channels, 3, dilation=2, dtype=self.dtype, name="conv_2"
        )(gelu(out))
        out = out + res

        for i in range(self.extra_blocks):
            e = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"extra_norm_{i}")(out)
            e = Conv1d(
                self.out_channels, 3, dtype=self.dtype, name=f"extra_conv_{i}_a"
            )(gelu(e))
            e = Conv1d(
                self.out_channels,
                3,
                dilation=4,
                dtype=self.dtype,
                name=f"extra_conv_{i}_b",
            )(gelu(e))
            e = Conv1d(
                self.out_channels,
                3,
                dilation=8,
                dtype=self.dtype,
                name=f"extra_conv_{i}_c",
            )(gelu(e))
            out = out + e
        return out


class WaveGradPredictor(nn.Module):
    """Alternative epsilon predictor (reference wavegrad.py:16-129).

    Input length must divide 64. When unconditional, a zero conditioning
    sequence of length T/64 is synthesised (wavegrad.py:91-93).
    """

    base_channels: int = 32
    cond_mult: int = 16
    num_labels: Optional[int] = None
    dtype: Optional[Dtype] = None

    @property
    def cond_channels(self) -> int:
        return self.cond_mult * self.base_channels

    @property
    def downsample_rate(self) -> int:
        return 64

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        ts: jnp.ndarray,
        cond: Optional[jnp.ndarray] = None,
        labels: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        del train  # no dropout in this architecture
        assert x.shape[1] % 64 == 0, "input length must be divisible by 64"
        ch = self.base_channels
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if cond is None:
            cond = jnp.zeros(
                (x.shape[0], x.shape[1] // 64, self.cond_channels), dtype=x.dtype
            )
        elif self.dtype is not None:
            cond = cond.astype(self.dtype)

        d_outs = []
        h = Conv1d(ch, 5, dtype=self.dtype, name="d_in_conv")(x)
        d_outs.append(h)
        for i, (mult, rate) in enumerate([(4, 4), (4, 2), (8, 2), (16, 2)]):
            h = DBlock(ch * mult, rate, dtype=self.dtype, name=f"d_block_{i}")(h)
            d_outs.append(h)

        u = Conv1d(ch * 24, 3, dtype=self.dtype, name="u_in_conv")(cond)
        u_specs = [(16, 2), (16, 2), (8, 2), (4, 2), (4, 4)]
        for i, (mult, rate) in enumerate(u_specs):
            u = UBlock(
                out_channels=ch * mult,
                upsample_rate=rate,
                num_labels=self.num_labels,
                dtype=self.dtype,
                name=f"u_block_{i}",
            )(u, d_outs.pop(), ts, labels=labels)

        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="out_norm")(u)
        out = Conv1d(
            1,
            3,
            kernel_init=nn.initializers.zeros_init(),
            dtype=self.dtype,
            name="out_conv",
        )(out)
        return out.astype(jnp.float32)


class WaveGradEncoder(nn.Module):
    """Encoder-only WaveGrad downsampling stack (reference wavegrad.py:132-160)."""

    base_channels: int = 32
    cond_mult: int = 16
    dtype: Optional[Dtype] = None

    @property
    def cond_channels(self) -> int:
        return self.cond_mult * self.base_channels

    @property
    def downsample_rate(self) -> int:
        return 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        del train
        ch = self.base_channels
        if self.dtype is not None:
            x = x.astype(self.dtype)
        h = Conv1d(ch, 5, dtype=self.dtype, name="in_conv")(x)
        specs = [(ch * 4, 4), (ch * 4, 2), (ch * 8, 2), (ch * 16, 2),
                 (self.cond_channels, 2)]
        for i, (out_ch, rate) in enumerate(specs):
            h = DBlock(
                out_ch, rate, extra_blocks=1, dtype=self.dtype, name=f"d_block_{i}"
            )(h)
        return h.astype(jnp.float32)
