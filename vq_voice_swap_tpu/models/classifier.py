"""Diffusion-timestep-conditioned audio classifier.

Capability parity with /root/reference/vq_voice_swap/models/classifier.py:
18-191: a UNet-down-style ResBlock stack conditioned on t, an attention pool
(zero token prepended, QKV 1x1 projection, output read at position 0), and a
zero-init linear head. Used for classifier guidance during sampling and as
the feature extractor for Class/Frechet scores.
"""

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import Conv1d, GroupNorm, ResBlock, TimeEmbedding, gelu

__all__ = ["Classifier", "ClassifierStem", "AttentionPool1d"]

Dtype = Any


class AttentionPool1d(nn.Module):
    """Attention pooling over [N, T, C]: prepend a zero token, attend, and
    return position 0 (reference classifier.py:133-191)."""

    head_channels: int = 64
    out_channels: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, t, c = x.shape
        assert c % self.head_channels == 0
        heads = c // self.head_channels

        x = jnp.concatenate([jnp.zeros_like(x[:, :1]), x], axis=1)  # [N, T+1, C]
        qkv = Conv1d(3 * c, 1, dtype=self.dtype, name="qkv_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(u):  # [N, T+1, C] -> [N, heads, T+1, hc]
            return jnp.transpose(
                jnp.reshape(u, (n, t + 1, heads, self.head_channels)), (0, 2, 1, 3)
            )

        q, k, v = map(split_heads, (q, k, v))
        scale = 1.0 / math.sqrt(math.sqrt(self.head_channels))
        logits = jnp.einsum(
            "nhqc,nhkc->nhqk", q * scale, k * scale,
            preferred_element_type=jnp.float32,
        )
        weights = nn.softmax(logits, axis=-1)
        out = jnp.einsum("nhqk,nhkc->nhqc", weights.astype(v.dtype), v)
        out = jnp.reshape(jnp.transpose(out, (0, 2, 1, 3)), (n, t + 1, c))
        out = Conv1d(self.out_channels or c, 1, dtype=self.dtype, name="c_proj")(out)
        return out[:, 0]  # [N, out_channels]


class ClassifierStem(nn.Module):
    """[N, T, 1] + ts -> [N, out_channels] feature vectors
    (reference classifier.py:48-130)."""

    base_channels: int = 32
    channel_mult: Tuple[int, ...] = (1, 1, 2, 2, 2, 4, 4, 8, 8)
    output_mult: int = 16
    depth_mult: int = 2
    dtype: Optional[Dtype] = None

    @property
    def out_channels(self) -> int:
        return self.base_channels * self.output_mult

    @nn.compact
    def __call__(self, x: jnp.ndarray, ts: jnp.ndarray) -> jnp.ndarray:
        ch = self.base_channels
        embed_dim = ch * 4
        emb = TimeEmbedding(embed_dim, dtype=self.dtype, name="time_embed")(ts)
        emb = nn.Dense(embed_dim, dtype=self.dtype, name="time_embed_extra")(
            gelu(emb)
        )

        if self.dtype is not None:
            x = x.astype(self.dtype)
        h = Conv1d(ch, 3, dtype=self.dtype, name="in_conv")(x)
        bi = 0
        for mult in self.channel_mult:
            for _ in range(self.depth_mult):
                h = ResBlock(
                    out_channels=mult * ch,
                    use_emb=True,
                    dtype=self.dtype,
                    name=f"block_{bi}",
                )(h, emb)
                bi += 1
            h = ResBlock(
                use_emb=True, scale_factor=0.5, dtype=self.dtype, name=f"block_{bi}"
            )(h, emb)
            bi += 1

        h = GroupNorm(dtype=self.dtype, use_gelu=True, name="out_norm")(h)
        h = AttentionPool1d(
            head_channels=min(h.shape[-1], 64),
            out_channels=self.out_channels,
            dtype=self.dtype,
            name="pool",
        )(h)
        return h.astype(jnp.float32)


class Classifier(nn.Module):
    """Stem + zero-init linear head (reference classifier.py:18-45)."""

    num_labels: int
    base_channels: int = 32
    channel_mult: Tuple[int, ...] = (1, 1, 2, 2, 2, 4, 4, 8, 8)
    output_mult: int = 16
    depth_mult: int = 2
    dtype: Optional[Dtype] = None

    def setup(self):
        self.stem = ClassifierStem(
            base_channels=self.base_channels,
            channel_mult=self.channel_mult,
            output_mult=self.output_mult,
            depth_mult=self.depth_mult,
            dtype=self.dtype,
        )
        self.out = nn.Dense(
            self.num_labels,
            kernel_init=nn.initializers.zeros_init(),
            name="head",
        )

    def __call__(self, x: jnp.ndarray, ts: jnp.ndarray) -> jnp.ndarray:
        return self.head_from_features(self.stem(x, ts))

    def features(self, x: jnp.ndarray, ts: jnp.ndarray) -> jnp.ndarray:
        """Stem feature vectors (used by the stat/eval pipeline)."""
        return self.stem(x, ts)

    def head_from_features(self, features: jnp.ndarray) -> jnp.ndarray:
        return self.out(gelu(features))
