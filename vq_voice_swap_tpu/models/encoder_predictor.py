"""Predict VQ codes from noised audio, for latent-consistency guidance.

Capability parity with /root/reference/vq_voice_swap/models/encoder_predictor.py:
15-71: a UNet with a bottleneck output, nearest-downsampled to T/downsample_rate,
then a 1x1 conv to per-position code logits; losses are per-position
cross-entropy averaged over positions.
"""

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Conv1d, nearest_resize_1d
from .unet import UNetPredictor

__all__ = ["EncoderPredictor", "encoder_predictor_losses"]

Dtype = Any


class EncoderPredictor(nn.Module):
    """[N, T, 1] + ts -> [N, T // downsample_rate, num_latents] logits."""

    base_channels: int
    downsample_rate: int
    num_latents: int
    bottleneck_dim: int = 64
    channel_mult: tuple = (1, 1, 2, 2, 2, 4, 4, 8, 8)
    depth_mult: int = 2
    dtype: Optional[Dtype] = None

    def setup(self):
        self.unet = UNetPredictor(
            base_channels=self.base_channels,
            channel_mult=tuple(self.channel_mult),
            depth_mult=self.depth_mult,
            out_channels=self.bottleneck_dim,
            dtype=self.dtype,
        )
        self.out = Conv1d(self.num_latents, 1, name="out_proj")

    def __call__(self, x: jnp.ndarray, ts: jnp.ndarray) -> jnp.ndarray:
        h = self.unet(x, ts)
        h = nearest_resize_1d(h, h.shape[1] // self.downsample_rate)
        return self.out(h)

    def losses(
        self, x: jnp.ndarray, ts: jnp.ndarray, targets: jnp.ndarray
    ) -> jnp.ndarray:
        """Per-batch-element mean cross-entropy. targets: [N, T1] ints."""
        logits = self(x, ts)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return jnp.mean(nll, axis=-1)
