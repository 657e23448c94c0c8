"""Content-only conv encoder over MFCC features.

Capability parity with /root/reference/vq_voice_swap/models/conv_encoder.py:
14-133 (encoders of https://arxiv.org/abs/1901.08810): optional µ-law
inversion, MFCC + delta + delta-delta features (39 channels), a conv stack
with one stride-2 downsample, and a zero-init output conv so the encoder
initially contributes nothing downstream. Used by the released
"vqvae-unet-mfcc" speaker-conversion model.

The MFCC frontend is pure JAX (ops/mfcc.py), so the whole encoder compiles
into the training graph — no torchaudio host call.
"""

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.mfcc import MFCCConfig, mfcc
from .layers import Conv1d, gelu

__all__ = ["ConvMFCCEncoder", "deltas", "invert_ulaw"]

Dtype = Any


def deltas(seq: jnp.ndarray) -> jnp.ndarray:
    """Symmetric first difference over the T axis of [N, T, C] with edge
    replication (reference conv_encoder.py:123-129)."""
    right = jnp.concatenate([seq[:, :1], seq[:, :-1]], axis=1)
    left = jnp.concatenate([seq[:, 1:], seq[:, -1:]], axis=1)
    return (right - left) / 2.0


def invert_ulaw(x: jnp.ndarray, mu: float = 255.0) -> jnp.ndarray:
    return jnp.sign(x) * (1.0 / mu) * ((1.0 + mu) ** jnp.abs(x) - 1.0)


class ConvMFCCEncoder(nn.Module):
    """MFCC conv encoder; input [N, T, 1] -> [N, T1, out_channels].

    version 1: n_fft = 2 * input_rate / mfcc_rate, 40 mels, log-mels.
    version 2: n_fft = 400 * input_rate / 16000, 80 mels, dB scale,
               normalized spectrogram.
    downsample_rate = input_rate / (mfcc_rate / 2) (conv stack halves the
    mfcc_rate once).
    """

    base_channels: int
    out_channels: int = 64
    input_ulaw: bool = True
    input_rate: int = 16000
    mfcc_rate: int = 100
    version: int = 1
    dtype: Optional[Dtype] = None

    @property
    def downsample_rate(self) -> int:
        return self.input_rate // (self.mfcc_rate // 2)

    @property
    def mid_channels(self) -> int:
        return self.base_channels * 12

    def _mfcc_config(self) -> MFCCConfig:
        if self.version == 2:
            n_fft = round(400 * self.input_rate / 16000)
        else:
            n_fft = (self.input_rate // self.mfcc_rate) * 2
        return MFCCConfig(
            sample_rate=self.input_rate,
            n_mfcc=13,
            n_fft=n_fft,
            hop_length=self.input_rate // self.mfcc_rate,
            n_mels=40 if self.version == 1 else 80,
            log_mels=self.version == 1,
            normalized=self.version == 2,
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        del train
        assert self.mfcc_rate % 2 == 0, "must be able to downsample MFCCs once"
        assert self.input_rate % self.mfcc_rate == 0
        assert x.shape[-1] == 1, "input must have one channel"

        wav = x[..., 0]
        if self.input_ulaw:
            wav = invert_ulaw(wav)  # MFCC expects a linear waveform
        h = mfcc(wav, self._mfcc_config())
        d1 = deltas(h)
        d2 = deltas(d1)
        h = jnp.concatenate([h, d1, d2], axis=-1)  # [N, frames, 39]
        if self.dtype is not None:
            h = h.astype(self.dtype)

        mid = self.mid_channels
        h = gelu(Conv1d(mid, 3, dtype=self.dtype, name="conv_in")(h))
        h = h + gelu(Conv1d(mid, 3, dtype=self.dtype, name="res_0")(h))
        # One stride-2 downsample: kernel 4, stride 2, pad 1.
        h = nn.Conv(
            mid,
            kernel_size=(4,),
            strides=(2,),
            padding=[(1, 1)],
            dtype=self.dtype,
            name="down_conv",
        )(h)
        h = gelu(h)
        for i in range(2):
            h = h + gelu(Conv1d(mid, 3, dtype=self.dtype, name=f"res_3_{i}")(h))
        for i in range(4):
            h = h + gelu(Conv1d(mid, 1, dtype=self.dtype, name=f"res_1_{i}")(h))
        h = Conv1d(
            self.out_channels,
            1,
            kernel_init=nn.initializers.zeros_init(),
            dtype=self.dtype,
            name="out_conv",
        )(h)
        return h.astype(jnp.float32)
