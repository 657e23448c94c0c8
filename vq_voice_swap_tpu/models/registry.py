"""Name-based model factories.

Capability parity with /root/reference/vq_voice_swap/models/make.py:9-83:
predictors "wavegrad" | "unet"; encoders "wavegrad" | "unet" | "unet128" |
"unet128-dilated" | "conv-mfcc-ulaw" | "conv-mfcc-ulaw-v2" | "conv-mfcc-linear".
"""

from typing import Any, Optional, Union

import flax.linen as nn

from .mfcc_encoder import ConvMFCCEncoder
from .unet import UNetEncoder, UNetPredictor
from .wavegrad import WaveGradEncoder, WaveGradPredictor

__all__ = ["make_predictor", "make_encoder"]


def make_predictor(
    pred_name: str,
    base_channels: int = 32,
    num_labels: Optional[int] = None,
    cond_channels: Optional[int] = None,
    dropout: float = 0.0,
    dtype: Optional[Any] = None,
    remat: Union[bool, str] = False,
    act_int8_min_t: int = 0,
) -> nn.Module:
    """Create an epsilon-predictor module from a human-readable name."""
    if pred_name == "wavegrad":
        assert not dropout, "dropout not supported for wavegrad"
        assert not act_int8_min_t, (
            "int8 activation storage is implemented for the unet "
            "predictor only"
        )
        if cond_channels:
            # Fail fast: silently flooring would build a predictor whose
            # cond convolution expects FEWER channels than the caller's
            # encoder produces, crashing only at first real decode.
            assert cond_channels % base_channels == 0, (
                f"wavegrad cond_channels ({cond_channels}) must be a "
                f"multiple of base_channels ({base_channels})"
            )
        cond_mult = cond_channels // base_channels if cond_channels else 16
        return WaveGradPredictor(
            base_channels=base_channels,
            cond_mult=cond_mult,
            num_labels=num_labels,
            dtype=dtype,
        )
    elif pred_name == "unet":
        return UNetPredictor(
            base_channels=base_channels,
            cond_channels=cond_channels,
            num_labels=num_labels,
            dropout=dropout,
            dtype=dtype,
            remat=remat,
            act_int8_min_t=act_int8_min_t,
        )
    raise ValueError(f"unknown predictor: {pred_name}")


def make_encoder(
    enc_name: str,
    base_channels: int = 32,
    cond_mult: int = 16,
    dtype: Optional[Any] = None,
    remat: Union[bool, str] = False,
    act_int8_min_t: int = 0,
) -> nn.Module:
    """Create an encoder module from a human-readable name."""
    out_channels = base_channels * cond_mult
    assert not (act_int8_min_t and not enc_name.startswith("unet")), (
        "int8 activation storage is implemented for the unet encoders only"
    )
    if enc_name == "wavegrad":
        return WaveGradEncoder(
            base_channels=base_channels, cond_mult=cond_mult, dtype=dtype
        )
    elif enc_name == "unet":
        return UNetEncoder(
            base_channels=base_channels, out_channels=out_channels,
            dtype=dtype, remat=remat, act_int8_min_t=act_int8_min_t,
        )
    elif enc_name == "unet128":
        return UNetEncoder(
            base_channels=base_channels,
            channel_mult=(1, 1, 2, 2, 2, 4, 4, 8),
            out_channels=out_channels,
            dtype=dtype,
            remat=remat,
            act_int8_min_t=act_int8_min_t,
        )
    elif enc_name == "unet128-dilated":
        return UNetEncoder(
            base_channels=base_channels,
            channel_mult=(1, 1, 2, 2, 2, 4, 4, 8),
            out_dilations=(4, 8, 16, 32),
            out_channels=out_channels,
            dtype=dtype,
            remat=remat,
            act_int8_min_t=act_int8_min_t,
        )
    elif enc_name == "conv-mfcc-ulaw":
        return ConvMFCCEncoder(
            base_channels=base_channels, out_channels=out_channels, dtype=dtype
        )
    elif enc_name == "conv-mfcc-ulaw-v2":
        return ConvMFCCEncoder(
            base_channels=base_channels, out_channels=out_channels,
            version=2, dtype=dtype,
        )
    elif enc_name == "conv-mfcc-linear":
        return ConvMFCCEncoder(
            base_channels=base_channels, out_channels=out_channels,
            input_ulaw=False, dtype=dtype,
        )
    raise ValueError(f"unknown encoder: {enc_name}")
