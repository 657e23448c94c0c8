"""1-D UNet epsilon-predictor and encoder.

Capability parity with /root/reference/vq_voice_swap/models/unet.py:16-245
(itself adapted from openai/guided-diffusion): channel_mult pyramid with
depth_mult res blocks per level, avg-pool down / nearest-up resample blocks,
dilated middle blocks, sinusoidal time embedding + MLP, additive class
embedding, conditioning sequence projected and nearest-resized onto the input
resolution, and skip-concat bookkeeping.

TPU-first: channel-last [N, T, C] activations, static topology unrolled at
trace time, optional per-block rematerialisation (jax.checkpoint) instead of
torch.utils.checkpoint, and an optional bfloat16 compute dtype with float32
params.
"""

import functools
from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.qact import QAct, qact_concat, quantize
from .layers import (
    Conv1d,
    GroupNorm,
    ResBlock,
    TimeEmbedding,
    gelu,
    nearest_resize_1d,
)

__all__ = ["UNetPredictor", "UNetEncoder"]

Dtype = Any


def _remat_block(remat: Union[bool, str]):
    """Resolve the ``remat`` knob to a (possibly rematted) ResBlock class.

    - falsy: plain ResBlock (jax AD saves every linearization residual —
      fastest when activations fit in HBM).
    - True / "full": per-block ``jax.checkpoint`` saving only block inputs;
      the whole block recomputes in the backward (minimum memory, pays the
      conv FLOPs twice — measured ~16% slower, PERF.md round-3).
    - "convs": save only the tagged conv outputs (``rb_conv_in`` in
      layers.py) plus block inputs; the backward recomputes just the
      norm/GELU/FiLM elementwise chains, never a conv. Cuts the saved-
      residual HBM traffic (the training bottleneck per the PERF.md
      train roofline: 42 FLOP/byte vs the chip's 240 balance point)
      at near-zero recompute cost.
    """
    if not remat:
        return ResBlock
    if remat not in (True, "full", "convs"):
        # Programmatic callers bypass the CLI's argparse choices; a typo
        # ("conv") must not silently degrade to full remat (~16% slower).
        raise ValueError(f"unknown remat policy {remat!r}; "
                         "expected True/'full' or 'convs'")
    policy = None
    if remat == "convs":
        policy = jax.checkpoint_policies.save_only_these_names("rb_conv_in")
    return nn.remat(ResBlock, static_argnums=(3,), policy=policy)


class UNetPredictor(nn.Module):
    """The flagship epsilon predictor (reference unet.py:16-184).

    Input x: [N, T, in_channels]; ts: [N] floats in [0, 1].
    cond (optional): [N, T1, cond_channels]; labels (optional): [N] ints.
    Output: [N, T, out_channels].
    """

    base_channels: int
    channel_mult: Tuple[int, ...] = (1, 1, 2, 2, 2, 4, 4, 8, 8)
    middle_dilations: Tuple[int, ...] = (4, 8, 16, 32)
    depth_mult: int = 2
    cond_channels: Optional[int] = None
    num_labels: Optional[int] = None
    in_channels: int = 1
    out_channels: int = 1
    dropout: float = 0.0
    dtype: Optional[Dtype] = None
    remat: Union[bool, str] = False  # False | True/"full" | "convs"
    # int8 activation storage at levels with T >= this (0 = off). A
    # serving-only numerics knob (ops/qact.py; rent-checked at 1.42x on
    # the full-res GN->GELU->conv chain, PERF.md round 4); incompatible
    # with train=True.
    act_int8_min_t: int = 0

    @property
    def downsample_rate(self) -> int:
        return 2 ** (len(self.channel_mult) - 1)

    def setup(self):
        ch = self.base_channels
        embed_dim = ch * 4
        self.time_embed = TimeEmbedding(embed_dim, dtype=self.dtype)
        self.time_embed_extra = nn.Dense(embed_dim, dtype=self.dtype)
        if self.num_labels is not None:
            self.class_embed = nn.Embed(
                self.num_labels, embed_dim, dtype=self.dtype
            )
        if self.cond_channels is not None:
            self.cond_proj = Conv1d(ch, 3, dtype=self.dtype)

        self.in_conv = Conv1d(ch, 3, dtype=self.dtype)

        block = functools.partial(
            _remat_block(self.remat), act_int8_min_t=self.act_int8_min_t
        )

        down = []
        cur = ch
        for depth, mult in enumerate(self.channel_mult):
            for _ in range(self.depth_mult):
                down.append(
                    block(
                        out_channels=mult * ch,
                        use_emb=True,
                        dropout=self.dropout,
                        dtype=self.dtype,
                    )
                )
                cur = mult * ch
            if depth != len(self.channel_mult) - 1:
                down.append(
                    block(
                        use_emb=True,
                        scale_factor=0.5,
                        dropout=self.dropout,
                        dtype=self.dtype,
                    )
                )
        self.down_blocks = down

        self.middle_blocks = [
            block(use_emb=True, dilation=d, dropout=self.dropout, dtype=self.dtype)
            for d in self.middle_dilations
        ]

        up = []
        for depth, mult in list(enumerate(self.channel_mult))[::-1]:
            for _ in range(self.depth_mult + 1):
                up.append(
                    block(
                        out_channels=mult * ch,
                        use_emb=True,
                        dropout=self.dropout,
                        dtype=self.dtype,
                    )
                )
            if depth:
                up.append(
                    block(
                        use_emb=True,
                        scale_factor=2.0,
                        dropout=self.dropout,
                        dtype=self.dtype,
                    )
                )
        self.up_blocks = up

        self.out_norm = GroupNorm(dtype=self.dtype, use_gelu=True)
        self.out_conv = Conv1d(self.out_channels, 3, dtype=self.dtype)

    def __call__(
        self,
        x: jnp.ndarray,
        ts: jnp.ndarray,
        cond: Optional[jnp.ndarray] = None,
        labels: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        assert (labels is None) == (
            self.num_labels is None
        ), "must provide labels iff model is class-conditional"
        assert (cond is None) == (
            self.cond_channels is None
        ), "must provide cond sequence iff model is conditional"
        assert not (self.act_int8_min_t and train), (
            "int8 activation storage is a serving-only knob"
        )

        if self.dtype is not None:
            x = x.astype(self.dtype)

        emb = self.time_embed_extra(gelu(self.time_embed(ts)))
        if labels is not None:
            emb = emb + self.class_embed(labels)

        h = self.in_conv(x)
        if cond is not None:
            c = self.cond_proj(cond.astype(h.dtype))
            h = h + nearest_resize_1d(c, h.shape[1])
        if self.act_int8_min_t and h.shape[1] >= self.act_int8_min_t:
            h = quantize(h)

        skips = [h]
        for b in self.down_blocks:
            h = b(h, emb, train)
            skips.append(h)
        for b in self.middle_blocks:
            h = b(h, emb, train)
        for i, b in enumerate(self.up_blocks):
            # Upsampling blocks (every depth_mult+2-th) take no skip concat.
            if i % (self.depth_mult + 2) != self.depth_mult + 1:
                s = skips.pop()
                if isinstance(h, QAct) or isinstance(s, QAct):
                    # The T threshold decides quantization, and concat
                    # partners always share T — both sides or neither.
                    assert isinstance(h, QAct) and isinstance(s, QAct)
                    h = qact_concat(h, s)
                else:
                    h = jnp.concatenate([h, s], axis=-1)
            h = b(h, emb, train)

        h = self.out_norm(h)
        h = self.out_conv(h)
        return h.astype(jnp.float32)


class UNetEncoder(nn.Module):
    """Down-only UNet stack used as a VQ-VAE encoder (reference
    unet.py:187-245), with optional trailing dilated blocks."""

    base_channels: int
    channel_mult: Tuple[int, ...] = (1, 1, 2, 2, 2, 4, 4, 8, 8)
    out_dilations: Tuple[int, ...] = ()
    depth_mult: int = 2
    in_channels: int = 1
    out_channels: int = 512
    dtype: Optional[Dtype] = None
    remat: Union[bool, str] = False  # False | True/"full" | "convs"
    act_int8_min_t: int = 0  # see UNetPredictor

    @property
    def downsample_rate(self) -> int:
        return 2 ** (len(self.channel_mult) - 1)

    def setup(self):
        ch = self.base_channels
        block = functools.partial(
            _remat_block(self.remat), act_int8_min_t=self.act_int8_min_t
        )

        self.in_conv = Conv1d(ch, 3, dtype=self.dtype)
        blocks = []
        for depth, mult in enumerate(self.channel_mult):
            for _ in range(self.depth_mult):
                blocks.append(block(out_channels=mult * ch, dtype=self.dtype))
            if depth != len(self.channel_mult) - 1:
                blocks.append(block(scale_factor=0.5, dtype=self.dtype))
        for d in self.out_dilations:
            blocks.append(block(dilation=d, dtype=self.dtype))
        self.blocks = blocks

        self.out_norm = GroupNorm(dtype=self.dtype, use_gelu=True)
        self.out_conv = Conv1d(self.out_channels, 3, dtype=self.dtype)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert not (self.act_int8_min_t and train), (
            "int8 activation storage is a serving-only knob"
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
        h = self.in_conv(x)
        if self.act_int8_min_t and h.shape[1] >= self.act_int8_min_t:
            h = quantize(h)
        for b in self.blocks:
            h = b(h, None, train)
        h = self.out_norm(h)
        h = self.out_conv(h)
        return h.astype(jnp.float32)
