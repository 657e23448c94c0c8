"""High-level wrappers for the classifier and encoder-predictor models.

Capability parity: Classifier save/load + warm start from a diffusion
predictor's down path (/root/reference/vq_voice_swap/models/classifier.py:
18-130), and the EncoderPredictor guidance model
(/root/reference/vq_voice_swap/models/encoder_predictor.py:15-71).
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util

from .model_base import ModelBase, jit_init, register_model
from .models.classifier import Classifier
from .models.encoder_predictor import EncoderPredictor

__all__ = ["ClassifierModel", "EncoderPredictorModel"]


@register_model
class ClassifierModel(ModelBase):
    """Noised-audio speaker classifier wrapper."""

    def __init__(
        self,
        num_labels: int,
        base_channels: int = 32,
        channel_mult: Tuple[int, ...] = (1, 1, 2, 2, 2, 4, 4, 8, 8),
        output_mult: int = 16,
        depth_mult: int = 2,
        dtype: Optional[str] = None,
    ):
        self.num_labels = num_labels
        self.base_channels = base_channels
        self.channel_mult = tuple(channel_mult)
        self.output_mult = output_mult
        self.depth_mult = depth_mult
        self.dtype_name = dtype
        self.module = Classifier(
            num_labels=num_labels,
            base_channels=base_channels,
            channel_mult=self.channel_mult,
            output_mult=output_mult,
            depth_mult=depth_mult,
            dtype=jnp.dtype(dtype) if dtype else None,
        )

    def save_kwargs(self) -> Dict[str, Any]:
        return dict(
            num_labels=self.num_labels,
            base_channels=self.base_channels,
            channel_mult=list(self.channel_mult),
            output_mult=self.output_mult,
            depth_mult=self.depth_mult,
            dtype=self.dtype_name,
        )

    def init_variables(self, rng: jax.Array, seq_len: int = 0) -> Dict[str, Any]:
        seq_len = seq_len or 2 ** (len(self.channel_mult)) * 4
        x = jnp.zeros((1, seq_len, 1))
        ts = jnp.zeros((1,))
        v = jit_init(self.module, rng, x, ts)
        return {"params": v["params"]}

    def logits(self, variables, x, ts):
        return self.module.apply({"params": variables["params"]}, x, ts)

    def features(self, variables, x, ts):
        return self.module.apply(
            {"params": variables["params"]}, x, ts, method=self.module.features
        )

    def head_from_features(self, variables, features):
        return self.module.apply(
            {"params": variables["params"]}, features,
            method=self.module.head_from_features,
        )

    def load_from_predictor(
        self, variables: Dict[str, Any], predictor_params: Dict[str, Any]
    ) -> Tuple[Dict[str, Any], int]:
        """Warm-start stem weights from a UNet predictor's down path
        (reference classifier.py:123-130): in_conv, time embeddings, and the
        down blocks, index-aligned until the UNet's down path ends."""
        src = traverse_util.flatten_dict(predictor_params, sep="/")
        dst = traverse_util.flatten_dict(variables["params"], sep="/")

        # Build the path rewrite: predictor down_blocks_i -> stem block_i.
        renamed = {}
        for path, value in src.items():
            parts = path.split("/")
            if parts[0] in ("in_conv", "time_embed", "time_embed_extra"):
                renamed["stem/" + path] = value
            elif parts[0].startswith("down_blocks_"):
                idx = parts[0][len("down_blocks_"):]
                renamed["stem/" + "/".join([f"block_{idx}"] + parts[1:])] = value

        total = 0
        for path, value in renamed.items():
            if path not in dst:
                # Depth beyond the classifier's stem: the UNet down path
                # is longer than the stem, extra blocks are expected.
                continue
            if tuple(value.shape) != tuple(dst[path].shape):
                # Fail loud like the reference (classifier.py:123-130,
                # load_state_dict): silently skipping would warm-start
                # from (near) nothing on a config mismatch.
                raise ValueError(
                    f"predictor parameter {path} has shape {value.shape} "
                    f"but the classifier stem expects {dst[path].shape}; "
                    f"do the --base-channels/--channel-mult match the "
                    f"pretrained predictor?"
                )
            dst[path] = jnp.asarray(value)
            total += int(value.size)
        new_params = traverse_util.unflatten_dict(dst, sep="/")
        return {"params": new_params}, total


@register_model
class EncoderPredictorModel(ModelBase):
    """Guidance model predicting VQ codes from noised audio."""

    def __init__(
        self,
        base_channels: int,
        downsample_rate: int,
        num_latents: int,
        bottleneck_dim: int = 64,
        channel_mult: Tuple[int, ...] = (1, 1, 2, 2, 2, 4, 4, 8, 8),
        depth_mult: int = 2,
        dtype: Optional[str] = None,
    ):
        self.base_channels = base_channels
        self.downsample_rate = downsample_rate
        self.num_latents = num_latents
        self.bottleneck_dim = bottleneck_dim
        self.channel_mult = tuple(channel_mult)
        self.depth_mult = depth_mult
        self.dtype_name = dtype
        self.module = EncoderPredictor(
            base_channels=base_channels,
            downsample_rate=downsample_rate,
            num_latents=num_latents,
            bottleneck_dim=bottleneck_dim,
            channel_mult=self.channel_mult,
            depth_mult=depth_mult,
            dtype=jnp.dtype(dtype) if dtype else None,
        )

    def save_kwargs(self) -> Dict[str, Any]:
        return dict(
            base_channels=self.base_channels,
            downsample_rate=self.downsample_rate,
            num_latents=self.num_latents,
            bottleneck_dim=self.bottleneck_dim,
            channel_mult=list(self.channel_mult),
            depth_mult=self.depth_mult,
            dtype=self.dtype_name,
        )

    def init_variables(self, rng: jax.Array, seq_len: int = 0) -> Dict[str, Any]:
        # Must divide both the UNet rate and the latent rate.
        unet_rate = 2 ** (len(self.channel_mult) - 1)
        seq_len = seq_len or max(unet_rate, self.downsample_rate) * 4
        x = jnp.zeros((1, seq_len, 1))
        ts = jnp.zeros((1,))
        v = jit_init(self.module, rng, x, ts)
        return {"params": v["params"]}

    def logits(self, variables, x, ts):
        return self.module.apply({"params": variables["params"]}, x, ts)

    def losses(self, variables, x, ts, targets):
        return self.module.apply(
            {"params": variables["params"]}, x, ts, targets,
            method=self.module.losses,
        )
