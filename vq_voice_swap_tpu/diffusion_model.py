"""DiffusionModel: an epsilon-predictor bundled with its diffusion process.

Capability parity with /root/reference/vq_voice_swap/diffusion_model.py:9-58,
including checkpoint-time label-embedding surgery (add_labels) — which in JAX
is a pure params-tree transform rather than runtime module mutation.
"""

from typing import Any, Dict, List, Optional, Tuple, Union

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from .diffusion import Diffusion, make_schedule
from .model_base import ModelBase, jit_init, register_model
from .models import make_predictor


__all__ = ["DiffusionModel", "add_labels_to_params", "label_param_paths"]

# Param-tree leaf names that hold per-label embedding rows.
_LABEL_LEAF_SUFFIXES = (
    ("class_embed", "embedding"),  # UNetPredictor
    ("label_emb", "embedding"),  # WaveGrad FiLM layers
)


def label_param_paths(params: Dict[str, Any]) -> List[str]:
    """All "/"-joined paths of label-embedding leaves in a params tree
    (reference Predictor.label_parameters, base.py:30-36)."""
    flat = traverse_util.flatten_dict(params, sep="/")
    out = []
    for path in flat:
        parts = tuple(path.split("/"))
        if any(parts[-len(s):] == s for s in _LABEL_LEAF_SUFFIXES):
            out.append(path)
    return out


def add_labels_to_params(
    params: Dict[str, Any], n: int, end: bool = True, rng: Optional[jax.Array] = None
) -> Dict[str, Any]:
    """Grow every label-embedding table by n rows, preserving existing rows at
    the start (end=True) or end (end=False); new rows are standard-normal
    (reference unet.py:165-176, wavegrad.py:338-349).

    Default rng draws fresh host entropy (matching the reference's
    torch.randn): two successive surgeries must not hand distinct new
    speakers byte-identical embedding rows. Pass rng for reproducibility.
    """
    if rng is None:
        rng = jax.random.key(
            int.from_bytes(os.urandom(4), "little")
        )
    flat = traverse_util.flatten_dict(params, sep="/")
    targets = label_param_paths(params)
    if not targets:
        raise ValueError("model has no label embeddings to grow")
    for i, path in enumerate(targets):
        table = jnp.asarray(flat[path])
        new_rows = jax.random.normal(
            jax.random.fold_in(rng, i), (n, table.shape[-1]), dtype=table.dtype
        )
        if end:
            flat[path] = jnp.concatenate([table, new_rows], axis=0)
        else:
            flat[path] = jnp.concatenate([new_rows, table], axis=0)
    return traverse_util.unflatten_dict(flat, sep="/")


@register_model
class DiffusionModel(ModelBase):
    """Config wrapper owning the predictor module and diffusion process."""

    def __init__(
        self,
        pred_name: str,
        base_channels: int,
        schedule_name: str = "exp",
        num_labels: Optional[int] = None,
        cond_channels: Optional[int] = None,
        dropout: float = 0.0,
        dtype: Optional[str] = None,
        remat: Union[bool, str] = False,
        act_int8_min_t: int = 0,
    ):
        self.pred_name = pred_name
        self.base_channels = base_channels
        self.schedule_name = schedule_name
        self.num_labels = num_labels
        self.cond_channels = cond_channels
        self.dropout = dropout
        self.dtype_name = dtype
        self.remat = remat
        self.act_int8_min_t = act_int8_min_t
        compute_dtype = jnp.dtype(dtype) if dtype else None

        self.predictor = make_predictor(
            pred_name,
            base_channels=base_channels,
            cond_channels=cond_channels,
            num_labels=num_labels,
            dropout=dropout,
            dtype=compute_dtype,
            remat=remat,
            act_int8_min_t=act_int8_min_t,
        )
        self.diffusion = Diffusion(make_schedule(schedule_name))

    # ------------------------------------------------------------- metadata

    def save_kwargs(self) -> Dict[str, Any]:
        return dict(
            pred_name=self.pred_name,
            base_channels=self.base_channels,
            schedule_name=self.schedule_name,
            num_labels=self.num_labels,
            cond_channels=self.cond_channels,
            dropout=self.dropout,
            dtype=self.dtype_name,
            remat=self.remat,
            act_int8_min_t=self.act_int8_min_t,
        )

    @property
    def downsample_rate(self) -> int:
        return self.predictor.downsample_rate

    # ----------------------------------------------------------------- init

    def _dummy_inputs(self, seq_len: int = 0):
        seq_len = seq_len or self.downsample_rate * 4
        x = jnp.zeros((1, seq_len, 1), dtype=jnp.float32)
        ts = jnp.zeros((1,), dtype=jnp.float32)
        cond = None
        if self.cond_channels is not None:
            cond = jnp.zeros(
                (1, seq_len // self.downsample_rate, self.cond_channels)
            )
        labels = (
            jnp.zeros((1,), dtype=jnp.int32) if self.num_labels is not None else None
        )
        return x, ts, cond, labels

    def init_variables(self, rng: jax.Array, seq_len: int = 0) -> Dict[str, Any]:
        x, ts, cond, labels = self._dummy_inputs(seq_len)
        v = jit_init(self.predictor, rng, x, ts, cond=cond, labels=labels)
        return {"params": {"predictor": v["params"]}}

    # -------------------------------------------------------------- compute

    def predict_eps(
        self,
        variables: Dict[str, Any],
        x: jnp.ndarray,
        ts: jnp.ndarray,
        cond: Optional[jnp.ndarray] = None,
        labels: Optional[jnp.ndarray] = None,
        train: bool = False,
        rngs: Optional[Dict[str, jax.Array]] = None,
    ) -> jnp.ndarray:
        # The measured-slower Pallas megakernel serving path
        # (VVS_FUSED_RESBLOCK) was retired to attic/ — see attic/README.md
        # and the PERF.md shootout: plain XLA fusion wins end-to-end.
        return self.predictor.apply(
            {"params": variables["params"]["predictor"]},
            x,
            ts,
            cond=cond,
            labels=labels,
            train=train,
            rngs=rngs,
        )

    def losses(
        self,
        variables: Dict[str, Any],
        rng: jax.Array,
        x: jnp.ndarray,
        labels: Optional[jnp.ndarray] = None,
        ts: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Per-element diffusion MSE; returns (losses, ts)."""
        loss_rng, drop_rng = jax.random.split(rng)
        if ts is None:
            t_key, loss_rng = jax.random.split(loss_rng)
            ts = jax.random.uniform(t_key, (x.shape[0],))
        losses = self.diffusion.ddpm_losses(
            x,
            lambda s, t: self.predict_eps(
                variables, s, t, labels=labels, train=train,
                rngs={"dropout": drop_rng} if train and self.dropout else None,
            ),
            rng=loss_rng,
            ts=ts,
        )
        return losses, ts

    # ------------------------------------------------------- label surgery

    def add_labels(
        self, variables: Dict[str, Any], n: int, end: bool = True
    ) -> Tuple["DiffusionModel", Dict[str, Any]]:
        assert self.num_labels is not None, "model must be class-conditional"
        kwargs = self.save_kwargs()
        kwargs["num_labels"] = self.num_labels + n
        new_model = type(self)(**kwargs)
        new_vars = dict(variables)
        new_vars["params"] = dict(variables["params"])
        new_vars["params"]["predictor"] = add_labels_to_params(
            variables["params"]["predictor"], n, end=end
        )
        return new_model, new_vars

    def label_parameter_paths(self, variables: Dict[str, Any]) -> List[str]:
        """Full variable paths (under "params/") of label embeddings."""
        rel = label_param_paths(variables["params"]["predictor"])
        return [f"predictor/{p}" for p in rel]
