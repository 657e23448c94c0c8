"""Train state and optimizer construction.

The reference's training behavior (AdamW, parameter freezing with moment
zeroing, multi-EMA — train_loop.py:176-225) maps onto: an optax.multi_transform
that routes frozen parameter subtrees to set_to_zero (so they never update and
carry no moments), and EMA pytrees stored inside the jitted-updated state.
"""

from typing import Any, Callable, Dict, Optional, Sequence

import flax.struct
import jax.numpy as jnp
import optax
from flax import traverse_util

__all__ = ["TrainState", "build_optimizer", "freeze_label_tree",
           "prefix_predicate"]


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray  # scalar int32
    params: Any
    buffers: Any  # non-trainable state (e.g. VQ usage counts)
    opt_state: Any
    emas: Dict[str, Any]  # rate-string -> EMA params tree


def prefix_predicate(frozen_prefixes: Sequence[str]) -> Callable[[str], bool]:
    """Predicate: is a "/"-joined param path under any of these prefixes?"""

    def pred(path: str) -> bool:
        return any(
            path == p or path.startswith(p.rstrip("/") + "/")
            for p in frozen_prefixes
        )

    return pred


def freeze_label_tree(params: Any, frozen_fn: Callable[[str], bool]) -> Any:
    """Label each param leaf "frozen"/"train" by the path predicate."""
    flat = traverse_util.flatten_dict(params, sep="/")
    labels = {
        path: "frozen" if frozen_fn(path) else "train" for path in flat
    }
    return traverse_util.unflatten_dict(labels, sep="/")


def build_optimizer(
    params: Any,
    lr: float,
    weight_decay: float = 0.0,
    frozen_fn: Optional[Callable[[str], bool]] = None,
    lr_final: Optional[float] = None,
    lr_anneal_steps: Optional[int] = None,
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    """AdamW with torch-default betas/eps; frozen subtrees get set_to_zero
    (equivalently zeroed Adam moments, reference train_loop.py:200-225).

    lr_final + lr_anneal_steps enable a linear LR anneal lr -> lr_final
    over the first lr_anneal_steps optimizer steps (the released unet64
    model was LR-annealed; the reference has no schedule support and its
    recipe required manual restarts at lowered --lr)."""
    schedule: Any = lr
    if lr_final is not None:
        assert lr_anneal_steps, "need --lr-anneal-steps with --lr-final"
        schedule = optax.linear_schedule(
            init_value=lr, end_value=lr_final,
            transition_steps=lr_anneal_steps,
        )
    adamw = optax.adamw(
        learning_rate=schedule, b1=0.9, b2=0.999, eps=1e-8,
        weight_decay=weight_decay,
    )
    if grad_clip:
        # Clip BEFORE Adam so the clip threshold is in gradient units
        # (beyond-reference: standard production guard against loss spikes).
        adamw = optax.chain(optax.clip_by_global_norm(grad_clip), adamw)
    if frozen_fn is None:
        return adamw
    labels = freeze_label_tree(params, frozen_fn)
    return optax.multi_transform(
        {"train": adamw, "frozen": optax.set_to_zero()}, param_labels=labels
    )
