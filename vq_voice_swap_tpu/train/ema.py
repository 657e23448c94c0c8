"""Exponential moving averages of parameter trees.

Capability parity with /root/reference/vq_voice_swap/ema.py:8-42: per-
parameter rates chosen by the longest matching name-prefix, update rule
``target += (1 - rate) * (source - target)``, and support for several
simultaneous EMAs (one per rate). In JAX the EMA is just another params
pytree updated inside the jitted train step — no model deep-copies.
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import traverse_util

__all__ = ["build_rate_tree", "ema_update", "lookup_longest_prefix"]


def lookup_longest_prefix(rates: Dict[str, float], name: str) -> float:
    """Rate whose dict key is the longest prefix of ``name``
    (reference ema.py:35-42)."""
    best = None
    for key in rates:
        if name.startswith(key) and (best is None or len(key) > len(best)):
            best = key
    if best is None:
        raise KeyError(f"no EMA rate prefix found for parameter: {name}")
    return rates[best]


def build_rate_tree(params: Any, rates: Dict[str, float]) -> Any:
    """A pytree of per-leaf EMA rates matching ``params``' structure.

    Keys in ``rates`` are "/"-joined path prefixes ("" matches everything).
    """
    flat = traverse_util.flatten_dict(params, sep="/")
    rate_flat = {
        name: jnp.asarray(lookup_longest_prefix(rates, name), jnp.float32)
        for name in flat
    }
    return traverse_util.unflatten_dict(rate_flat, sep="/")


def ema_update(ema_params: Any, params: Any, rate_tree: Any) -> Any:
    """target += (1 - rate) * (source - target), leafwise."""
    return jax.tree.map(
        lambda target, source, rate: target
        + (1.0 - rate) * (source.astype(target.dtype) - target),
        ema_params,
        params,
        rate_tree,
    )
