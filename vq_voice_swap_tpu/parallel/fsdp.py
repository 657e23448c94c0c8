"""Fully-sharded data parallelism (ZeRO-3 style) via GSPMD annotations.

The reference is single-device (SURVEY.md §2); this is a beyond-reference
scaling capability, TPU-first: parameters, EMA shadows, and optimizer
moments are *stored* sharded across the ``data`` mesh axis, and XLA's
partitioner inserts the all-gathers at each use site and reduce-scatters
for the gradients — the scaling-book FSDP recipe (annotate the storage,
let the compiler schedule the collectives on ICI). Per-device memory for
model + optimizer state scales as 1/data-axis-size, which is what lets a
model whose Adam state exceeds one chip's HBM train at all.

Heuristic: each weight leaf is sharded along its LARGEST mesh-divisible
axis (largest minimizes the number of all-gather participants' padding and
keeps shards contiguous); composes with tensor parallelism on a 2-D
``data x model`` mesh by reserving the output-feature axis for the model
axis (the SHARED rule ``model_axis_shards_last_dim`` in parallel/tensor.py)
and FSDP-sharding a *different* axis. Leaves with no divisible axis,
scalars, and the VQ dictionary (whole code vectors must stay together for
nearest-neighbour assignment and the shard_map Pallas kernel,
ops/vq_pallas.py) replicate. GSPMD computes the same function for any
annotation, so the heuristic affects performance only — exactness vs
single-device is pinned in tests/test_fsdp.py.
"""

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS
from .tensor import (
    MODEL_AXIS,
    _leaf_name,
    model_axis_shards_last_dim,
    shard_state_by,
)

__all__ = [
    "fsdp_shardings",
    "shard_state_fsdp",
]


def fsdp_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding tree: largest divisible axis sharded over DATA_AXIS;
    when ``mesh`` also has a model axis, the output-feature (last) axis is
    sharded over MODEL_AXIS first (same rule as tp_shardings) and FSDP
    picks among the remaining axes."""
    dp = mesh.shape[DATA_AXIS]
    tp = mesh.shape.get(MODEL_AXIS, 1)

    def spec(path, leaf):
        if leaf.ndim == 0:
            return NamedSharding(mesh, P())
        dims = [None] * leaf.ndim
        if model_axis_shards_last_dim(path, leaf, tp):
            dims[-1] = MODEL_AXIS
        if "dictionary" not in _leaf_name(path):
            candidates = [
                i
                for i in range(leaf.ndim)
                if dims[i] is None and leaf.shape[i] % dp == 0
            ]
            if candidates:
                best = max(candidates, key=lambda i: leaf.shape[i])
                dims[best] = DATA_AXIS
        if all(d is None for d in dims):
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(*dims))

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_state_fsdp(mesh: Mesh, state, tx) -> Any:
    """Device-put a TrainState with params / EMAs / optimizer moments
    FSDP-sharded (and TP-sharded too on a 2-D mesh); buffers and step
    replicate. The Adam mu/nu memory — 2/3 of Adam training state, and
    exactly what ZeRO exists to shard — scales 1/dp."""
    return shard_state_by(
        mesh, state, tx, fsdp_shardings(mesh, state.params)
    )
