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
axis (parallel/tensor.py) and FSDP-sharding a *different* axis. Leaves
with no divisible axis, scalars, and the VQ dictionary (whole code vectors
must stay together for nearest-neighbour assignment and the shard_map
Pallas kernel, ops/vq_pallas.py) replicate. GSPMD computes the same
function for any annotation, so the heuristic affects performance only —
exactness vs single-device is pinned in tests/test_fsdp.py.
"""

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS
from .tensor import MODEL_AXIS, _leaf_name

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
    has_model_axis = MODEL_AXIS in mesh.axis_names

    def spec(path, leaf):
        if leaf.ndim == 0:
            return NamedSharding(mesh, P())
        dims = [None] * leaf.ndim
        name_excluded = "dictionary" in _leaf_name(path)
        if (
            has_model_axis
            and tp > 1
            and not name_excluded
            and leaf.shape[-1] % tp == 0
        ):
            dims[-1] = MODEL_AXIS
        if not name_excluded:
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
    replicate.

    The Adam mu/nu trees mirror the param tree and get the SAME sharding
    as their parameter via optax.tree_map_params — the optimizer-state
    memory (2/3 of Adam training state) is exactly what ZeRO exists to
    shard.
    """
    import optax

    replicated = NamedSharding(mesh, P())
    pshard = fsdp_shardings(mesh, state.params)
    put = jax.device_put

    opt_state = optax.tree_map_params(
        tx,
        lambda s, sh: put(s, sh),
        state.opt_state,
        pshard,
        transform_non_params=lambda s: put(s, replicated),
    )
    return type(state)(
        step=put(state.step, replicated),
        params=jax.tree.map(put, state.params, pshard),
        buffers=jax.tree.map(lambda x: put(x, replicated), state.buffers),
        opt_state=opt_state,
        emas={
            rate: jax.tree.map(put, tree, pshard)
            for rate, tree in state.emas.items()
        },
    )
