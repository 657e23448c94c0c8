"""Tensor (model) parallelism over a 2-D ``data x model`` mesh.

TPU-first scaling beyond data parallelism (the reference is single-device;
this is a beyond-reference capability): weight matrices are sharded on their
output-feature axis over the ``model`` mesh axis via GSPMD sharding
annotations, and XLA's partitioner inserts the all-gathers / reduce-scatters
on ICI — no hand-written collectives, per the scaling-book recipe (pick a
mesh, annotate, let XLA do the rest).

The annotation is a safe heuristic: any weight leaf whose last (output)
dimension divides the model-axis size is sharded there; everything else —
scalars, the VQ dictionary (the k-means assignment wants whole code vectors),
non-divisible leaves — replicates. GSPMD guarantees identical math for any
annotation, so the heuristic only affects performance, never correctness
(exactness vs single-device is tested in tests/test_tensor_parallel.py).
"""

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

__all__ = [
    "MODEL_AXIS",
    "create_mesh_2d",
    "model_axis_shards_last_dim",
    "shard_state_by",
    "shard_state_tp",
    "tp_shardings",
]

MODEL_AXIS = "model"


def create_mesh_2d(
    tensor_parallel: int,
    num_devices: Optional[int] = None,
    devices: Optional[list] = None,
) -> Mesh:
    """A (data, model) mesh: the trailing ``tensor_parallel`` devices of
    each row form one model-parallel group (adjacent device ids share ICI
    links on TPU slices, so the heavier TP collectives stay on the fastest
    edges)."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    n = len(devices)
    if n % tensor_parallel:
        raise ValueError(
            f"{n} devices not divisible by tensor_parallel={tensor_parallel}"
        )
    arr = np.asarray(devices).reshape(n // tensor_parallel, tensor_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _leaf_name(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def model_axis_shards_last_dim(path, leaf, tp: int) -> bool:
    """THE tensor-parallel placement rule, shared by tp_shardings and
    fsdp_shardings so --tensor-parallel with and without --fsdp always
    place the model axis identically for the same checkpoint: the
    output-feature (last) axis shards over MODEL_AXIS when divisible.
    The VQ dictionary is excluded — whole code vectors stay together for
    the nearest-neighbour assignment and k-means++ revival."""
    return (
        tp > 1
        and leaf.ndim > 0
        and leaf.shape[-1] % tp == 0
        and "dictionary" not in _leaf_name(path)
    )


def tp_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding tree for ``params``: last-axis ('output features')
    sharding over MODEL_AXIS where divisible, replicated otherwise."""
    tp = mesh.shape[MODEL_AXIS]
    replicated = NamedSharding(mesh, P())

    def spec(path, leaf):
        if not model_axis_shards_last_dim(path, leaf, tp):
            return replicated
        return NamedSharding(
            mesh, P(*([None] * (leaf.ndim - 1) + [MODEL_AXIS]))
        )

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_state_tp(mesh: Mesh, state, tx) -> Any:
    """Device-put a TrainState for a 2-D mesh: params / EMAs / optimizer
    moments tensor-sharded, everything else replicated."""
    return shard_state_by(mesh, state, tx, tp_shardings(mesh, state.params))


def shard_state_by(mesh: Mesh, state, tx, pshard: Any) -> Any:
    """Device-put a TrainState with params / EMAs / optimizer moments
    placed per ``pshard``; buffers and step replicate.

    The optimizer moments (Adam mu/nu mirror the param tree) get the SAME
    sharding as their parameter via optax.tree_map_params, so optimizer
    memory scales down exactly like the parameters do.
    """
    import optax

    replicated = NamedSharding(mesh, P())
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
