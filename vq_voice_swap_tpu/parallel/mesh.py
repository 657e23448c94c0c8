"""Device mesh and sharding helpers.

The reference is single-device (no torch.distributed anywhere; SURVEY.md §2).
The TPU-native scaling story is batch-axis data parallelism over an ICI mesh:
parameters and optimizer state are replicated, batches are sharded on the
leading axis, and gradient psums are inserted by the partitioner — no
hand-written collectives. Multi-host runs extend the same mesh over DCN via
jax.distributed.initialize; per-host data loading feeds
jax.make_array_from_process_local_data.
"""

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "DATA_AXIS",
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "global_batch_from_local",
    "staged_global_batch_from_local",
]

DATA_AXIS = "data"


def initialize_multihost() -> None:
    """Initialise JAX distributed runtime for multi-host (DCN) training.

    Safe to call unconditionally: a no-op when the cluster-environment
    variables (e.g. on Cloud TPU pods) are absent or when already
    initialised. After this, jax.devices() spans all hosts and the same
    data-parallel mesh code scales across DCN; per-host loaders should feed
    jax.make_array_from_process_local_data.
    """
    import os

    try:
        jax.distributed.initialize()
    except Exception as e:
        # Only swallow when there is no evidence of a real cluster: on a pod
        # with coordinator env vars set, a silent fallthrough would leave
        # each host training an independent single-host model, racing writes
        # to the same checkpoint path — with no error ever surfaced.
        cluster_env = any(
            os.environ.get(k)
            for k in (
                "JAX_COORDINATOR_ADDRESS",
                "COORDINATOR_ADDRESS",
                "MEGASCALE_COORDINATOR_ADDRESS",
            )
        )
        if cluster_env:
            raise RuntimeError(
                "jax.distributed.initialize() failed but coordinator env "
                "vars are set — refusing to degrade to single-host training"
            ) from e


def create_mesh(num_devices: Optional[int] = None,
                devices: Optional[list] = None) -> Mesh:
    """A 1-D data-parallel mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Device-put a host batch with its leading axis sharded over the mesh.

    Rank-0 entries (e.g. curriculum scalars) are replicated.
    """
    sharded = batch_sharding(mesh)
    replicated = replicated_sharding(mesh)

    def put(x):
        target = sharded if np.ndim(x) >= 1 else replicated
        return jax.device_put(x, target)

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree fully replicated over the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def global_batch_from_local(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Assemble a global sharded batch from per-process local data.

    Single-process: identical to shard_batch. Multi-host (after
    initialize_multihost): each host passes its local shard of the global
    batch and the result is a global jax.Array sharded batch-wise across all
    hosts' devices — the standard per-host data-loading recipe.
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, batch)
    sharded = batch_sharding(mesh)
    replicated = replicated_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicated)
        return jax.make_array_from_process_local_data(sharded, x)

    return jax.tree.map(put, batch)


def staged_global_batch_from_local(mesh: Mesh, batches) -> Dict[str, Any]:
    """Stack K per-process local batches to [K, ...] staged device arrays.

    The K-steps-per-dispatch train path (train/loops.py --steps-per-dispatch)
    scans one jitted program over the leading K axis, so the BATCH axis of
    every array entry moves to axis 1: shardings become P(None, data).
    Rank-0 entries (curriculum scalars) stack to a replicated [K] vector —
    the scan slices one scalar per step, matching the single-step program.
    """
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *batches)
    staged = NamedSharding(mesh, P(None, DATA_AXIS))
    replicated = replicated_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        if x.ndim <= 1:  # [K] stack of per-step scalars
            return jax.device_put(x, replicated)
        if jax.process_count() == 1:
            return jax.device_put(x, staged)
        return jax.make_array_from_process_local_data(staged, x)

    return jax.tree.map(put, stacked)
