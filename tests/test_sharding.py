"""Multi-chip sharding validation on the virtual 8-device CPU mesh."""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_voice_swap_tpu.parallel import (
    batch_sharding,
    create_mesh,
    replicate,
    shard_batch,
)


def test_mesh_and_sharding_helpers():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    mesh = create_mesh()
    assert mesh.devices.size == 8

    batch = {"samples": np.zeros((16, 64), np.float32),
             "label": np.zeros((16,), np.int32)}
    sharded = shard_batch(mesh, batch)
    assert sharded["samples"].sharding == batch_sharding(mesh)
    # Each device holds 16/8 = 2 rows.
    shard_shape = sharded["samples"].sharding.shard_shape((16, 64))
    assert shard_shape == (2, 64)

    tree = {"w": np.ones((4, 4), np.float32)}
    rep = replicate(mesh, tree)
    assert rep["w"].sharding.is_fully_replicated


def test_submesh():
    mesh = create_mesh(num_devices=4)
    assert mesh.devices.size == 4


def test_dryrun_multichip_full_train_step():
    """The driver's multi-chip dry run: full VQ-VAE train step (grad-accum +
    AdamW + EMA + VQ revival) jitted over an 8-device mesh."""
    graft = importlib.import_module("__graft_entry__")
    graft.dryrun_multichip(8)


def test_entry_traces():
    """entry() must produce a jittable fn; check traceability via eval_shape
    (compiling the full unet32 on CPU is too slow for unit tests)."""
    graft = importlib.import_module("__graft_entry__")
    fn, args = graft.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (1, 64000, 1)
