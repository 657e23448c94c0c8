"""Unit tests for parallel helpers beyond the train-step dry runs."""

import jax
import numpy as np

from vq_voice_swap_tpu.parallel import (
    batch_sharding,
    create_mesh,
    global_batch_from_local,
    initialize_multihost,
)


def test_global_batch_single_process():
    mesh = create_mesh()
    batch = {
        "samples": np.zeros((8, 32), np.float32),
        "label": np.zeros((8,), np.int32),
        "ts_power": np.asarray(2.0, np.float32),  # scalar -> replicated
    }
    out = global_batch_from_local(mesh, batch)
    assert out["samples"].sharding == batch_sharding(mesh)
    assert out["ts_power"].sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(out["samples"]), 0)


def test_initialize_multihost_is_safe_single_host():
    # Must be a no-op without cluster env vars.
    initialize_multihost()
    assert jax.process_count() == 1


def test_package_api_surface():
    import vq_voice_swap_tpu as pkg

    assert hasattr(pkg, "VQVAE")
    assert hasattr(pkg, "DiffusionModel")
    assert hasattr(pkg, "load_model")
    assert pkg.__version__


def test_global_batch_multiprocess_branch(monkeypatch):
    """Exercise the multi-host branch of global_batch_from_local by faking
    jax.process_count()>1 and capturing what it hands to
    jax.make_array_from_process_local_data: per-entry routing must send
    arrays through process-local assembly with the batch sharding and
    replicate rank-0 scalars."""
    from vq_voice_swap_tpu.parallel import mesh as mesh_mod

    mesh = create_mesh()
    calls = []

    def fake_make_array(sharding, local):
        calls.append((sharding, np.asarray(local)))
        # Single-process stand-in: behave like a plain device_put.
        return jax.device_put(local, sharding)

    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 2)
    monkeypatch.setattr(
        mesh_mod.jax, "make_array_from_process_local_data", fake_make_array
    )

    batch = {
        "samples": np.arange(8 * 4, dtype=np.float32).reshape(8, 4),
        "label": np.zeros((8,), np.int32),
        "ts_power": np.asarray(2.0, np.float32),
    }
    out = global_batch_from_local(mesh, batch)

    # Both arrays (and only the arrays) went through process-local assembly.
    assert len(calls) == 2
    for sharding, local in calls:
        assert sharding == batch_sharding(mesh)
        assert local.shape[0] == 8
    # The scalar was replicated, not assembled.
    assert out["ts_power"].sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(out["samples"]), batch["samples"])
