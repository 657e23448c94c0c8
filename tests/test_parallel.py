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
