"""The Pallas VQ-assignment kernel must match the XLA reference path.

Runs in interpreter mode on CPU; the compiled path is exercised on real TPU
by the training/bench flows.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vq_voice_swap_tpu.ops.vq_pallas import (
    _xla_assign,
    vq_assign,
    vq_assign_pallas,
)


def test_interpret_matches_xla():
    rng = np.random.RandomState(0)
    d = jnp.asarray(rng.randn(128, 128), dtype=jnp.float32)
    x = jnp.asarray(rng.randn(300, 128), dtype=jnp.float32)  # forces padding

    want_idx, want_used = _xla_assign(d, x)
    got_idx, got_used = vq_assign_pallas(d, x, tile=128, interpret=True)

    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(want_idx))
    np.testing.assert_array_equal(np.asarray(got_used), np.asarray(want_used))


def test_interpret_no_padding():
    rng = np.random.RandomState(1)
    d = jnp.asarray(rng.randn(128, 128), dtype=jnp.float32)
    x = jnp.asarray(rng.randn(256, 128), dtype=jnp.float32)
    want_idx, want_used = _xla_assign(d, x)
    got_idx, got_used = vq_assign_pallas(d, x, tile=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(want_idx))
    np.testing.assert_array_equal(np.asarray(got_used), np.asarray(want_used))


def test_dispatch_fallback_cpu():
    # On CPU, vq_assign must silently use the XLA path.
    rng = np.random.RandomState(2)
    d = jnp.asarray(rng.randn(16, 8), dtype=jnp.float32)
    x = jnp.asarray(rng.randn(10, 8), dtype=jnp.float32)
    idx, used = vq_assign(d, x)
    want_idx, want_used = _xla_assign(d, x)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_idx))
    np.testing.assert_array_equal(np.asarray(used), np.asarray(want_used))


def test_sharded_assignment_matches_xla():
    """The shard_map-wrapped kernel (8-device mesh, rows sharded, pmax-
    combined used mask) must match the XLA reference exactly."""
    from vq_voice_swap_tpu.ops.vq_pallas import vq_assign_sharded
    from vq_voice_swap_tpu.parallel import batch_sharding, create_mesh

    rng = np.random.RandomState(2)
    d = jnp.asarray(rng.randn(128, 128), dtype=jnp.float32)
    x = jnp.asarray(rng.randn(1024, 128), dtype=jnp.float32)

    want_idx, want_used = _xla_assign(d, x)

    mesh = create_mesh()
    x_sharded = jax.device_put(x, batch_sharding(mesh))
    got_idx, got_used = vq_assign_sharded(
        mesh, d, x_sharded, interpret=True, tile=128
    )
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(want_idx))
    np.testing.assert_array_equal(np.asarray(got_used), np.asarray(want_used))


def test_set_vq_mesh_dispatch(monkeypatch):
    """vq_assign must route through the sharded kernel when a multi-device
    mesh is registered and the rows split evenly."""
    from vq_voice_swap_tpu.ops import vq_pallas
    from vq_voice_swap_tpu.parallel import create_mesh

    calls = {}

    def fake_sharded(mesh, d, x):
        calls["mesh"] = mesh
        return vq_pallas._xla_assign(d, x)

    monkeypatch.setattr(vq_pallas, "pallas_supported", lambda *a: True)
    monkeypatch.setattr(vq_pallas, "vq_assign_sharded", fake_sharded)
    mesh = create_mesh()
    vq_pallas.set_vq_mesh(mesh)
    try:
        rng = np.random.RandomState(3)
        d = jnp.asarray(rng.randn(128, 128), dtype=jnp.float32)
        x = jnp.asarray(rng.randn(8 * 512, 128), dtype=jnp.float32)
        idx, used = vq_assign(d, x)
        assert calls["mesh"] is mesh
        # Uneven or too-small rows fall back to XLA (no sharded call).
        calls.clear()
        vq_assign(d, x[: 8 * 512 - 8])
        assert not calls
    finally:
        vq_pallas.set_vq_mesh(None)
