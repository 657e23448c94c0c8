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
