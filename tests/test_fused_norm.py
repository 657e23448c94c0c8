"""Tests for the (opt-in) fused GroupNorm op: reference-path semantics vs
flax GroupNorm, custom-VJP gradients, and tiling policy."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vq_voice_swap_tpu.ops.fused_norm import (
    fused_group_norm,
    fused_norm_enabled,
    matmul_group_norm,
    matmul_norm_enabled,
    pick_tile,
    reference_group_norm,
)


def test_disabled_by_default():
    assert not fused_norm_enabled()


def test_reference_matches_flax_groupnorm():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 16), dtype=jnp.float32)
    gn = nn.GroupNorm(num_groups=4, epsilon=1e-5)
    params = gn.init(jax.random.key(0), x)
    scale = params["params"]["scale"]
    bias = params["params"]["bias"]
    want = np.asarray(gn.apply(params, x))
    got = np.asarray(reference_group_norm(x, scale, bias, 4, 1e-5, False))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)

    # With random affine + gelu.
    scale2 = jnp.asarray(rng.rand(16), jnp.float32)
    bias2 = jnp.asarray(rng.randn(16), jnp.float32)
    want2 = jax.nn.gelu(
        gn.apply({"params": {"scale": scale2, "bias": bias2}}, x),
        approximate=False,
    )
    got2 = reference_group_norm(x, scale2, bias2, 4, 1e-5, True)
    np.testing.assert_allclose(
        np.asarray(got2), np.asarray(want2), atol=2e-5, rtol=2e-5
    )


def test_fused_group_norm_grads():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 32, 8), dtype=jnp.float32)
    scale = jnp.ones((8,))
    bias = jnp.zeros((8,))

    def loss(xx, ss, bb):
        return jnp.sum(fused_group_norm(xx, ss, bb, 4, 1e-5, True) ** 2)

    def loss_ref(xx, ss, bb):
        return jnp.sum(reference_group_norm(xx, ss, bb, 4, 1e-5, True) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(x, scale, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_matmul_group_norm_large_mean_no_nan():
    """Regression: unclamped one-pass variance cancels negative in f32 for
    large-mean groups and rsqrt(var + eps) NaNs; also requires HIGHEST
    matmul precision so f32 inputs aren't rounded to bf16 on the MXU."""
    rng = np.random.RandomState(8)
    x = jnp.asarray(1000.0 + 0.01 * rng.randn(1, 256, 16), jnp.float32)
    scale = jnp.ones(16, jnp.float32)
    bias = jnp.zeros(16, jnp.float32)
    got = np.asarray(matmul_group_norm(x, scale, bias, 4, 1e-5, False))
    # One-pass variance cannot be ACCURATE at mean/std ~ 1e5 in f32 (the
    # cancellation noise exceeds the true variance), but it must stay
    # finite; accuracy at normal activation scales is pinned by
    # test_matmul_group_norm_matches_reference below.
    assert np.isfinite(got).all()


def test_matmul_group_norm_matches_reference():
    assert not matmul_norm_enabled()  # opt-in (VVS_MATMUL_GN=1)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(3, 256, 16) * 2.0 + 0.5, dtype=jnp.float32)
    scale = jnp.asarray(rng.rand(16), jnp.float32)
    bias = jnp.asarray(rng.randn(16), jnp.float32)
    for use_gelu in (False, True):
        want = reference_group_norm(x, scale, bias, 4, 1e-5, use_gelu)
        got = matmul_group_norm(x, scale, bias, 4, 1e-5, use_gelu)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    # bf16 inputs: products are exact in f32 accumulation, so the stats
    # agree with the f32 two-pass reference on the bf16 values.
    xb = x.astype(jnp.bfloat16)
    want = reference_group_norm(xb, scale, bias, 4, 1e-5, True)
    got = matmul_group_norm(xb, scale, bias, 4, 1e-5, True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )

    # Differentiable (used in training when enabled).
    g = jax.grad(
        lambda xx: jnp.sum(matmul_group_norm(xx, scale, bias, 4, 1e-5, True))
    )(x)
    g_ref = jax.grad(
        lambda xx: jnp.sum(
            reference_group_norm(xx, scale, bias, 4, 1e-5, True)
        )
    )(x)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), atol=1e-4, rtol=1e-4
    )


def test_pick_tile():
    # Divides T, aligned, and channel-aware VMEM budget.
    assert pick_tile(64000, 64, jnp.bfloat16) == 4000
    t = pick_tile(2000, 512, jnp.bfloat16)
    assert t is not None and 2000 % t == 0 and t * 512 * 2 <= 512 * 1024
    assert pick_tile(7, 64, jnp.float32) is None
