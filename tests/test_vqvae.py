"""Unit tests for VQ-VAE pieces: jitter regularization and the losses
contract."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from vq_voice_swap_tpu.vq import VQLossConfig
from vq_voice_swap_tpu.vq_vae import VQVAE, jitter_seq


def test_jitter_identity_at_p0():
    seq = jnp.asarray(np.random.RandomState(0).randn(2, 10, 3),
                      dtype=jnp.float32)
    out = jitter_seq(jax.random.key(0), seq, 0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(seq))


def test_jitter_replaces_with_neighbors():
    # Distinct values per timestep so we can identify the source of each
    # output position.
    seq = jnp.arange(20, dtype=jnp.float32).reshape(1, 20, 1)
    out = np.asarray(jitter_seq(jax.random.key(1), seq, 1.0))[0, :, 0]
    src = np.arange(20, dtype=np.float32)
    # With p=1 every position comes from a neighbor (half left, half right);
    # values must be within distance 1 of the original index.
    assert np.all(np.abs(out - src) <= 1.0)
    assert np.any(out != src)


def test_jitter_rate_statistics():
    seq = jnp.arange(4000, dtype=jnp.float32).reshape(1, 4000, 1)
    out = np.asarray(jitter_seq(jax.random.key(2), seq, 0.3))[0, :, 0]
    frac_moved = np.mean(out != np.arange(4000))
    # ~30% of interior positions replaced (edges can map to themselves).
    assert 0.2 < frac_moved < 0.4


@pytest.mark.slow
def test_vqvae_losses_contract():
    model = VQVAE(
        pred_name="wavegrad",
        base_channels=2,
        enc_name="wavegrad",
        cond_mult=4,
        dictionary_size=8,
        num_labels=3,
    )
    variables = model.init_variables(jax.random.key(0), seq_len=256)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 256, 1) * 0.1,
                    dtype=jnp.float32)
    labels = jnp.asarray([0, 1, 2, 0])

    out = jax.jit(
        lambda v, r: model.losses(
            v, r, x, labels=labels, vq_loss_cfg=VQLossConfig(),
            jitter=0.1, no_vq_prob=0.5,
        )
    )(variables, jax.random.key(1))

    assert out["mses"].shape == (4,)
    assert out["ts"].shape == (4,)
    assert out["idxs"].shape == (4, 4)  # 256 / 64
    assert out["enc_flat"].shape == (16, model.cond_channels)
    assert np.isfinite(float(out["vq_loss"]))
    assert np.isfinite(float(out["mse"]))
    np.testing.assert_allclose(
        float(out["mse"]), float(jnp.mean(out["mses"])), rtol=1e-6
    )

    # Deterministic in the rng.
    out2 = jax.jit(
        lambda v, r: model.losses(
            v, r, x, labels=labels, vq_loss_cfg=VQLossConfig(),
            jitter=0.1, no_vq_prob=0.5,
        )
    )(variables, jax.random.key(1))
    np.testing.assert_allclose(
        np.asarray(out["mses"]), np.asarray(out2["mses"]), rtol=1e-6
    )


def test_vqvae_downsample_rate_lcm():
    model = VQVAE(
        pred_name="wavegrad", base_channels=2, enc_name="wavegrad",
        cond_mult=4, dictionary_size=8,
    )
    # wavegrad predictor rate 64, wavegrad encoder rate 64 -> lcm 64.
    assert model.downsample_rate == 64


def test_decode_ddim_sampler():
    """decode(sampler="ddim") runs deterministically and matches shape; the
    DDPM and DDIM outputs differ (different update rules)."""
    model = VQVAE(
        pred_name="wavegrad",
        base_channels=2,
        enc_name="wavegrad",
        cond_mult=4,
        dictionary_size=8,
        num_labels=3,
    )
    variables = model.init_variables(jax.random.key(0), seq_len=256)
    x = jnp.asarray(np.random.RandomState(7).randn(2, 256, 1) * 0.1,
                    dtype=jnp.float32)
    labels = jnp.asarray([0, 2])
    codes = model.encode(variables, x)

    a = model.decode(variables, codes, jax.random.key(1), labels=labels,
                     steps=3, sampler="ddim")
    b = model.decode(variables, codes, jax.random.key(1), labels=labels,
                     steps=3, sampler="ddim")
    c = model.decode(variables, codes, jax.random.key(1), labels=labels,
                     steps=3)
    assert a.shape == (2, 256, 1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-6
