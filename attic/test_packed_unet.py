"""The channel-packed UNet execution must match the standard forward
exactly (same checkpoint params)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_voice_swap_tpu.models import UNetPredictor
from vq_voice_swap_tpu.ops.packed_unet import (
    _pack,
    _unpack,
    pack_conv_kernel,
    pack_unet_params,
    packed_unet_predict,
)


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 3), jnp.float32)
    np.testing.assert_array_equal(np.asarray(_unpack(_pack(x))), np.asarray(x))
    # Channel-major phase layout: packed[..., c*2+q] == x[..., 2p+q, c].
    p = np.asarray(_pack(x))
    assert p.shape == (2, 8, 6)
    np.testing.assert_array_equal(p[0, 3, 2 * 1 + 1], np.asarray(x)[0, 7, 1])


@pytest.mark.parametrize("k,dilation", [(1, 1), (3, 1), (3, 2), (5, 1), (3, 4)])
def test_packed_conv_kernel_exact(k, dilation):
    rng = np.random.RandomState(k * 10 + dilation)
    cin, cout, t = 3, 5, 32
    kernel = jnp.asarray(rng.randn(k, cin, cout), jnp.float32)
    x = jnp.asarray(rng.randn(2, t, cin), jnp.float32)

    pad = (k - 1) * dilation // 2
    want = jax.lax.conv_general_dilated(
        x, kernel, (1,), [(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )

    pk, ppad = pack_conv_kernel(kernel, dilation)
    got = jax.lax.conv_general_dilated(
        _pack(x), pk, (1,), [ppad], dimension_numbers=("NHC", "HIO", "NHC"),
    )
    np.testing.assert_allclose(
        np.asarray(_unpack(got)), np.asarray(want), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("pack_levels", [1, 2])
@pytest.mark.slow
def test_packed_unet_matches_standard(pack_levels):
    pred = UNetPredictor(
        base_channels=4, channel_mult=(1, 1, 2), middle_dilations=(2, 4),
        depth_mult=1, cond_channels=6, num_labels=3,
    )
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 64, 1), jnp.float32)
    ts = jnp.asarray([0.3, 0.8], jnp.float32)
    cond = jnp.asarray(rng.randn(2, 16, 6), jnp.float32)
    labels = jnp.asarray([0, 2])
    variables = jax.jit(
        lambda r: pred.init(r, x, ts, cond=cond, labels=labels)
    )(jax.random.key(0))

    want = np.asarray(
        jax.jit(lambda v: pred.apply(v, x, ts, cond=cond, labels=labels))(
            variables
        )
    )
    got = np.asarray(
        jax.jit(
            lambda p: packed_unet_predict(
                pred, p, x, ts, cond=cond, labels=labels,
                pack_levels=pack_levels,
            )
        )(variables["params"])
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_prepacked_weights_match_inline_packing():
    """pack_unet_params + prepacked= must equal inline repacking (and the
    standard forward), including inside a scan like ddpm_sample's."""
    pred = UNetPredictor(
        base_channels=4, channel_mult=(1, 1, 2), middle_dilations=(2, 4),
        depth_mult=1, num_labels=3,
    )
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 64, 1), jnp.float32)
    ts = jnp.asarray([0.3, 0.8], jnp.float32)
    labels = jnp.asarray([0, 2])
    variables = jax.jit(
        lambda r: pred.init(r, x, ts, labels=labels)
    )(jax.random.key(2))
    params = variables["params"]

    want = np.asarray(
        jax.jit(lambda v: pred.apply(v, x, ts, labels=labels))(variables)
    )

    @jax.jit
    def scanned(p):
        prep = pack_unet_params(pred, p, pack_levels=2)

        def body(h, _):
            out = packed_unet_predict(
                pred, p, h, ts, labels=labels, pack_levels=2, prepacked=prep
            )
            return out, out

        _, outs = jax.lax.scan(body, x, None, length=2)
        return outs[0]

    got = np.asarray(scanned(params))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
    # Every packed conv was served from the prepacked dict: recording a
    # fresh dict finds the same key set.
    prep = pack_unet_params(pred, params, pack_levels=2)
    assert "in_conv" in prep and "out_conv" in prep
    assert any(k.startswith("down_blocks_") for k in prep)
    assert any(k.startswith("up_blocks_") for k in prep)


@pytest.mark.slow
def test_packed_unet_unconditional():
    pred = UNetPredictor(
        base_channels=4, channel_mult=(1, 2), middle_dilations=(2,),
        depth_mult=2,
    )
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 32, 1), jnp.float32)
    ts = jnp.asarray([0.5], jnp.float32)
    variables = jax.jit(lambda r: pred.init(r, x, ts))(jax.random.key(1))

    want = np.asarray(jax.jit(lambda v: pred.apply(v, x, ts))(variables))
    got = np.asarray(
        jax.jit(
            lambda p: packed_unet_predict(pred, p, x, ts, pack_levels=1)
        )(variables["params"])
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_conditioning_contract_enforced():
    """A conditional predictor must not silently run unconditioned through
    the packed/fused serving path (mirrors UNetPredictor.__call__'s
    asserts)."""
    pred = UNetPredictor(
        base_channels=2, channel_mult=(1, 2), middle_dilations=(2,),
        depth_mult=1, num_labels=3, cond_channels=4,
    )
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 32, 1), jnp.float32)
    ts = jnp.asarray([0.5], jnp.float32)
    cond = jnp.asarray(rng.randn(1, 8, 4), jnp.float32)
    labels = jnp.asarray([1])
    params = pred.init(
        jax.random.key(3), x, ts, cond=cond, labels=labels
    )["params"]
    with pytest.raises(AssertionError):
        packed_unet_predict(pred, params, x, ts, cond=cond, pack_levels=1)
    with pytest.raises(AssertionError):
        packed_unet_predict(pred, params, x, ts, labels=labels, pack_levels=1)


def test_pack_unet_params_conditional_multichannel():
    """pack_unet_params must handle conditional predictors with
    in_channels != 1 (its record-mode trace builds its own dummy batch)."""
    pred = UNetPredictor(
        base_channels=2, channel_mult=(1, 2), middle_dilations=(2,),
        depth_mult=1, in_channels=2, num_labels=3, cond_channels=4,
    )
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 32, 2), jnp.float32)
    ts = jnp.asarray([0.5], jnp.float32)
    cond = jnp.asarray(rng.randn(1, 8, 4), jnp.float32)
    labels = jnp.asarray([2])
    params = pred.init(
        jax.random.key(4), x, ts, cond=cond, labels=labels
    )["params"]

    prep = pack_unet_params(pred, params, pack_levels=1)
    assert "in_conv" in prep

    want = np.asarray(
        jax.jit(
            lambda p: pred.apply(
                {"params": p}, x, ts, cond=cond, labels=labels
            )
        )(params)
    )
    got = np.asarray(
        jax.jit(
            lambda p: packed_unet_predict(
                pred, p, x, ts, cond=cond, labels=labels,
                pack_levels=1, prepacked=prep,
            )
        )(params)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
