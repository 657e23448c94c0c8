"""Exactness tests for the fused ResBlock Pallas megakernel (interpret
mode on CPU) against the flax ResBlock it replaces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_voice_swap_tpu.models.layers import ResBlock, adaptive_group_count
from vq_voice_swap_tpu.ops.fused_resblock import (
    fused_resblock,
    fused_resblock_supported,
    pick_seq_tile,
)


def _run_case(n, t, cin, cout, dilation, use_emb, dtype, tile, tol):
    rng = np.random.RandomState(hash((t, cin, cout, dilation)) % 2**31)
    x = jnp.asarray(rng.randn(n, t, cin), dtype)
    emb = jnp.asarray(rng.randn(n, 24), dtype) if use_emb else None

    block = ResBlock(
        out_channels=cout,
        use_emb=use_emb,
        dilation=dilation,
        dtype=None if dtype == jnp.float32 else dtype,
    )
    args = (x, emb) if use_emb else (x,)
    params = block.init(jax.random.key(0), *args)["params"]
    # Zero-init conv_out hides half the block; randomize all leaves.
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.randn(*p.shape) * 0.2, p.dtype), params
    )

    want = block.apply({"params": params}, *args)
    got = fused_resblock(
        x, params, emb,
        groups_in=adaptive_group_count(cin),
        groups_out=adaptive_group_count(cout),
        dilation=dilation, tile=tile, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=tol, rtol=tol,
    )


def test_same_channels_film():
    _run_case(2, 256, 64, 64, 2, True, jnp.float32, 64, 2e-4)


def test_skip_proj_no_film():
    _run_case(1, 192, 128, 64, 1, False, jnp.float32, 64, 2e-4)


def test_two_input_concat_equivalence():
    """x2 path == ResBlock on the materialised concat (up-path case)."""
    rng = np.random.RandomState(7)
    h = jnp.asarray(rng.randn(2, 256, 64), jnp.float32)
    skip = jnp.asarray(rng.randn(2, 256, 64), jnp.float32)
    emb = jnp.asarray(rng.randn(2, 24), jnp.float32)
    block = ResBlock(out_channels=64, use_emb=True, dilation=2)
    cat = jnp.concatenate([h, skip], axis=-1)
    params = block.init(jax.random.key(0), cat, emb)["params"]
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.randn(*p.shape) * 0.2, p.dtype), params
    )
    want = block.apply({"params": params}, cat, emb)
    got = fused_resblock(
        h, params, emb, groups_in=adaptive_group_count(128),
        groups_out=adaptive_group_count(64), dilation=2, tile=64,
        interpret=True, x2=skip,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
    )


def test_dilation_4_multi_tile():
    _run_case(2, 384, 64, 64, 4, True, jnp.float32, 128, 2e-4)


def test_bf16():
    _run_case(1, 256, 64, 64, 2, True, jnp.bfloat16, 64, 5e-2)


def test_pick_seq_tile():
    assert pick_seq_tile(64000) == 2000
    assert pick_seq_tile(32000) == 2000
    assert pick_seq_tile(64000, channels=128) == 800
    assert pick_seq_tile(256) == 128
    assert 16000 % pick_seq_tile(16000) == 0


def test_supported_gates_backend():
    x = jnp.zeros((1, 64000, 64), jnp.bfloat16)
    if jax.default_backend() != "tpu":
        assert fused_resblock_supported(x, 2) is None


@pytest.mark.slow
def test_full_predictor_with_fused_blocks(monkeypatch):
    """packed_unet_predict(fuse_levels=2) matches predictor.apply, with
    the megakernel forced on (interpret mode) for the fused levels."""
    import vq_voice_swap_tpu.ops.fused_resblock as fr
    from vq_voice_swap_tpu.models.unet import UNetPredictor
    from vq_voice_swap_tpu.ops.packed_unet import packed_unet_predict

    monkeypatch.setattr(
        fr, "fused_resblock_supported",
        lambda x, d: 64 if d <= 7 else None,
    )
    real = fr.fused_resblock
    monkeypatch.setattr(
        fr, "fused_resblock",
        lambda *a, **kw: real(*a, **{**kw, "tile": 64, "interpret": True}),
    )

    pred = UNetPredictor(
        base_channels=4, channel_mult=(1, 2, 2), depth_mult=1,
        middle_dilations=(2,), num_labels=3,
    )
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 512, 1), jnp.float32)
    ts = jnp.asarray([0.3, 0.8], jnp.float32)
    labels = jnp.asarray([0, 2], jnp.int32)
    params = pred.init(jax.random.key(1), x, ts, labels=labels)["params"]

    want = pred.apply({"params": params}, x, ts, labels=labels)
    got = packed_unet_predict(
        pred, params, x, ts, labels=labels, pack_levels=0, fuse_levels=2
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
    )
    # And the plain pack_levels=0 functional path (no fused, no packed).
    got_plain = packed_unet_predict(
        pred, params, x, ts, labels=labels, pack_levels=0, fuse_levels=0
    )
    np.testing.assert_allclose(
        np.asarray(got_plain), np.asarray(want), atol=2e-5, rtol=2e-5
    )
