"""int8-stored activation serving path (ops/qact.py + the act_int8_min_t
knob on the UNet family).

Correctness strategy: the int8 path must (a) keep the param tree identical
to the plain path so trained checkpoints serve through either, (b) bound
local quantization error by construction, and (c) track the plain forward
closely on randomized models. Distribution-level quality is gated on-chip
by the 10k Frechet protocol (PERF.md round 4), not here.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_voice_swap_tpu.diffusion_model import DiffusionModel
from vq_voice_swap_tpu.models.layers import ResBlock
from vq_voice_swap_tpu.models.registry import make_predictor
from vq_voice_swap_tpu.models.unet import UNetEncoder, UNetPredictor
from vq_voice_swap_tpu.ops.qact import (
    QAct,
    conv1d_int8,
    dequantize,
    qact_avg_pool,
    qact_concat,
    qact_group_norm,
    qact_upsample,
    quantize,
)


def _randomize(params, key, scale=0.1):
    """Replace every leaf with random normals: zero-init output convs make
    a fresh-init forward trivially near-zero, which would hide errors."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    leaves = [
        scale * jax.random.normal(k, l.shape, l.dtype)
        for k, l in zip(keys, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ------------------------------------------------------------ primitives


def test_quantize_roundtrip_error_bound():
    x = jax.random.normal(jax.random.key(0), (2, 64, 8)) * 3.0
    qa = quantize(x)
    assert qa.q.dtype == jnp.int8
    assert qa.scale.ndim == 0
    err = jnp.max(jnp.abs(dequantize(qa) - x))
    # Half an LSB of the symmetric 127-level grid.
    assert err <= float(jnp.max(jnp.abs(x))) / 127.0 * 0.5 + 1e-6


def test_quantize_zero_tensor_safe():
    qa = quantize(jnp.zeros((1, 8, 4)))
    assert np.all(np.asarray(qa.q) == 0)
    assert np.isfinite(np.asarray(dequantize(qa))).all()


def test_concat_matches_dequantized_concat():
    a = quantize(jax.random.normal(jax.random.key(1), (2, 16, 4)))
    b = quantize(jax.random.normal(jax.random.key(2), (2, 16, 6)) * 10)
    cat = qact_concat(a, b)
    assert cat.q.shape == (2, 16, 10) and cat.scale.shape == (10,)
    want = jnp.concatenate([dequantize(a), dequantize(b)], axis=-1)
    np.testing.assert_allclose(np.asarray(dequantize(cat)),
                               np.asarray(want), rtol=0, atol=1e-6)


def test_avg_pool_and_upsample():
    x = jax.random.normal(jax.random.key(3), (2, 32, 4))
    qa = quantize(x)
    pooled = qact_avg_pool(qa, 2)
    want = jnp.mean(dequantize(qa).reshape(2, 16, 2, 4), axis=2)
    # Re-rounding costs at most half an LSB.
    assert float(jnp.max(jnp.abs(dequantize(pooled) - want))) <= (
        float(qa.scale) * 0.5 + 1e-6
    )
    up = qact_upsample(qa, 2)  # exact: pure gather
    np.testing.assert_array_equal(
        np.asarray(up.q), np.asarray(jnp.repeat(qa.q, 2, axis=1))
    )


@pytest.mark.parametrize("dilation,ksize", [(1, 3), (2, 3), (1, 1)])
def test_conv1d_int8_tracks_f32_conv(dilation, ksize):
    k1, k2, k3 = jax.random.split(jax.random.key(4), 3)
    x = jax.random.normal(k1, (2, 64, 8))
    kernel = jax.random.normal(k2, (ksize, 8, 12)) * 0.2
    bias = jax.random.normal(k3, (12,)) * 0.1
    qa = quantize(x)
    got = conv1d_int8(qa, kernel, bias, dilation=dilation)
    pad = (ksize - 1) * dilation // 2
    want = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(dilation,), dimension_numbers=("NHC", "HIO", "NHC"),
    ) + bias
    denom = float(jnp.linalg.norm(want)) + 1e-9
    assert float(jnp.linalg.norm(got - want)) / denom < 0.03


def test_conv1d_int8_per_channel_scales_fold_into_weights():
    """The concat-skip case: halves quantized on very different ranges."""
    k1, k2, k3 = jax.random.split(jax.random.key(5), 3)
    a = jax.random.normal(k1, (2, 32, 4))
    b = jax.random.normal(k2, (2, 32, 4)) * 50.0
    qa = qact_concat(quantize(a), quantize(b))
    assert qa.scale.shape == (8,)
    kernel = jax.random.normal(k3, (1, 8, 6)) * 0.3
    got = conv1d_int8(qa, kernel, None)
    x = jnp.concatenate([a, b], axis=-1)
    want = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=[(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    denom = float(jnp.linalg.norm(want)) + 1e-9
    assert float(jnp.linalg.norm(got - want)) / denom < 0.03


def test_qact_group_norm_matches_flax_on_dequantized_input():
    x = jax.random.normal(jax.random.key(6), (2, 64, 8)) * 2.0
    qa = quantize(x)
    scale = jnp.linspace(0.5, 1.5, 8)
    bias = jnp.linspace(-0.2, 0.2, 8)
    got = qact_group_norm(qa, scale, bias, groups=4, epsilon=1e-5,
                          use_gelu=True)
    gn = nn.GroupNorm(num_groups=4, epsilon=1e-5)
    want = gn.apply(
        {"params": {"scale": scale, "bias": bias}}, dequantize(qa)
    )
    want = jax.nn.gelu(want, approximate=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


# ----------------------------------------------------------- block / model


def test_resblock_int8_same_param_tree_and_close_output():
    kw = dict(out_channels=12, use_emb=True, scale_factor=0.5)
    plain = ResBlock(**kw)
    quant = ResBlock(**kw, act_int8_min_t=1)
    x = jax.random.normal(jax.random.key(7), (2, 32, 8))
    emb = jax.random.normal(jax.random.key(8), (2, 16))
    v = plain.init(jax.random.key(9), x, emb)
    vq = quant.init(jax.random.key(9), x, emb)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        vq
    ), "int8 path must create the identical param tree"
    v = {"params": _randomize(v["params"], jax.random.key(10))}
    yp = plain.apply(v, x, emb)
    yq = quant.apply(v, x, emb)
    assert isinstance(yq, QAct)
    yq = dequantize(yq)
    assert yq.shape == yp.shape == (2, 16, 12)
    rel = float(jnp.linalg.norm(yq - yp) / (jnp.linalg.norm(yp) + 1e-9))
    assert rel < 0.05, rel


@pytest.mark.parametrize("module_kw,call_kw", [
    (dict(num_labels=3), dict(labels=jnp.array([0, 2]))),
    (dict(cond_channels=6), dict(cond=jnp.zeros((2, 8, 6)))),
])
def test_unet_predictor_int8_tracks_plain(module_kw, call_kw):
    kw = dict(base_channels=8, channel_mult=(1, 2, 4), middle_dilations=(2,),
              depth_mult=1, dtype=jnp.bfloat16, **module_kw)
    plain = UNetPredictor(**kw)
    quant = UNetPredictor(**kw, act_int8_min_t=64)
    x = jax.random.normal(jax.random.key(11), (2, 256, 1))
    ts = jnp.array([0.3, 0.7])
    if "cond" in call_kw:
        call_kw["cond"] = jax.random.normal(jax.random.key(12), (2, 64, 6))
    v = plain.init(jax.random.key(13), x, ts, **call_kw)
    vq = quant.init(jax.random.key(13), x, ts, **call_kw)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vq)
    v = {"params": _randomize(v["params"], jax.random.key(14))}
    yp = np.asarray(plain.apply(v, x, ts, **call_kw), np.float64).ravel()
    yq = np.asarray(
        jax.jit(lambda v: quant.apply(v, x, ts, **call_kw))(v), np.float64
    ).ravel()
    cc = np.corrcoef(yp, yq)[0, 1]
    assert cc > 0.98, cc


def test_unet_encoder_int8_tracks_plain():
    kw = dict(base_channels=8, channel_mult=(1, 2), depth_mult=1,
              out_channels=16)
    plain = UNetEncoder(**kw)
    quant = UNetEncoder(**kw, act_int8_min_t=32)
    x = jax.random.normal(jax.random.key(15), (2, 64, 1))
    v = plain.init(jax.random.key(16), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        quant.init(jax.random.key(16), x)
    )
    v = {"params": _randomize(v["params"], jax.random.key(17))}
    yp = np.asarray(plain.apply(v, x), np.float64).ravel()
    yq = np.asarray(quant.apply(v, x), np.float64).ravel()
    assert np.corrcoef(yp, yq)[0, 1] > 0.98


def test_int8_rejects_training_and_wavegrad():
    model = UNetPredictor(base_channels=8, channel_mult=(1, 2),
                          depth_mult=1, act_int8_min_t=16)
    x = jnp.zeros((1, 32, 1))
    ts = jnp.zeros((1,))
    with pytest.raises(AssertionError, match="serving-only"):
        model.init(jax.random.key(0), x, ts, train=True)
    with pytest.raises(AssertionError, match="unet"):
        make_predictor("wavegrad", base_channels=8, act_int8_min_t=16)


def test_unet_int8_under_data_parallel_mesh():
    """The serving knob must compose with the DP serving mesh: the global
    amax in quantize() becomes a cross-device collective under batch
    sharding, and the result must match the unsharded forward exactly."""
    from vq_voice_swap_tpu.parallel import (
        batch_sharding,
        create_mesh,
        replicate,
    )

    model = UNetPredictor(base_channels=8, channel_mult=(1, 2),
                          depth_mult=1, act_int8_min_t=32)
    x = jax.random.normal(jax.random.key(20), (8, 128, 1))
    ts = jnp.linspace(0.1, 0.9, 8)
    v = model.init(jax.random.key(21), x, ts)
    v = {"params": _randomize(v["params"], jax.random.key(22))}
    want = np.asarray(jax.jit(model.apply)(v, x, ts))

    mesh = create_mesh()
    vs = replicate(mesh, v)
    xs = jax.device_put(x, batch_sharding(mesh))
    tss = jax.device_put(ts, batch_sharding(mesh))
    got = np.asarray(jax.jit(model.apply)(vs, xs, tss))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_diffusion_model_act_int8_save_load_and_override(tmp_path):
    model = DiffusionModel(pred_name="unet", base_channels=8,
                           act_int8_min_t=128)
    assert model.predictor.act_int8_min_t == 128
    variables = model.init_variables(jax.random.key(0), seq_len=512)
    path = str(tmp_path / "m.ckpt")
    model.save(path, variables)
    loaded, _ = DiffusionModel.load(path)
    assert loaded.act_int8_min_t == 128  # self-describing round-trip
    forced, _ = DiffusionModel.load(path, act_int8_min_t=0)
    assert forced.act_int8_min_t == 0  # serving-time override
    served, _ = DiffusionModel.load(path, act_int8_min_t=256)
    assert served.predictor.act_int8_min_t == 256


# ------------------------------------------------- default-off contract


def _lowered_text(module, x, ts):
    v = module.init(jax.random.key(20), x, ts)
    return jax.jit(
        lambda v, x, ts: module.apply(v, x, ts)
    ).lower(v, x, ts).as_text()


def test_default_path_lowers_with_zero_int8_ops():
    """The measured-negative int8 activation path (PERF.md round 4: slower
    on all three axes, quality collapse at 5-step DPM++) is OFF by default;
    this pins the contract: the default UNet forward lowers with ZERO
    s8 tensors in the HLO, so the feature cannot silently re-enter the hot
    path. The act_int8_min_t>0 lowering is checked to CONTAIN s8 ops so the
    scan is sensitive, not vacuous."""
    import re

    kw = dict(base_channels=8, channel_mult=(1, 2), middle_dilations=(2,),
              depth_mult=1, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.key(21), (1, 128, 1))
    ts = jnp.array([0.5])

    # StableHLO spells the type i8 (e.g. tensor<1x16x8xi8>); the pattern
    # cannot collide with i18/f8 variants.
    plain_hlo = _lowered_text(UNetPredictor(**kw), x, ts)
    assert not re.search(r"i8>", plain_hlo), (
        "default (bf16) path must contain no int8 tensors"
    )

    quant_hlo = _lowered_text(UNetPredictor(**kw, act_int8_min_t=32), x, ts)
    assert re.search(r"i8>", quant_hlo), (
        "sensitivity check: act_int8_min_t>0 must lower with i8 tensors"
    )
