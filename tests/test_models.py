"""Shape/behavior tests for the model zoo.

Configs are tiny and all init/apply calls are jitted (see tests/util.py) to
keep CPU compile counts low.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import jax
from util import japply, jinit

from vq_voice_swap_tpu.models import (
    Classifier,
    ConvMFCCEncoder,
    EncoderPredictor,
    UNetEncoder,
    UNetPredictor,
    WaveGradEncoder,
    WaveGradPredictor,
    make_encoder,
    make_predictor,
)

SMALL_MULT = (1, 2, 4)  # downsample 4x


@pytest.mark.slow
def test_unet_predictor_full():
    model = UNetPredictor(
        base_channels=4,
        channel_mult=SMALL_MULT,
        middle_dilations=(2,),
        depth_mult=1,
        cond_channels=6,
        num_labels=3,
    )
    x = jnp.zeros((2, 64, 1))
    ts = jnp.asarray([0.2, 0.8])
    cond = jnp.zeros((2, 16, 6))
    labels = jnp.asarray([0, 2])
    params = jinit(model, jax.random.key(0), x, ts, cond=cond, labels=labels)
    out = japply(model, params, x, ts, cond=cond, labels=labels)
    assert out.shape == (2, 64, 1)
    assert np.all(np.isfinite(np.asarray(out)))
    assert model.downsample_rate == 4

    # Mismatched conditioning must assert (shape checking is trace-time).
    with pytest.raises(AssertionError):
        model.apply(params, x, ts, cond=None, labels=labels)


def test_unet_encoder_downsamples():
    enc = UNetEncoder(
        base_channels=4, channel_mult=SMALL_MULT, depth_mult=1,
        out_channels=8, out_dilations=(2,),
    )
    x = jnp.zeros((2, 64, 1))
    params = jinit(enc, jax.random.key(0), x)
    out = japply(enc, params, x)
    assert out.shape == (2, 16, 8)  # 64 / 4
    assert enc.downsample_rate == 4


@pytest.mark.slow
def test_wavegrad_pair():
    model = WaveGradPredictor(base_channels=2, cond_mult=4, num_labels=3)
    x = jnp.zeros((1, 128, 1))
    ts = jnp.asarray([0.4])
    labels = jnp.asarray([1])
    params = jinit(model, jax.random.key(0), x, ts, labels=labels)
    out = japply(model, params, x, ts, labels=labels)
    assert out.shape == (1, 128, 1)
    # Zero-init output conv: untrained prediction is exactly zero.
    np.testing.assert_allclose(np.asarray(out), 0.0)
    assert model.downsample_rate == 64

    enc = WaveGradEncoder(base_channels=2, cond_mult=4)
    eparams = jinit(enc, jax.random.key(0), x)
    eout = japply(enc, eparams, x)
    assert eout.shape == (1, 2, 8)  # 128/64 x cond_channels
    assert enc.downsample_rate == 64

    # Conditional path: feed the encoder output as cond.
    out2 = japply(model, params, x, ts, cond=eout, labels=labels)
    assert out2.shape == (1, 128, 1)


def test_mfcc_encoder():
    enc = ConvMFCCEncoder(base_channels=2, out_channels=8)
    assert enc.downsample_rate == 320
    # 4 s contract: 64000 samples -> exactly 200 latent frames, so decode()
    # reconstructs the original length.
    x = jnp.zeros((1, 64000, 1))
    params = jinit(enc, jax.random.key(0), x)
    out = japply(enc, params, x)
    assert out.shape == (1, 200, 8)
    # Zero-init output conv.
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_classifier():
    model = Classifier(
        num_labels=5, base_channels=4, channel_mult=SMALL_MULT, depth_mult=1,
        output_mult=2,
    )
    x = jnp.zeros((2, 64, 1))
    ts = jnp.zeros((2,))
    params = jinit(model, jax.random.key(0), x, ts)
    logits = japply(model, params, x, ts)
    assert logits.shape == (2, 5)
    feats = japply(model, params, x, ts, method=model.features)
    assert feats.shape == (2, 8)
    # Zero-init head: logits are exactly zero at init.
    np.testing.assert_allclose(np.asarray(logits), 0.0)


@pytest.mark.slow
def test_encoder_predictor():
    model = EncoderPredictor(base_channels=2, downsample_rate=4, num_latents=7)
    x = jnp.zeros((1, 512, 1))
    ts = jnp.asarray([0.3])
    params = jinit(model, jax.random.key(0), x, ts)
    logits = japply(model, params, x, ts)
    assert logits.shape == (1, 128, 7)
    targets = jnp.zeros((1, 128), dtype=jnp.int32)
    losses = japply(model, params, x, ts, targets, method=model.losses)
    assert losses.shape == (1,)
    assert np.all(np.asarray(losses) > 0)


@pytest.mark.slow
@pytest.mark.parametrize("mode", [True, "convs"])
def test_remat_grads_match(mode):
    """--grad-checkpoint (nn.remat, full or convs policy) must give
    identical gradients to the un-rematted model."""
    kw = dict(base_channels=4, channel_mult=(1, 2), middle_dilations=(2,),
              depth_mult=1)
    m_remat = UNetPredictor(remat=mode, **kw)
    m_plain = UNetPredictor(remat=False, **kw)
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 32, 1), dtype=jnp.float32
    )
    ts = jnp.asarray([0.1, 0.9])
    params = jinit(m_remat, jax.random.key(0), x, ts)

    g1 = jax.jit(jax.grad(lambda p: jnp.sum(m_remat.apply(p, x, ts) ** 2)))(
        params
    )
    g2 = jax.jit(jax.grad(lambda p: jnp.sum(m_plain.apply(p, x, ts) ** 2)))(
        params
    )
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), g1, g2)
    # Full remat replays the identical op sequence (bitwise); the convs
    # policy re-fuses the recomputed norm chains, so reductions reassociate
    # and f32 rounding differs at the 1e-7 level.
    tol = 0.0 if mode is True else 5e-6
    assert max(jax.tree.leaves(diffs)) <= tol
    total = sum(
        float(jnp.sum(jnp.abs(v))) for v in jax.tree.leaves(g1)
    )
    assert total > 0


def test_registries():
    p = make_predictor("unet", base_channels=4)
    assert isinstance(p, UNetPredictor)
    p = make_predictor("wavegrad", base_channels=4, cond_channels=64)
    assert isinstance(p, WaveGradPredictor) and p.cond_mult == 16
    with pytest.raises(ValueError):
        make_predictor("nope")

    for name, cls in [
        ("wavegrad", WaveGradEncoder),
        ("unet", UNetEncoder),
        ("unet128", UNetEncoder),
        ("unet128-dilated", UNetEncoder),
        ("conv-mfcc-ulaw", ConvMFCCEncoder),
        ("conv-mfcc-ulaw-v2", ConvMFCCEncoder),
        ("conv-mfcc-linear", ConvMFCCEncoder),
    ]:
        e = make_encoder(name, base_channels=4)
        assert isinstance(e, cls), name
    assert make_encoder("unet128", base_channels=4).downsample_rate == 128
    assert make_encoder("conv-mfcc-linear", base_channels=4).input_ulaw is False
    with pytest.raises(ValueError):
        make_encoder("nope")


@pytest.mark.slow
def test_classifier_load_from_predictor_shape_mismatch_raises():
    """Warm-starting the classifier stem from a mismatched predictor must
    fail loudly (reference classifier.py:123-130 load_state_dict), not
    silently copy (near) nothing. Slow: initializes three full-topology
    models (eager flax init is the cost on a 1-core host)."""
    import jax

    from vq_voice_swap_tpu.classifier_model import ClassifierModel
    from vq_voice_swap_tpu.diffusion_model import DiffusionModel

    clf = ClassifierModel(num_labels=3, base_channels=4)
    clf_vars = clf.init_variables(jax.random.key(0), seq_len=2048)

    # Matching config: copies a nonzero prefix of the stem.
    ok = DiffusionModel(pred_name="unet", base_channels=4)
    ok_vars = ok.init_variables(jax.random.key(1), seq_len=2048)
    _, total = clf.load_from_predictor(
        clf_vars, ok_vars["params"]["predictor"]
    )
    assert total > 0

    # Mismatched base_channels: loud error, not total == 0.
    bad = DiffusionModel(pred_name="unet", base_channels=8)
    bad_vars = bad.init_variables(jax.random.key(2), seq_len=2048)
    with pytest.raises(ValueError, match="base-channels"):
        clf.load_from_predictor(clf_vars, bad_vars["params"]["predictor"])
