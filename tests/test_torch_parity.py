"""Numerical parity against the reference PyTorch implementation.

Builds small reference models (imported from /root/reference — execution
only), converts their weights with convert/torch_import.py, and checks our
flax models reproduce the same outputs. This validates both the architecture
re-implementation and the checkpoint converter used for the released
unet32/unet64/vqvae checkpoints.

Skipped when /root/reference or torch is unavailable.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
if not os.path.isdir(os.path.join(REFERENCE, "vq_voice_swap")):
    pytest.skip("reference repo not available", allow_module_level=True)
if REFERENCE not in sys.path:
    # Append (not insert): the reference repo also has top-level scripts
    # whose names collide with ours; repo-root modules must win.
    sys.path.append(REFERENCE)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


from vq_voice_swap_tpu.convert.torch_import import convert_state_dict  # noqa: E402

ATOL = 2e-4
RTOL = 2e-4


def _to_numpy_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def test_unet_predictor_parity():
    from vq_voice_swap.models.unet import UNetPredictor as TorchUNet

    torch.manual_seed(0)
    tm = TorchUNet(
        base_channels=4,
        channel_mult=(1, 2),
        middle_dilations=(2, 4),
        depth_mult=1,
        cond_channels=6,
        num_labels=3,
    )
    tm.eval()

    from vq_voice_swap_tpu.models import UNetPredictor

    jm = UNetPredictor(
        base_channels=4,
        channel_mult=(1, 2),
        middle_dilations=(2, 4),
        depth_mult=1,
        cond_channels=6,
        num_labels=3,
    )

    sd = {f"predictor.{k}": v for k, v in _to_numpy_sd(tm).items()}
    variables = convert_state_dict(
        "DiffusionModel", {"pred_name": "unet"}, sd
    )
    params = {"params": variables["params"]["predictor"]}

    rng = np.random.RandomState(0)
    x = rng.randn(2, 1, 32).astype(np.float32)
    ts = np.asarray([0.25, 0.75], np.float32)
    cond = rng.randn(2, 6, 8).astype(np.float32)
    labels = np.asarray([0, 2])

    with torch.no_grad():
        want = tm(
            torch.from_numpy(x),
            torch.from_numpy(ts),
            cond=torch.from_numpy(cond),
            labels=torch.from_numpy(labels),
        ).numpy()

    got = np.asarray(
        jax.jit(
            lambda p: jm.apply(
                p,
                jnp.asarray(np.transpose(x, (0, 2, 1))),
                jnp.asarray(ts),
                cond=jnp.asarray(np.transpose(cond, (0, 2, 1))),
                labels=jnp.asarray(labels),
            )
        )(params)
    )
    np.testing.assert_allclose(
        np.transpose(got, (0, 2, 1)), want, atol=ATOL, rtol=RTOL
    )


def test_unet_encoder_parity():
    from vq_voice_swap.models.unet import UNetEncoder as TorchEnc

    torch.manual_seed(1)
    tm = TorchEnc(
        base_channels=4, channel_mult=(1, 2), depth_mult=1,
        out_channels=8, out_dilations=(2,),
    )
    tm.eval()

    from vq_voice_swap_tpu.models import UNetEncoder

    jm = UNetEncoder(
        base_channels=4, channel_mult=(1, 2), depth_mult=1,
        out_channels=8, out_dilations=(2,),
    )

    sd = {f"encoder.{k}": v for k, v in _to_numpy_sd(tm).items()}
    variables = convert_state_dict(
        "VQVAE", {"pred_name": "unet", "enc_name": "unet"}, sd
    )
    params = {"params": variables["params"]["encoder"]}

    rng = np.random.RandomState(2)
    x = rng.randn(2, 1, 32).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(
        jax.jit(
            lambda p: jm.apply(p, jnp.asarray(np.transpose(x, (0, 2, 1))))
        )(params)
    )
    np.testing.assert_allclose(
        np.transpose(got, (0, 2, 1)), want, atol=ATOL, rtol=RTOL
    )


def test_wavegrad_predictor_parity():
    from vq_voice_swap.models.wavegrad import WaveGradPredictor as TorchWG

    torch.manual_seed(2)
    tm = TorchWG(base_channels=2, cond_mult=4, num_labels=3)
    tm.eval()

    from vq_voice_swap_tpu.models import WaveGradPredictor

    jm = WaveGradPredictor(base_channels=2, cond_mult=4, num_labels=3)

    sd = {f"predictor.{k}": v for k, v in _to_numpy_sd(tm).items()}
    variables = convert_state_dict(
        "DiffusionModel", {"pred_name": "wavegrad"}, sd
    )
    params = {"params": variables["params"]["predictor"]}

    rng = np.random.RandomState(3)
    x = rng.randn(2, 1, 128).astype(np.float32)
    ts = np.asarray([0.1, 0.9], np.float32)
    cond = rng.randn(2, 8, 2).astype(np.float32)
    labels = np.asarray([1, 0])

    with torch.no_grad():
        want = tm(
            torch.from_numpy(x),
            torch.from_numpy(ts),
            cond=torch.from_numpy(cond),
            labels=torch.from_numpy(labels),
        ).numpy()

    got = np.asarray(
        jax.jit(
            lambda p: jm.apply(
                p,
                jnp.asarray(np.transpose(x, (0, 2, 1))),
                jnp.asarray(ts),
                cond=jnp.asarray(np.transpose(cond, (0, 2, 1))),
                labels=jnp.asarray(labels),
            )
        )(params)
    )
    np.testing.assert_allclose(
        np.transpose(got, (0, 2, 1)), want, atol=ATOL, rtol=RTOL
    )


@pytest.mark.parametrize("sigma_large,constrain,use_cond",
                         [(False, False, False), (True, False, False),
                          (False, True, False), (False, False, True)])
def test_reverse_step_parity(sigma_large, constrain, use_cond):
    """ddpm_previous must match the reference update exactly (sigma choice,
    guidance-on-mean, constrain order of operations)."""
    from vq_voice_swap.diffusion import Diffusion as TorchDiffusion
    from vq_voice_swap.diffusion.schedule import ExpSchedule as TorchExp

    from vq_voice_swap_tpu.diffusion import Diffusion, ExpSchedule

    tdiff = TorchDiffusion(TorchExp())
    jdiff = Diffusion(ExpSchedule())

    rng = np.random.RandomState(0)
    x_t = rng.randn(2, 1, 64).astype(np.float32) * 2
    eps = rng.randn(2, 1, 64).astype(np.float32)
    noise = rng.randn(2, 1, 64).astype(np.float32)
    ts = np.asarray([0.8, 0.3], np.float32)
    step = 0.1

    t_cond = (lambda mean, t: torch.ones_like(mean) * 0.5) if use_cond else None
    j_cond = (lambda mean, t: jnp.ones_like(mean) * 0.5) if use_cond else None

    want = tdiff.ddpm_previous(
        torch.from_numpy(x_t),
        torch.from_numpy(ts),
        step,
        torch.from_numpy(eps),
        noise=torch.from_numpy(noise),
        sigma_large=sigma_large,
        constrain=constrain,
        cond_fn=t_cond,
    ).numpy()
    got = np.asarray(
        jdiff.ddpm_previous(
            jnp.asarray(x_t),
            jnp.asarray(ts),
            jnp.asarray(step),
            jnp.asarray(eps),
            jnp.asarray(noise),
            sigma_large=sigma_large,
            constrain=constrain,
            cond_fn=j_cond,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_sample_q_parity():
    from vq_voice_swap.diffusion import Diffusion as TorchDiffusion
    from vq_voice_swap.diffusion.schedule import CosSchedule as TorchCos

    from vq_voice_swap_tpu.diffusion import CosSchedule, Diffusion

    rng = np.random.RandomState(1)
    x0 = rng.randn(3, 1, 32).astype(np.float32)
    eps = rng.randn(3, 1, 32).astype(np.float32)
    ts = np.asarray([0.1, 0.5, 0.99], np.float32)
    want = TorchDiffusion(TorchCos()).sample_q(
        torch.from_numpy(x0), torch.from_numpy(ts), torch.from_numpy(eps)
    ).numpy()
    got = np.asarray(
        Diffusion(CosSchedule()).sample_q(
            jnp.asarray(x0), jnp.asarray(ts), jnp.asarray(eps)
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_checkpoint_file_conversion(tmp_path):
    """Full file-level path: torch-save a reference DiffusionModel checkpoint,
    convert it with convert_torch_checkpoint, load through ModelBase, and
    verify the prediction matches torch."""
    import os

    from vq_voice_swap.diffusion_model import DiffusionModel as TorchDM

    torch.manual_seed(7)
    tdm = TorchDM(pred_name="wavegrad", base_channels=2, num_labels=3)
    tdm.eval()
    pt_path = os.path.join(tmp_path, "model.pt")
    torch.save(
        {"kwargs": tdm.save_kwargs(), "state_dict": tdm.state_dict()}, pt_path
    )

    from vq_voice_swap_tpu.convert import convert_torch_checkpoint
    from vq_voice_swap_tpu.model_base import ModelBase

    npz_path = os.path.join(tmp_path, "model.npz")
    class_name, kwargs = convert_torch_checkpoint(pt_path, npz_path)
    assert class_name == "DiffusionModel"

    model, variables = ModelBase.load(npz_path)
    assert model.pred_name == "wavegrad" and model.num_labels == 3
    assert model.schedule_name == tdm.schedule_name

    rng = np.random.RandomState(5)
    x = rng.randn(2, 1, 128).astype(np.float32)
    ts = np.asarray([0.2, 0.6], np.float32)
    labels = np.asarray([2, 0])
    with torch.no_grad():
        want = tdm.predictor(
            torch.from_numpy(x), torch.from_numpy(ts),
            labels=torch.from_numpy(labels),
        ).numpy()
    got = np.asarray(
        jax.jit(
            lambda v: model.predict_eps(
                v,
                jnp.asarray(np.transpose(x, (0, 2, 1))),
                jnp.asarray(ts),
                labels=jnp.asarray(labels),
            )
        )(variables)
    )
    np.testing.assert_allclose(
        np.transpose(got, (0, 2, 1)), want, atol=ATOL, rtol=RTOL
    )


@pytest.mark.slow
def test_direct_pt_load(tmp_path):
    """ModelBase.load must accept a reference torch .pt file directly."""
    import os

    from vq_voice_swap.diffusion_model import DiffusionModel as TorchDM

    torch.manual_seed(21)
    tdm = TorchDM(pred_name="wavegrad", base_channels=2)
    pt_path = os.path.join(tmp_path, "model.pt")
    torch.save(
        {"kwargs": tdm.save_kwargs(), "state_dict": tdm.state_dict()}, pt_path
    )

    from vq_voice_swap_tpu.model_base import ModelBase

    model, variables = ModelBase.load(pt_path)
    assert model.pred_name == "wavegrad"
    out = model.predict_eps(
        variables, jnp.zeros((1, 128, 1)), jnp.asarray([0.5])
    )
    assert out.shape == (1, 128, 1)


def test_vqvae_checkpoint_conversion(tmp_path):
    """Convert a full torch VQVAE checkpoint (wavegrad encoder + predictor +
    VQ codebook) and verify encode() agrees with the torch model."""
    import os

    from vq_voice_swap.vq_vae import VQVAE as TorchVQVAE

    torch.manual_seed(11)
    tm = TorchVQVAE(
        base_channels=2,
        pred_name="wavegrad",
        enc_name="wavegrad",
        cond_mult=4,
        dictionary_size=8,
        num_labels=3,
    )
    tm.eval()
    pt_path = os.path.join(tmp_path, "vqvae.pt")
    torch.save(
        {"kwargs": tm.save_kwargs(), "state_dict": tm.state_dict()}, pt_path
    )

    from vq_voice_swap_tpu.convert import convert_torch_checkpoint
    from vq_voice_swap_tpu.vq_vae import VQVAE

    npz_path = os.path.join(tmp_path, "vqvae.npz")
    class_name, kwargs = convert_torch_checkpoint(pt_path, npz_path)
    assert class_name == "VQVAE"

    model, variables = VQVAE.load(npz_path)
    assert model.dictionary_size == 8 and model.cond_mult == 4

    rng = np.random.RandomState(9)
    x = rng.randn(2, 1, 256).astype(np.float32) * 0.5
    with torch.no_grad():
        want_codes = tm.encode(torch.from_numpy(x)).numpy()
    got_codes = np.asarray(
        model.encode(variables, jnp.asarray(np.transpose(x, (0, 2, 1))))
    )
    np.testing.assert_array_equal(got_codes, want_codes)

    # usage_count buffer carried over.
    np.testing.assert_array_equal(
        np.asarray(variables["buffers"]["vq"]["usage_count"]),
        tm.vq.usage_count.numpy(),
    )


def test_classifier_parity():
    from vq_voice_swap.models.classifier import Classifier as TorchClf

    torch.manual_seed(3)
    tm = TorchClf(
        num_labels=5, base_channels=4, channel_mult=(1, 2), depth_mult=1,
        output_mult=2,
    )
    tm.eval()

    from vq_voice_swap_tpu.models import Classifier

    jm = Classifier(
        num_labels=5, base_channels=4, channel_mult=(1, 2), depth_mult=1,
        output_mult=2,
    )

    variables = convert_state_dict("Classifier", {}, _to_numpy_sd(tm))
    params = {"params": variables["params"]}

    rng = np.random.RandomState(4)
    x = rng.randn(2, 1, 32).astype(np.float32)
    ts = np.asarray([0.0, 0.5], np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x), torch.from_numpy(ts)).numpy()
    got = np.asarray(
        jax.jit(
            lambda p: jm.apply(
                p, jnp.asarray(np.transpose(x, (0, 2, 1))), jnp.asarray(ts)
            )
        )(params)
    )
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)


def test_mfcc_encoder_converter_parity():
    """Numerical test for _map_mfcc_encoder (convert/torch_import.py).

    The reference ConvMFCCEncoder cannot be instantiated here (torchaudio is
    absent), so this rebuilds its conv stack (reference
    conv_encoder.py:60-85 topology, exact state_dict names) in torch, feeds
    it float64 golden MFCC features (tests/mfcc_reference.py, golden-tested
    in test_mfcc.py), and checks the converted flax encoder reproduces the
    full waveform->codes-features path end to end.
    """
    import torch.nn as tnn

    from mfcc_reference import mfcc_features_numpy

    base_channels, out_channels = 2, 6
    mid = base_channels * 12

    class ResConv(tnn.Module):  # reference conv_encoder.py:112-120
        def __init__(self, *args, **kwargs):
            super().__init__()
            self.conv = tnn.Conv1d(*args, **kwargs)

        def forward(self, x):
            return x + torch.nn.functional.gelu(self.conv(x))

    torch.manual_seed(11)
    blocks = tnn.ModuleList(
        [
            tnn.Sequential(tnn.Conv1d(39, mid, 3, padding=1), tnn.GELU()),
            ResConv(mid, mid, 3, padding=1),
            tnn.Sequential(tnn.Conv1d(mid, mid, 4, stride=2, padding=1), tnn.GELU()),
            ResConv(mid, mid, 3, padding=1),
            ResConv(mid, mid, 3, padding=1),
            *[ResConv(mid, mid, 1) for _ in range(4)],
            tnn.Conv1d(mid, out_channels, 1),
        ]
    )
    # Unlike the real encoder the final conv stays random here, so the
    # mapping of out_conv is actually exercised numerically.
    blocks = blocks.double().eval()

    rng = np.random.RandomState(7)
    wav = np.clip(0.4 * rng.randn(2, 800), -1, 1)

    # Torch side: float64 numpy frontend + torch conv stack.
    feats = mfcc_features_numpy(wav, version=1, input_ulaw=True)  # [N, T', 39]
    with torch.no_grad():
        h = torch.from_numpy(np.transpose(feats, (0, 2, 1)))
        for block in blocks:
            h = block(h)
        want = h.numpy()  # [N, C, T1]

    # Ours: converted params + full jitted encoder from the raw waveform.
    sd = {f"encoder.blocks.{k}": v for k, v in _to_numpy_sd(blocks).items()}
    # torchaudio MFCC persistent buffers ride along in real checkpoints;
    # the converter must treat them as expected leftovers (the frontend is
    # pure JAX), not raise "unconverted torch parameters".
    sd["encoder.mfcc.dct_mat"] = np.zeros((40, 13), np.float64)
    sd["encoder.mfcc.MelSpectrogram.spectrogram.window"] = np.zeros(
        (400,), np.float64
    )
    sd["encoder.mfcc.MelSpectrogram.mel_scale.fb"] = np.zeros(
        (201, 40), np.float64
    )
    variables = convert_state_dict(
        "VQVAE", {"pred_name": "unet", "enc_name": "conv-mfcc-ulaw"}, sd
    )

    from vq_voice_swap_tpu.models import ConvMFCCEncoder

    jm = ConvMFCCEncoder(base_channels=base_channels, out_channels=out_channels)
    got = np.asarray(
        jax.jit(
            lambda p: jm.apply(
                {"params": p}, jnp.asarray(wav[:, :, None], dtype=jnp.float32)
            )
        )(variables["params"]["encoder"])
    )
    np.testing.assert_allclose(
        got, np.transpose(want, (0, 2, 1)), atol=5e-4, rtol=5e-4
    )


@pytest.mark.slow
def test_unet_predictor_full_default_topology_parity():
    """Full released-model topology parity (f32).

    Uses the reference UNetPredictor DEFAULTS the released unet32/unet64
    checkpoints were trained with (unet.py:16-27): 9-level channel_mult
    (1,1,2,2,2,4,4,8,8), middle_dilations (4,8,16,32), depth_mult=2, plus
    dropout=0.1 — which shifts the torch post_cond module indices and is
    exactly the converter path (torch_import.py:97-101) the released
    dropout-trained checkpoints hit. base_channels is reduced to keep the
    test affordable; the topology (and every converter branch) is identical.
    """
    from vq_voice_swap.models.unet import UNetPredictor as TorchUNet

    kwargs = dict(base_channels=4, cond_channels=8, num_labels=3, dropout=0.1)

    torch.manual_seed(5)
    tm = TorchUNet(**kwargs)
    tm.eval()

    from vq_voice_swap_tpu.models import UNetPredictor

    jm = UNetPredictor(**kwargs)

    sd = {f"predictor.{k}": v for k, v in _to_numpy_sd(tm).items()}
    variables = convert_state_dict("DiffusionModel", {"pred_name": "unet"}, sd)
    params = {"params": variables["params"]["predictor"]}

    rng = np.random.RandomState(6)
    # 8 downsamples in the default pyramid -> T must divide 256.
    x = rng.randn(1, 1, 512).astype(np.float32)
    ts = np.asarray([0.4], np.float32)
    cond = rng.randn(1, 8, 2).astype(np.float32)
    labels = np.asarray([1])

    with torch.no_grad():
        want = tm(
            torch.from_numpy(x),
            torch.from_numpy(ts),
            cond=torch.from_numpy(cond),
            labels=torch.from_numpy(labels),
        ).numpy()

    got = np.asarray(
        jax.jit(
            lambda p: jm.apply(
                p,
                jnp.asarray(np.transpose(x, (0, 2, 1))),
                jnp.asarray(ts),
                cond=jnp.asarray(np.transpose(cond, (0, 2, 1))),
                labels=jnp.asarray(labels),
            )
        )(params)
    )
    np.testing.assert_allclose(
        np.transpose(got, (0, 2, 1)), want, atol=ATOL, rtol=RTOL
    )
