"""End-to-end tests for the remaining train loops (classifier,
encoder-predictor, add-classes, CFG fine-tune) and sampling-path smoke tests,
all with tiny models on the 8-device CPU mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vq_voice_swap_tpu.train.loops as loops_mod
from vq_voice_swap_tpu.classifier_model import (
    ClassifierModel,
    EncoderPredictorModel,
)
from vq_voice_swap_tpu.vq_vae import VQVAE
from vq_voice_swap_tpu.train import (
    ClassifierTrainLoop,
    EncoderPredictorTrainLoop,
    VQVAEAddClassesTrainLoop,
    VQVAEUncondTrainLoop,
)

SEQ_LEN = 256


class FakeLoader:
    def __init__(self, batch_size=8):
        self.batch_size = batch_size

    def __iter__(self):
        rng = np.random.RandomState(0)
        for _ in range(2):
            yield {
                "label": rng.randint(0, 3, self.batch_size).astype(np.int32),
                "samples": rng.randn(self.batch_size, SEQ_LEN).astype(
                    np.float32
                ) * 0.1,
            }


def _patch_loader(monkeypatch):
    monkeypatch.setattr(
        loops_mod, "create_data_loader",
        lambda **kw: (FakeLoader(kw.get("batch_size", 8)), 3),
    )


def _tiny_vqvae_ckpt(path, num_labels=None):
    model = VQVAE(
        pred_name="wavegrad",
        base_channels=2,
        enc_name="wavegrad",
        cond_mult=4,
        dictionary_size=8,
        num_labels=num_labels,
    )
    variables = model.init_variables(jax.random.key(0), seq_len=SEQ_LEN)
    model.save(path, variables)
    return model, variables


@pytest.mark.slow
def test_classifier_train_loop(tmp_path, monkeypatch):
    _patch_loader(monkeypatch)

    class TinyClassifierLoop(ClassifierTrainLoop):
        def create_new_model(self):
            model = ClassifierModel(
                num_labels=self.num_labels,
                base_channels=4,
                channel_mult=(1, 2),
                output_mult=2,
                depth_mult=1,
            )
            return model, model.init_variables(jax.random.key(0))

    args = ClassifierTrainLoop.arg_parser().parse_args(
        [
            "--batch-size", "8",
            "--save-interval", "2",
            "--curriculum-start", "10.0",
            "--curriculum-steps", "4",
            "--output-dir", str(tmp_path),
            "tones",
        ]
    )
    loop = TinyClassifierLoop(args)
    loop.loop(max_steps=2)
    log = open(os.path.join(tmp_path, "train_log.txt")).read()
    assert "step 1:" in log and "step 2:" in log
    assert os.path.exists(os.path.join(tmp_path, "model.npz"))


@pytest.mark.slow
def test_enc_pred_train_loop(tmp_path, monkeypatch):
    _patch_loader(monkeypatch)
    vq_path = os.path.join(tmp_path, "vqvae.npz")
    _tiny_vqvae_ckpt(vq_path)

    class TinyEncPredLoop(EncoderPredictorTrainLoop):
        def create_new_model(self):
            model = EncoderPredictorModel(
                base_channels=2,
                downsample_rate=self.vq_vae.encoder.downsample_rate,
                num_latents=self.vq_vae.dictionary_size,
                bottleneck_dim=4,
                channel_mult=(1, 2),
                depth_mult=1,
            )
            return model, model.init_variables(
                jax.random.key(0), seq_len=SEQ_LEN
            )

    args = EncoderPredictorTrainLoop.arg_parser().parse_args(
        [
            "--vq-vae-path", vq_path,
            "--batch-size", "8",
            "--save-interval", "1",
            "--output-dir", str(tmp_path),
            "tones",
        ]
    )
    loop = TinyEncPredLoop(args)
    loop.loop(max_steps=1)
    log = open(os.path.join(tmp_path, "train_log.txt")).read()
    assert "step 1:" in log


def _vqvae_args(cls, tmp_path, pretrained, extra=()):
    return cls.arg_parser().parse_args(
        [
            "--predictor", "wavegrad",
            "--encoder", "wavegrad",
            "--base-channels", "2",
            "--cond-mult", "4",
            "--dictionary-size", "8",
            "--batch-size", "8",
            "--class-cond",
            "--pretrained-path", pretrained,
            "--output-dir", str(tmp_path),
            *extra,
            "tones",
        ]
    )


@pytest.mark.slow
def test_add_classes_loop(tmp_path, monkeypatch):
    _patch_loader(monkeypatch)
    pre_path = os.path.join(tmp_path, "pretrained.npz")
    _tiny_vqvae_ckpt(pre_path, num_labels=3)

    out_dir = os.path.join(tmp_path, "out")
    loop = VQVAEAddClassesTrainLoop(
        _vqvae_args(VQVAEAddClassesTrainLoop, out_dir, pre_path)
    )
    # 3 pretrained + 3 new labels.
    assert loop.model.num_labels == 6

    before = jax.tree.map(np.asarray, loop.state.params)
    loop.loop(max_steps=1)
    after = jax.tree.map(np.asarray, loop.state.params)

    # Everything except the label embeddings must stay frozen.
    from flax import traverse_util

    label_paths = set(loop.model.label_parameter_paths({"params": after}))
    flat_b = traverse_util.flatten_dict(before, sep="/")
    flat_a = traverse_util.flatten_dict(after, sep="/")
    for path in flat_b:
        if path not in label_paths:
            np.testing.assert_array_equal(flat_b[path], flat_a[path])


@pytest.mark.slow
def test_uncond_loop(tmp_path, monkeypatch):
    _patch_loader(monkeypatch)
    pre_path = os.path.join(tmp_path, "pretrained.npz")
    _tiny_vqvae_ckpt(pre_path, num_labels=3)

    out_dir = os.path.join(tmp_path, "out")
    loop = VQVAEUncondTrainLoop(
        _vqvae_args(
            VQVAEUncondTrainLoop, out_dir, pre_path,
            extra=("--no-class-prob", "0.5", "--no-vq-prob", "0.5"),
        )
    )
    # 3 pretrained + 1 unconditional label at the beginning.
    assert loop.model.num_labels == 4
    loop.loop(max_steps=1)
    log = open(os.path.join(out_dir, "train_log.txt")).read()
    assert "step 1:" in log


@pytest.mark.slow
def test_vqvae_decode_and_cfg_smoke():
    """decode() and decode_uncond_guidance() compile and produce the right
    shapes on tiny inputs."""
    model = VQVAE(
        pred_name="wavegrad",
        base_channels=2,
        enc_name="wavegrad",
        cond_mult=4,
        dictionary_size=8,
        num_labels=4,
    )
    variables = model.init_variables(jax.random.key(0), seq_len=SEQ_LEN)

    x = jnp.asarray(
        np.random.RandomState(0).randn(1, SEQ_LEN, 1), dtype=jnp.float32
    ) * 0.1
    codes = model.encode(variables, x)
    assert codes.shape == (1, SEQ_LEN // 64)

    out = jax.jit(
        lambda v, c, rng: model.decode(
            v, c, rng, labels=jnp.asarray([1]), steps=2, constrain=True
        )
    )(variables, codes, jax.random.key(1))
    assert out.shape == (1, SEQ_LEN, 1)
    assert np.all(np.isfinite(np.asarray(out)))

    out2 = jax.jit(
        lambda v, c, rng: model.decode_uncond_guidance(
            v, c, rng, labels=jnp.asarray([1]), steps=2,
            label_scale=1.0, vq_scale=0.5,
        )
    )(variables, codes, jax.random.key(2))
    assert out2.shape == (1, SEQ_LEN, 1)
    assert np.all(np.isfinite(np.asarray(out2)))


@pytest.mark.slow
def test_classifier_train_loop_microbatch_scalar_batch_entry(
    tmp_path, monkeypatch
):
    """Regression (round-3 review): --microbatch with the curriculum loop
    crashed at trace time because the rank-0 ts_power batch entry was
    sliced like a batched array; scalars must replicate across
    microbatches."""
    _patch_loader(monkeypatch)

    class TinyClassifierLoop(ClassifierTrainLoop):
        def create_new_model(self):
            model = ClassifierModel(
                num_labels=self.num_labels,
                base_channels=4,
                channel_mult=(1, 2),
                output_mult=2,
                depth_mult=1,
            )
            return model, model.init_variables(jax.random.key(0))

    args = ClassifierTrainLoop.arg_parser().parse_args(
        [
            "--batch-size", "8",
            "--microbatch", "3",  # 8 = 2x3 + remainder 2, scalar ts_power
            "--save-interval", "100",
            "--curriculum-start", "10.0",
            "--curriculum-steps", "4",
            "--output-dir", str(tmp_path),
            "tones",
        ]
    )
    loop = TinyClassifierLoop(args)
    loop.loop(max_steps=1)
    log = open(os.path.join(tmp_path, "train_log.txt")).read()
    assert "step 1:" in log
