"""CLI-surface checks: every script imports and exposes its argument
parser with the expected flags (full end-to-end runs are covered on-device;
see also test_train*.py)."""

import importlib
import sys

import pytest

SCRIPTS_WITH_PARSERS = {
    "sample_diffusion": [
        "--checkpoint-path", "--sample-steps", "--batch-size", "--constrain",
        "--sample-path", "--num-samples", "--classifier-path",
        "--classifier-scale", "--target-class", "--schedule", "--encoding",
        "--tensor-parallel", "--act-int8",
    ],
    "sample_vqvae": [
        "--sample-rate", "--sample-steps", "--seconds", "--label",
        "--input-file", "--encoding", "--enc-pred-path", "--enc-pred-scale",
        "--no-vq", "--check-vq", "--tensor-parallel", "--act-int8",
    ],
    "sample_vqvae_uncond": [
        "--schedule", "--guide-label-scale", "--guide-vq-scale", "--no-vq",
        "--act-int8",
        "--check-vq", "--tensor-parallel",
    ],
    "eval_diffusion": ["--batch-size"],
    "eval_vqvae": ["--batch-size"],
    "stat_generate": [
        "--checkpoint-path", "--batch-size", "--num-samples", "--sample-dir",
        "--data-dir", "--encoding",
    ],
    "stat_compare": [],
    "voice_search_vqvae": [
        "--num-timesteps", "--num-seeds", "--batch-size", "--top-k",
        "--input-file",
    ],
    "plot_log": ["--smoothing", "--max-y"],
    "compare_logs": ["--smoothing", "--max-x", "--min-y", "--max-y",
                     "--fields"],
}

TRAIN_SCRIPTS = {
    "train_diffusion": ["--predictor", "--base-channels", "--dropout",
                        "--schedule", "--class-cond"],
    "train_vqvae": ["--encoder", "--cond-mult", "--dictionary-size",
                    "--freeze-encoder", "--freeze-vq", "--commitment-coeff",
                    "--revival-coeff", "--dead-rate", "--jitter"],
    "train_vqvae_add": [],
    "train_vqvae_uncond": ["--no-class-prob", "--no-vq-prob"],
    "train_classifier": ["--base-channels", "--schedule",
                         "--curriculum-start", "--curriculum-steps"],
    "train_enc_pred": ["--vq-vae-path", "--base-channels"],
}

COMMON_TRAIN_FLAGS = [
    "--lr", "--ema-rate", "--weight-decay", "--batch-size", "--microbatch",
    "--output-dir", "--pretrained-path", "--save-interval",
    "--grad-checkpoint", "--encoding", "--max-steps", "--profile-dir",
    "--pipeline-depth", "--tensor-parallel", "--async-save",
]


def _parser_flags(parser):
    flags = set()
    for action in parser._actions:
        flags.update(action.option_strings)
    return flags


@pytest.mark.parametrize("name", sorted(SCRIPTS_WITH_PARSERS))
def test_cli_script_parsers(name):
    mod = importlib.import_module(name)
    assert hasattr(mod, "main")
    if not SCRIPTS_WITH_PARSERS[name] and not hasattr(mod, "arg_parser"):
        return
    flags = _parser_flags(mod.arg_parser())
    for flag in SCRIPTS_WITH_PARSERS[name]:
        assert flag in flags, f"{name} missing {flag}"


@pytest.mark.parametrize("name", sorted(TRAIN_SCRIPTS))
def test_train_script_parsers(name):
    mod = importlib.import_module(name)
    assert hasattr(mod, "main")
    # The loop classes own the parsers.
    import vq_voice_swap_tpu.train as T

    loop_cls = {
        "train_diffusion": T.DiffusionTrainLoop,
        "train_vqvae": T.VQVAETrainLoop,
        "train_vqvae_add": T.VQVAEAddClassesTrainLoop,
        "train_vqvae_uncond": T.VQVAEUncondTrainLoop,
        "train_classifier": T.ClassifierTrainLoop,
        "train_enc_pred": T.EncoderPredictorTrainLoop,
    }[name]
    flags = _parser_flags(loop_cls.arg_parser())
    for flag in COMMON_TRAIN_FLAGS + TRAIN_SCRIPTS[name]:
        assert flag in flags, f"{name} missing {flag}"


def test_combine_datasets_imports():
    mod = importlib.import_module("combine_datasets")
    assert hasattr(mod, "main")


def test_convert_checkpoint_imports():
    mod = importlib.import_module("convert_checkpoint")
    assert hasattr(mod, "main")
