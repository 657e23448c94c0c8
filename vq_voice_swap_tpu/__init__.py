"""vq_voice_swap_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for
diffusion-based speech generation and speaker conversion.

Built from scratch with the capabilities of unixpickle/vq-voice-swap but an
idiomatic JAX architecture: scan-based samplers, jitted train steps with
gradient-accumulation, fused vector-quantization kernels, self-describing
checkpoints, and data-parallel sharding over a TPU mesh.

Quick start:

    from vq_voice_swap_tpu import DiffusionModel, VQVAE
    model, variables = VQVAE.load("ckpt_vqvae/model.npz")
    codes = model.encode(variables, waveform)          # [N, T1] ints
    audio = model.decode(variables, codes, rng, labels=target_speakers)
"""

from .classifier_model import ClassifierModel, EncoderPredictorModel
from .diffusion import CosSchedule, Diffusion, ExpSchedule, make_schedule, make_warp
from .diffusion_model import DiffusionModel
from .model_base import ModelBase, build_model, load_model
from .vq_vae import VQVAE

__version__ = "0.1.0"

__all__ = [
    "ClassifierModel",
    "EncoderPredictorModel",
    "CosSchedule",
    "Diffusion",
    "ExpSchedule",
    "make_schedule",
    "make_warp",
    "DiffusionModel",
    "ModelBase",
    "build_model",
    "load_model",
    "VQVAE",
    "__version__",
]
