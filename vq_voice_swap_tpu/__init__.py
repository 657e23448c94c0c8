"""vq_voice_swap_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for
diffusion-based speech generation and speaker conversion.

Built from scratch with the capabilities of unixpickle/vq-voice-swap but an
idiomatic JAX architecture: scan-based samplers, jitted train steps with
gradient-accumulation, fused vector-quantization kernels, self-describing
checkpoints, and data-parallel sharding over a TPU mesh.
"""

__version__ = "0.1.0"
