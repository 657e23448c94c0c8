"""Train a diffusion model on waveforms (reference train_diffusion.py)."""

from vq_voice_swap_tpu.train import DiffusionTrainLoop


def main():
    DiffusionTrainLoop().loop()


if __name__ == "__main__":
    main()
