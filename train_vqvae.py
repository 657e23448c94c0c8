"""Train a VQ-VAE with a diffusion decoder (reference train_vqvae.py)."""

from vq_voice_swap_tpu.train import VQVAETrainLoop


def main():
    VQVAETrainLoop().loop()


if __name__ == "__main__":
    main()
