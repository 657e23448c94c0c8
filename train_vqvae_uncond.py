"""Fine-tune a VQ-VAE for classifier-free guidance
(reference train_vqvae_uncond.py)."""

from vq_voice_swap_tpu.train import VQVAEUncondTrainLoop


def main():
    VQVAEUncondTrainLoop().loop()


if __name__ == "__main__":
    main()
