"""Add new speakers to a trained VQ-VAE by fine-tuning only fresh label
embeddings (reference train_vqvae_add.py)."""

from vq_voice_swap_tpu.train import VQVAEAddClassesTrainLoop


def main():
    VQVAEAddClassesTrainLoop().loop()


if __name__ == "__main__":
    main()
