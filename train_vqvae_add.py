"""Grow a trained VQ-VAE's label space with new speakers, training only the
fresh label embeddings (everything else frozen).

Entry point over vq_voice_swap_tpu.train.VQVAEAddClassesTrainLoop. Use
combine_datasets.py to build the merged data directory first.

Example:
    python train_vqvae_add.py --class-cond \
        --pretrained-path ckpt_vqvae/model.npz /data/combined
"""

import vq_voice_swap_tpu.train as train


def main():
    loop = train.VQVAEAddClassesTrainLoop()
    loop.loop()


if __name__ == "__main__":
    main()
