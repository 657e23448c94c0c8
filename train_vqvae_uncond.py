"""Fine-tune a VQ-VAE for classifier-free guidance: labels are shifted up by
one and randomly dropped to the new unconditional class 0; the VQ cond
sequence is randomly zeroed per sequence.

Entry point over vq_voice_swap_tpu.train.VQVAEUncondTrainLoop; sample with
sample_vqvae_uncond.py afterwards.

Example:
    python train_vqvae_uncond.py --class-cond --no-class-prob 0.1 \
        --no-vq-prob 0.1 --pretrained-path ckpt_vqvae/model.npz <data_dir>
"""

import vq_voice_swap_tpu.train as train


def main():
    loop = train.VQVAEUncondTrainLoop()
    loop.loop()


if __name__ == "__main__":
    main()
