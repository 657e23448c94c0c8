"""Train the speaker-conversion VQ-VAE (encoder + VQ + diffusion decoder).

Entry point over vq_voice_swap_tpu.train.VQVAETrainLoop. The VQ codebook's
usage tracking and k-means++ dead-code revival run inside the jitted train
step (no host syncs).

Examples:
    python train_vqvae.py --class-cond tones
    python train_vqvae.py --class-cond --encoder conv-mfcc-ulaw \
        --encoding ulaw --batch-size 32 /data/LibriSpeech/train-clean-360
"""

import vq_voice_swap_tpu.train as train


def main():
    loop = train.VQVAETrainLoop()
    loop.loop()


if __name__ == "__main__":
    main()
