"""Train an encoder-predictor: predicts a frozen VQ-VAE's discrete codes
from noised audio. Its input-gradient steers sampling toward latent
consistency (pass --enc-pred-path to sample_vqvae.py).

Entry point over vq_voice_swap_tpu.train.EncoderPredictorTrainLoop; the
frozen VQ-VAE rides through the jitted step as a traced argument.

Example:
    python train_enc_pred.py --vq-vae-path ckpt_vqvae/model.npz <data_dir>
"""

import vq_voice_swap_tpu.train as train


def main():
    loop = train.EncoderPredictorTrainLoop()
    loop.loop()


if __name__ == "__main__":
    main()
