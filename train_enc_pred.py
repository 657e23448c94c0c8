"""Train an encoder-predictor guidance model (reference train_enc_pred.py)."""

from vq_voice_swap_tpu.train import EncoderPredictorTrainLoop


def main():
    EncoderPredictorTrainLoop().loop()


if __name__ == "__main__":
    main()
