"""Train a noised-audio speaker classifier (reference train_classifier.py)."""

from vq_voice_swap_tpu.train import ClassifierTrainLoop


def main():
    ClassifierTrainLoop().loop()


if __name__ == "__main__":
    main()
