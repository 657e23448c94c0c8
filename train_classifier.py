"""Train the noised-audio speaker classifier used for classifier guidance
and for Class/Frechet score evaluation.

Entry point over vq_voice_swap_tpu.train.ClassifierTrainLoop: inputs are
diffusion-noised at curriculum-warped timesteps (ts**power annealing from
--curriculum-start to 1 over --curriculum-steps).

Example:
    python train_classifier.py --curriculum-start 30 \
        --curriculum-steps 50000 <data_dir>
"""

import vq_voice_swap_tpu.train as train


def main():
    loop = train.ClassifierTrainLoop()
    loop.loop()


if __name__ == "__main__":
    main()
