"""Render a smoothed loss curve from a training log.

Reads the "step N: k=v ..." format written by the training loops (see
vq_voice_swap_tpu/observe/logger.py) and plots the moving-averaged "loss"
field.

Example:
    python plot_log.py --smoothing 200 ckpt_vqvae/train_log.txt loss.png
"""

import argparse

import matplotlib

matplotlib.use("agg")
import matplotlib.pyplot as plt  # noqa: E402

from vq_voice_swap_tpu.observe import moving_average, read_log  # noqa: E402


def render(log_file: str, out_file: str, smoothing: int, max_y: float):
    steps = []
    losses = []
    for step, fields in read_log(log_file):
        steps.append(step)
        losses.append(fields["loss"])
    smoothed = moving_average(losses, smoothing)
    fig, ax = plt.subplots()
    ax.plot(steps, smoothed)
    ax.set_ylim(0, max_y)
    ax.set_xlabel("step")
    ax.set_ylabel("loss")
    fig.savefig(out_file)


def arg_parser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("--smoothing", type=int, default=100)
    parser.add_argument("--max-y", type=float, default=1.0)
    parser.add_argument("log_file", type=str)
    parser.add_argument("out_file", type=str)
    return parser


def main():
    args = arg_parser().parse_args()
    render(args.log_file, args.out_file, args.smoothing, args.max_y)


if __name__ == "__main__":
    main()
