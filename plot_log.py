"""Plot the smoothed loss curve of a training log (reference plot_log.py)."""

import argparse

import matplotlib

matplotlib.use("agg")
import matplotlib.pyplot as plt  # noqa: E402

from vq_voice_swap_tpu.observe import moving_average, read_log  # noqa: E402


def main():
    args = arg_parser().parse_args()
    entries = [(step, kvs["loss"]) for step, kvs in read_log(args.log_file)]
    xs, ys = zip(*entries)
    ys = moving_average(ys, args.smoothing)
    plt.plot(xs, ys)
    plt.ylim(0, args.max_y)
    plt.xlabel("step")
    plt.ylabel("loss")
    plt.savefig(args.out_file)


def arg_parser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("--smoothing", type=int, default=100)
    parser.add_argument("--max-y", type=float, default=1.0)
    parser.add_argument("log_file", type=str)
    parser.add_argument("out_file", type=str)
    return parser


if __name__ == "__main__":
    main()
