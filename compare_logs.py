"""Plot one or more (regex-matched, averaged) log fields from one or more
runs on a shared figure (reference compare_logs.py).

Example:
    python compare_logs.py --fields base_q0 cond_q0 -- log1.txt log2.txt out.png
"""

import argparse
import os
import re

import matplotlib

matplotlib.use("agg")
import matplotlib.pyplot as plt  # noqa: E402

from vq_voice_swap_tpu.observe import moving_average, read_log  # noqa: E402


def field_value(entry, field_expr):
    values = [v for k, v in entry.items() if re.match(field_expr, k)]
    if not values:
        return None
    return sum(values) / len(values)


def main():
    args = arg_parser().parse_args()

    for filename in args.log_files:
        name, _ = os.path.splitext(os.path.basename(filename))
        for field in args.fields:
            entries = [
                (step, field_value(kvs, field))
                for step, kvs in read_log(filename)
            ]
            entries = [(x, y) for x, y in entries if y is not None]
            if not entries:
                print(f"warning: field {field!r} matched nothing in "
                      f"{filename}; skipping that series")
                continue
            xs, ys = zip(*entries)
            ys = moving_average(ys, args.smoothing)
            plt.plot(xs, ys, label=f"{name} {field}")
    plt.ylim(args.min_y, args.max_y)
    if args.max_x is not None:
        plt.xlim(0, args.max_x)
    plt.xlabel("step")
    plt.ylabel("loss")
    plt.legend()
    plt.savefig(args.out_file)


def arg_parser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("--smoothing", type=int, default=1)
    parser.add_argument("--max-x", type=float, default=None)
    parser.add_argument("--min-y", type=float, default=0.0)
    parser.add_argument("--max-y", type=float, default=1.0)
    parser.add_argument("--fields", type=str, nargs="+", default=["base_q."])
    parser.add_argument("log_files", nargs="+", type=str)
    parser.add_argument("out_file", type=str)
    return parser


if __name__ == "__main__":
    main()
