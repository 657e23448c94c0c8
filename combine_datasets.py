"""Merge several LibriSpeech-like dataset directories into one directory of
symlinks with a combined index (reference combine_datasets.py); feeds
train_vqvae_add.py."""

import argparse
import json
import os
import sys

from vq_voice_swap_tpu.data import LibriSpeech


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("directories", type=str, nargs="+")
    parser.add_argument("output", type=str)
    args = parser.parse_args()

    if os.path.exists(args.output):
        print(f"error: output directory already exists: {args.output}")
        sys.exit(1)
    os.mkdir(args.output)

    combined = {}
    for i, subdir in enumerate(args.directories):
        print(f"indexing dataset {subdir}...")
        dataset = LibriSpeech(subdir)
        prefix = f"{i:02}_"
        for speaker_id, entry in dataset.index.items():
            combined[prefix + speaker_id] = entry
            os.symlink(
                os.path.abspath(os.path.join(subdir, speaker_id)),
                os.path.join(args.output, prefix + speaker_id),
            )

    with open(os.path.join(args.output, "index.json"), "w") as f:
        json.dump(combined, f)


if __name__ == "__main__":
    main()
