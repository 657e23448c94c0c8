"""Merge several LibriSpeech-like dataset directories into one directory of
symlinks with a combined index (capability of reference combine_datasets.py);
the merged directory feeds train_vqvae_add.py.

Speaker directories from source ``i`` are exposed as ``<i:02>_<speaker>`` so
label spaces from different sources never collide, matching the reference's
prefix convention.
"""

import argparse
import json
import os
import sys

from vq_voice_swap_tpu.data import LibriSpeech


def merge_datasets(sources, output):
    """Symlink every speaker dir of every source into ``output``.

    Returns the combined duration index (speaker -> file -> seconds).
    """
    combined = {}
    for ordinal, source in enumerate(sources):
        print(f"indexing dataset {source}...")
        # use_cache=False: the merge only reads the duration index — the
        # default would decode every source corpus into a window arena
        # (hours of work, a corpus-sized file in each source dir) for
        # nothing.
        for speaker, files in LibriSpeech(source, use_cache=False).index.items():
            alias = f"{ordinal:02}_{speaker}"
            combined[alias] = files
            os.symlink(
                os.path.abspath(os.path.join(source, speaker)),
                os.path.join(output, alias),
            )
    return combined


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("directories", type=str, nargs="+")
    parser.add_argument("output", type=str)
    args = parser.parse_args()

    if os.path.exists(args.output):
        print(f"error: output directory already exists: {args.output}")
        sys.exit(1)
    os.mkdir(args.output)

    index = merge_datasets(args.directories, args.output)
    with open(os.path.join(args.output, "index.json"), "w") as f:
        json.dump(index, f)


if __name__ == "__main__":
    main()
