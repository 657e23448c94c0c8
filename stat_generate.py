"""Extract classifier-feature statistics (and a Class score ~ Inception
Score) for a dataset directory or a directory of generated .wav samples.

Capability parity with /root/reference/stat_generate.py: features come from
the classifier stem at t=0; saves mean/cov/probs/class_score to .npz for
stat_compare.py. Feature extraction is one jitted call per batch; file
reading overlaps with compute via a thread pool.
"""

import argparse
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vq_voice_swap_tpu.classifier_model import ClassifierModel
from vq_voice_swap_tpu.data import (
    ChunkReader,
    create_data_loader,
    lookup_audio_duration,
)


def main():
    args = arg_parser().parse_args()
    segments = load_segments(args)

    classifier, variables = ClassifierModel.load(args.checkpoint_path)

    @jax.jit
    def featurize(batch):
        ts = jnp.zeros((batch.shape[0],))
        feats = classifier.features(variables, batch[..., None], ts)
        logits = classifier.head_from_features(variables, feats)
        return feats, jax.nn.softmax(logits, axis=-1)

    features: List[np.ndarray] = []
    probs: List[np.ndarray] = []
    count = 0
    for batch in batch_segments(args.batch_size, segments):
        fv, pr = featurize(jnp.asarray(batch))
        features.extend(np.asarray(fv))
        probs.extend(np.asarray(pr))
        count += len(batch)
        if count % (args.batch_size * 25) == 0:
            print(f"processed {count} segments")

    features = np.stack(features, axis=0)
    probs = np.stack(probs, axis=0)

    mean = np.mean(features, axis=0)
    cov = np.cov(features, rowvar=False)

    # Class score = exp(mean KL(p(y|x) || p(y))), as in Inception Score.
    kl = probs * (np.log(probs + 1e-12) -
                  np.log(np.mean(probs, axis=0, keepdims=True) + 1e-12))
    score = float(np.exp(np.mean(np.sum(kl, axis=1))))
    print(f"classifier score: {score}")

    np.savez(args.output_path, mean=mean, cov=cov, probs=probs,
             class_score=score)


def batch_segments(batch_size: int, segs: Iterator[np.ndarray]):
    """Group equal-length segments into [N, T] batches (pad/crop to 4 s)."""
    target = 64000
    batch = []
    for seg in segs:
        seg = np.asarray(seg, dtype=np.float32).reshape(-1)
        if len(seg) < target:
            seg = np.pad(seg, (0, target - len(seg)))
        batch.append(seg[:target])
        if len(batch) == batch_size:
            yield np.stack(batch)
            batch = []
    if batch:
        yield np.stack(batch)


def load_segments(args) -> Iterator[np.ndarray]:
    if (args.data_dir is None) == (args.sample_dir is None):
        raise SystemExit("must specify --data-dir or --sample-dir (not both)")
    if args.data_dir is not None:
        loader, _ = create_data_loader(
            args.data_dir, batch_size=1, encoding=args.encoding
        )
        return segments_from_loader(args.num_samples, loader)
    files = sorted(
        os.path.join(args.sample_dir, x)
        for x in os.listdir(args.sample_dir)
        if not x.startswith(".") and x.endswith(".wav")
    )
    if args.num_samples:
        files = files[: args.num_samples]
    return segments_from_files(files, args.encoding)


def segments_from_loader(limit: Optional[int], loader):
    count = 0
    for batch in loader:
        for row in batch["samples"]:
            yield row
            count += 1
            if limit and count >= limit:
                return


def segments_from_files(
    files: List[str], encoding: str = "linear"
) -> Iterator[np.ndarray]:
    def read(path):
        duration = lookup_audio_duration(path)
        with ChunkReader(path, sample_rate=16000, encoding=encoding) as reader:
            return reader.read(16000 * int(duration + 2))

    # Bounded submission window: Executor.map submits every file up front,
    # so on a large sample dir the readers outrun the TPU featurize loop
    # and the whole directory's decoded audio accumulates in finished
    # futures (OOM). Cap in-flight work like data/loader.py's readahead.
    from collections import deque

    window = 16
    with ThreadPoolExecutor(4) as pool:
        pending = deque()
        it = iter(files)
        for path in it:
            pending.append(pool.submit(read, path))
            if len(pending) >= window:
                yield pending.popleft().result()
        while pending:
            yield pending.popleft().result()


def arg_parser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("--checkpoint-path", default="model_classifier.npz",
                        type=str)
    parser.add_argument("--batch-size", default=4, type=int)
    parser.add_argument("--encoding", default="linear", type=str,
                        help="waveform encoding the classifier was trained "
                             "with (e.g. ulaw); applies to --data-dir and "
                             "--sample-dir input alike")
    parser.add_argument("--num-samples", default=None, type=int)
    parser.add_argument("--sample-dir", default=None, type=str)
    parser.add_argument("--data-dir", default=None, type=str)
    parser.add_argument("output_path", type=str)
    return parser


if __name__ == "__main__":
    main()
