"""Batched data loading with background prefetch.

Replaces the reference's torch DataLoader(num_workers=4)
(/root/reference/vq_voice_swap/dataset.py:12-44) with a thread-pool prefetch
pipeline: decode is I/O / subprocess bound so threads (not processes) keep
the accelerator fed without pickling overhead; batches are plain numpy dicts
{"label": [N], "samples": [N, T]} ready for device upload.
"""

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from .datasets import ChirpDataset, LibriSpeech, ToneDataset

__all__ = ["create_data_loader", "DataLoader"]


class DataLoader:
    """Shuffled, drop-last batch iterator with prefetching."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 4,
        prefetch: int = 4,
        seed: int = 0,
        shard_index: int = 0,
        num_shards: int = 1,
    ):
        """``shard_index``/``num_shards`` partition each epoch across hosts:
        all shards draw ONE shared permutation per epoch (seeded by
        ``seed + epoch`` — identical on every host) and take disjoint
        strided slices of it, so a global step never sees the same sample
        twice and a nominal epoch traverses the dataset exactly once
        globally. Every shard gets exactly ``len(dataset) // num_shards``
        items so hosts stay in lockstep for collectives."""
        if not 0 <= shard_index < num_shards:
            raise ValueError(f"shard {shard_index} not in [0, {num_shards})")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self._epoch = 0
        self._seed = seed
        self.shard_index = shard_index
        self.num_shards = num_shards

    def __len__(self) -> int:
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState((self._seed + self._epoch) % 2**31)
            rng.shuffle(order)
        self._epoch += 1
        if self.num_shards > 1:
            # Equal-size disjoint shards of the shared permutation.
            usable = len(order) - len(order) % self.num_shards
            order = order[self.shard_index : usable : self.num_shards]
        end = (
            len(order) - len(order) % self.batch_size
            if self.drop_last
            else len(order)
        )
        for i in range(0, end, self.batch_size):
            yield order[i : i + self.batch_size]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if len(self) == 0:
            raise ValueError(
                f"batch_size {self.batch_size} larger than the dataset "
                f"({len(self.dataset)} items) with drop_last: no batches "
                "would ever be produced"
            )
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()  # set when the consumer abandons iteration

        def safe_put(item) -> bool:
            """put() that gives up when the consumer is gone — a plain
            blocking put would pin this thread (and the executor + decoded
            batches) forever after an early `break` in the train loop."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        get_batch = getattr(self.dataset, "get_batch", None)
        use_fast = get_batch is not None and getattr(
            self.dataset, "cache", None
        ) is not None

        def collate(idxs):
            if use_fast:
                return get_batch(idxs)
            items = [self.dataset[int(i)] for i in idxs]
            return {
                "label": np.asarray([it["label"] for it in items], np.int32),
                "samples": np.stack([it["samples"] for it in items]).astype(
                    np.float32
                ),
            }

        def producer():
            # Sliding submission window: at most workers+prefetch batches in
            # flight, so a slow consumer bounds memory to O(window), not
            # O(epoch) (safe_put blocks, which throttles new submissions).
            window = self.num_workers + self.prefetch
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    from collections import deque

                    pending = deque()
                    for idxs in self._batch_indices():
                        if stop.is_set():
                            break
                        pending.append(pool.submit(collate, idxs))
                        if len(pending) >= window:
                            if not safe_put(pending.popleft().result()):
                                break
                    while pending and not stop.is_set():
                        if not safe_put(pending.popleft().result()):
                            break
                    for fut in pending:
                        fut.cancel()
            except BaseException as exc:  # propagate into the consumer
                safe_put(exc)
            finally:
                # Blocking stop-aware put: with a full prefetch queue (the
                # steady state when the consumer is slower than decode) a
                # put_nowait would drop the sentinel and hang the consumer
                # at the epoch boundary. safe_put only gives up once the
                # consumer has set `stop`, i.e. nothing is waiting for it.
                safe_put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # Runs on normal exhaustion AND on generator close/GC after an
            # early break: release the producer and its executor.
            stop.set()
            while True:  # drain so a blocked safe_put wakes immediately
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break
            thread.join(timeout=10)


def create_data_loader(
    directory: str,
    batch_size: int,
    encoding: str = "linear",
    num_workers: int = 4,
    seed: int = 0,
    shard_index: int = 0,
    num_shards: int = 1,
    **dataset_kwargs,
) -> Tuple[DataLoader, int]:
    """Build (loader, num_labels). ``directory == "tones"`` selects the
    synthetic fixture (reference dataset.py:31-32). ``shard_index`` /
    ``num_shards`` give each host a disjoint slice of a shared per-epoch
    permutation (see DataLoader)."""
    if directory == "tones" or directory.startswith("tones:"):
        # "tones" is the 30-item fixture (3 speakers x 10 phases, matching
        # the reference's dataset.py:31-32); "tones:N" scales to N phases
        # per speaker so large-batch throughput benches have enough items
        # (the default fixture caps batch_size at 30 under drop_last).
        phases = int(directory.split(":", 1)[1]) if ":" in directory else 10
        dataset = ToneDataset(encoding=encoding, phases=phases)
    elif directory == "chirps" or directory.startswith("chirps:"):
        # Harder synthetic fixture: 8 AM/FM-chirp speakers with noise
        # bursts (datasets.py::ChirpDataset); "chirps:N" = N items/speaker.
        items = int(directory.split(":", 1)[1]) if ":" in directory else 10
        dataset = ChirpDataset(encoding=encoding, items_per_speaker=items)
    else:
        if num_shards > 1:
            # Per-host window-cache dir: the data dir is typically a
            # shared filesystem on a pod, and WindowCache's build flock
            # is only enforced within one host (data/cache.py) — two
            # hosts appending to one arena would interleave and corrupt
            # every later read. Each host decodes its own arena instead
            # (duplicated decode work, but correct).
            dataset_kwargs.setdefault(
                "cache_dir",
                os.path.join(directory, f".window_cache_h{shard_index}"),
            )
        dataset = LibriSpeech(directory, encoding=encoding, **dataset_kwargs)
    loader = DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=True,
        drop_last=True,
        num_workers=num_workers,
        seed=seed,
        shard_index=shard_index,
        num_shards=num_shards,
    )
    return loader, len(dataset.speaker_ids)
