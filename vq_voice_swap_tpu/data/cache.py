"""Decoded-audio window cache.

The reference decodes audio with one ffmpeg subprocess per __getitem__ and
seeks by *reading and discarding* samples (reference dataset.py:100-110) —
the data-loading bottleneck called out in SURVEY.md §7. This cache decodes
each file once into a raw float32 arena on disk; thereafter a window read is
a single memmap slice at memory-bandwidth speed, with zero subprocesses.

Layout: <cache_dir>/arena.f32 (concatenated mono float32 at the target
sample rate) + <cache_dir>/arena_index.json mapping the source path to its
(offset, length) span and recording the sample rate.
"""

import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

from .audio_io import ChunkReader

__all__ = ["WindowCache"]

_CHUNK = 1 << 18  # samples per streaming read while building
_INDEX_EVERY = 200  # files between index checkpoints during build


class WindowCache:
    def __init__(self, cache_dir: str, sample_rate: int = 16000):
        self.cache_dir = cache_dir
        self.sample_rate = sample_rate
        os.makedirs(cache_dir, exist_ok=True)
        self.arena_path = os.path.join(cache_dir, "arena.f32")
        self.index_path = os.path.join(cache_dir, "arena_index.json")
        self.index: Dict[str, Tuple[int, int]] = {}
        self._mmap: Optional[np.memmap] = None
        self._load_index()

    def _load_index(self) -> None:
        if not os.path.exists(self.index_path):
            return
        with open(self.index_path, "rt") as f:
            meta = json.load(f)
        assert meta["sample_rate"] == self.sample_rate, (
            "cache was built at a different sample rate"
        )
        self.index = {k: tuple(v) for k, v in meta["files"].items()}

    # ------------------------------------------------------------- building

    def build(self, paths) -> None:
        """Decode any not-yet-cached files and append them to the arena.

        Safe under concurrent builders on ONE host (several loader
        processes): an exclusive flock serialises appends — interleaved
        `ab` writes from two processes would otherwise scatter both
        writers' samples through each other's index spans, silently
        corrupting every later read. flock is NOT reliably enforced
        across hosts on network filesystems (gcsfuse/NFS without lockd
        grant locks per-host), so multi-host pods must point each host
        at its own cache_dir.
        """
        missing = [p for p in paths if p not in self.index]
        if not missing:
            return
        import fcntl

        with open(os.path.join(self.cache_dir, ".build_lock"), "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                # Whoever held the lock may have built (part of) the cache
                # while we waited; re-read before appending — and re-open
                # the arena mmap either way: it may have grown and a stale
                # short mmap would silently zero-pad reads past its end.
                self._mmap = None
                self._load_index()
                missing = [p for p in paths if p not in self.index]
                if not missing:
                    return
                # Resume from the END OF THE INDEX, not the file size: a
                # builder killed mid-write leaves unindexed (possibly
                # 4-byte-misaligned) tail bytes; appending after them
                # would shift every new span and np.memmap('<f4') refuses
                # non-multiple-of-4 files outright. Truncate the torn
                # tail — its file was never indexed, so it re-decodes.
                offset = max(
                    (off + ln for off, ln in self.index.values()), default=0
                )
                if os.path.exists(self.arena_path):
                    if os.path.getsize(self.arena_path) != offset * 4:
                        with open(self.arena_path, "rb+") as f:
                            f.truncate(offset * 4)
                # Checkpoint the index periodically: an interrupted
                # multi-hour build must lose at most _INDEX_EVERY files of
                # work, not re-decode (and re-append a duplicate copy of)
                # everything on the next run.
                with open(self.arena_path, "ab") as arena:
                    for done, path in enumerate(missing, 1):
                        length = 0
                        with ChunkReader(path, self.sample_rate) as reader:
                            while True:
                                chunk = reader.read(_CHUNK)
                                if chunk is None or len(chunk) == 0:
                                    break
                                arena.write(
                                    np.asarray(chunk, dtype="<f4").tobytes()
                                )
                                length += len(chunk)
                        self.index[path] = (offset, length)
                        offset += length
                        if done % _INDEX_EVERY == 0:
                            arena.flush()
                            self._write_index()
                self._write_index()
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)

    def _write_index(self) -> None:
        tmp = self.index_path + ".tmp"
        with open(tmp, "wt") as f:
            json.dump(
                {"sample_rate": self.sample_rate,
                 "files": {k: list(v) for k, v in self.index.items()}},
                f,
            )
        os.replace(tmp, self.index_path)

    # -------------------------------------------------------------- reading

    def _arena(self) -> np.memmap:
        if self._mmap is None:
            self._mmap = np.memmap(self.arena_path, dtype="<f4", mode="r")
        return self._mmap

    def file_length(self, path: str) -> int:
        return self.index[path][1]

    def read_window(self, path: str, offset: int, num_samples: int) -> np.ndarray:
        """Zero-padded float32 window of a cached file."""
        base, length = self.index[path]
        start = base + min(offset, length)
        end = base + min(offset + num_samples, length)
        window = np.asarray(self._arena()[start:end], dtype=np.float32)
        if len(window) < num_samples:
            window = np.pad(window, (0, num_samples - len(window)))
        return window

    def read_windows(self, refs, num_samples: int) -> np.ndarray:
        """Batch read: refs is a list of (path, offset) -> [N, num_samples].

        Routed through the native gather kernel when built (one memcpy per
        row); otherwise a vectorised numpy fallback.
        """
        from .native import batch_gather_windows

        starts = np.empty(len(refs), np.int64)
        avail = np.empty(len(refs), np.int64)
        for i, (path, offset) in enumerate(refs):
            base, length = self.index[path]
            offset = min(offset, length)
            starts[i] = base + offset
            avail[i] = length - offset
        return batch_gather_windows(
            self._arena(), starts, avail, num_samples
        )
