"""Datasets: windowed LibriSpeech-style directories and the synthetic tone
fixture.

Capability parity with /root/reference/vq_voice_swap/dataset.py:12-164:
  - create_data_loader(directory, batch_size, encoding): "tones" selects the
    synthetic dataset; anything else is treated as a LibriSpeech-style
    directory of <speaker>/.../*.flac (or *.wav) files.
  - LibriSpeech: recursive file index with probed durations cached to
    index.json; 4 s windows every 0.2 s with a 0.05 s duration-estimate
    slack; labels are the sorted speaker-directory order; items zero-pad the
    tail window.
  - ToneDataset: 3 sinusoidal "speakers" x 10 phases of 4 s audio - the
    universal no-disk test fixture.

Loading is host-side numpy (decode is I/O-bound); batches are assembled by a
background-threaded loader (loader.py) and fed to the jitted train step as
one [N, T] array per batch.
"""

import json
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Union

import numpy as np

from .audio_io import ChunkReader, encode_from_linear, lookup_audio_duration

__all__ = ["ChirpDataset", "LibriSpeech", "ToneDataset",
           "build_file_index",
           "DURATION_ESTIMATE_SLACK", "AUDIO_EXTENSIONS"]

DURATION_ESTIMATE_SLACK = 0.05
AUDIO_EXTENSIONS = (".flac", ".wav")


@dataclass
class WindowRef:
    label: int
    path: str
    offset: int


def build_file_index(data_dir: str) -> Dict[str, Union[Dict, float]]:
    """Recursive {name: duration | subdir-index} map of audio files."""
    result: Dict[str, Union[Dict, float]] = {}
    for item in sorted(os.listdir(data_dir)):
        path = os.path.join(data_dir, item)
        if item.startswith("."):
            continue
        if item.lower().endswith(AUDIO_EXTENSIONS):
            result[item] = lookup_audio_duration(path)
        elif os.path.isdir(path):
            sub = build_file_index(path)
            if sub:
                result[item] = sub
    return result


class LibriSpeech:
    """Windowed view over a LibriSpeech-style speaker directory tree."""

    def __init__(
        self,
        directory: str,
        encoding: str = "linear",
        window_duration: float = 4.0,
        window_spacing: float = 0.2,
        sample_rate: int = 16000,
        use_cache: bool = True,
        cache_dir: Optional[str] = None,
    ):
        self.directory = directory
        self.encoding = encoding
        self.window_duration = window_duration
        self.window_spacing = window_spacing
        self.sample_rate = sample_rate
        self.use_cache = use_cache

        index_path = os.path.join(directory, "index.json")
        if os.path.exists(index_path):
            with open(index_path, "rt") as f:
                self.index = json.load(f)
        else:
            self.index = build_file_index(directory)
            # Atomic write: concurrent builders (multi-host shared FS)
            # must never expose a half-written index to each other.
            tmp = f"{index_path}.{os.getpid()}.tmp"
            with open(tmp, "wt") as f:
                json.dump(self.index, f)
            os.replace(tmp, index_path)

        self.speaker_ids = sorted(self.index.keys())
        self.windows: List[WindowRef] = []
        for label, speaker in enumerate(self.speaker_ids):
            self._index_speaker(
                label, os.path.join(directory, speaker), self.index[speaker]
            )

        self.cache = None
        if use_cache:
            from .cache import WindowCache

            # cache_dir must be per-host on multi-host shared filesystems
            # (create_data_loader derives one from shard_index): the
            # build flock only serialises builders within one host.
            self.cache = WindowCache(
                cache_dir or os.path.join(directory, ".window_cache"),
                sample_rate,
            )
            self.cache.build(sorted({w.path for w in self.windows}))

    def _index_speaker(self, label: int, path: str, entry) -> None:
        for name, item in entry.items():
            sub_path = os.path.join(path, name)
            if isinstance(item, dict):
                self._index_speaker(label, sub_path, item)
                continue
            window = int(self.sample_rate * self.window_duration)
            spacing = int(self.sample_rate * self.window_spacing)
            total = int(self.sample_rate * (item - DURATION_ESTIMATE_SLACK))
            if window >= total:
                self.windows.append(WindowRef(label, sub_path, 0))
            else:
                offset = 0
                while offset + window < total:
                    self.windows.append(WindowRef(label, sub_path, offset))
                    offset += spacing

    def __len__(self) -> int:
        return len(self.windows)

    def get_batch(self, indices) -> Dict[str, np.ndarray]:
        """Vectorised batch fetch from the window cache (native gather when
        built); used by the DataLoader fast path."""
        assert self.cache is not None
        num_samples = int(self.sample_rate * self.window_duration)
        refs = [self.windows[int(i)] for i in indices]
        samples = self.cache.read_windows(
            [(r.path, r.offset) for r in refs], num_samples
        )
        samples = encode_from_linear(samples, self.encoding)
        labels = np.asarray([r.label for r in refs], np.int32)
        return {"label": labels, "samples": samples.astype(np.float32)}

    def __getitem__(self, index: int) -> Dict[str, Union[int, np.ndarray]]:
        ref = self.windows[index]
        num_samples = int(self.sample_rate * self.window_duration)
        if self.cache is not None:
            samples = self.cache.read_window(ref.path, ref.offset, num_samples)
            samples = encode_from_linear(samples, self.encoding)
        else:
            with ChunkReader(
                ref.path, self.sample_rate, encoding=self.encoding
            ) as reader:
                if ref.offset:
                    reader.read(ref.offset)  # seek by discarding
                samples = reader.read(num_samples)
            if samples is None:
                samples = np.zeros(0, dtype=np.float32)
            if len(samples) < num_samples:
                samples = np.pad(samples, (0, num_samples - len(samples)))
        return {"label": ref.label, "samples": samples.astype(np.float32)}


class ToneDataset:
    """Synthetic dataset: each "speaker" is a sine frequency, each item a
    phase shift — deterministic, diskless, the universal test fixture."""

    def __init__(self, encoding: str = "linear", sample_rate: int = 16000,
                 num_samples: int = 64000, phases: int = 10):
        self.encoding = encoding
        self.sample_rate = sample_rate
        self.num_samples = num_samples
        self.phases = phases
        self.speaker_ids = [300, 500, 1000]

    def __len__(self) -> int:
        return len(self.speaker_ids) * self.phases

    def __getitem__(self, index: int) -> Dict[str, Union[int, np.ndarray]]:
        speaker = index % len(self.speaker_ids)
        freq = self.speaker_ids[speaker]
        phase = (index // len(self.speaker_ids)) / self.phases
        t = np.arange(self.num_samples, dtype=np.float32) / self.sample_rate
        samples = np.sin((t + phase) * (2 * np.pi * freq)).astype(np.float32)
        samples = encode_from_linear(samples, self.encoding)
        return {"label": speaker, "samples": samples}


class ChirpDataset:
    """Harder synthetic fixture: 8 "speakers", each a distinct NON-stationary
    voice — an FM chirp (speaker-specific carrier + sweep depth) with a
    second harmonic, amplitude tremolo, and Hann-windowed noise bursts —
    at the tones contract (4 s at 16 kHz, |x| <= ~0.6, deterministic,
    diskless). Built to test whether sampler-quality rankings measured on
    the 3-pure-tone manifold survive off it (the tones fixture generalized:
    reference dataset.py:124-151 is the 3-sine ToneDataset this hardens).

    Every item is fully determined by (speaker, item): speaker fixes the
    timbre parameters, the item index seeds phases/sweep direction/burst
    placement — real within-speaker variance, unlike the tones fixture's
    pure phase shifts.
    """

    def __init__(self, encoding: str = "linear", sample_rate: int = 16000,
                 num_samples: int = 64000, items_per_speaker: int = 10):
        self.encoding = encoding
        self.sample_rate = sample_rate
        self.num_samples = num_samples
        self.items_per_speaker = items_per_speaker
        self.speaker_ids = list(range(8))

    def __len__(self) -> int:
        return len(self.speaker_ids) * self.items_per_speaker

    def __getitem__(self, index: int) -> Dict[str, Union[int, np.ndarray]]:
        n_spk = len(self.speaker_ids)
        speaker = index % n_spk
        item = index // n_spk
        rng = np.random.RandomState(speaker * 100003 + item)
        sr = self.sample_rate
        n = self.num_samples
        t = np.arange(n, dtype=np.float64) / sr
        dur = n / sr

        # Speaker timbre (fixed per speaker).
        f0 = 180.0 * (1.32 ** speaker)          # 180 Hz .. ~1.25 kHz
        fm_depth = 0.20 + 0.05 * speaker        # sweep ratio over the clip
        am_rate = 1.5 + 0.9 * speaker           # tremolo Hz
        am_depth = 0.20 + 0.05 * speaker
        h2 = 0.12 + 0.04 * speaker              # 2nd-harmonic weight
        bursts_per_sec = 0.5 + 0.5 * (speaker % 4)

        # Item variance: phases, sweep direction, burst placement.
        phase0 = rng.uniform(0.0, 1.0)
        sweep = 1.0 if item % 2 == 0 else -1.0
        inst_freq = f0 * (1.0 + fm_depth * sweep * (t / dur - 0.5))
        ph = 2 * np.pi * (np.cumsum(inst_freq) / sr + phase0)
        wave = np.sin(ph) + h2 * np.sin(2.0 * ph + 1.3)
        trem = np.sin(2 * np.pi * am_rate * t + 2 * np.pi * rng.uniform())
        wave *= 1.0 - am_depth * 0.5 * (1.0 + trem)

        for _ in range(rng.poisson(bursts_per_sec * dur)):
            c = rng.randint(0, n)
            w = rng.randint(sr // 33, sr // 12)  # 30-80 ms half-width
            lo, hi = max(0, c - w), min(n, c + w)
            wave[lo:hi] += 0.4 * np.hanning(hi - lo) * rng.randn(hi - lo)

        wave *= 0.6 / max(1.0, np.abs(wave).max() / 0.999)
        samples = encode_from_linear(
            np.asarray(wave, dtype=np.float32), self.encoding
        )
        return {"label": speaker, "samples": samples}
