"""Tests for audio I/O, µ-law codecs, datasets, and the data loader."""

import os
import wave

import numpy as np
import pytest

from vq_voice_swap_tpu.data import (
    ChunkReader,
    ChunkWriter,
    DataLoader,
    LibriSpeech,
    ToneDataset,
    create_data_loader,
    decode_u_law,
    encode_u_law,
    lookup_audio_duration,
)


def test_ulaw_roundtrip():
    x = np.linspace(-1, 1, 101).astype(np.float32)
    y = encode_u_law(x)
    z = decode_u_law(y)
    np.testing.assert_allclose(z, x, atol=1e-5)
    assert np.abs(y).max() <= 1.0 + 1e-6
    # Companding: small values are amplified.
    assert abs(encode_u_law(np.asarray([0.01]))[0]) > 0.01


def test_tone_dataset():
    ds = ToneDataset()
    assert len(ds) == 30
    item = ds[0]
    assert item["label"] == 0
    assert item["samples"].shape == (64000,)
    assert np.abs(item["samples"]).max() <= 1.0
    # Different phases for same speaker.
    a, b = ds[0]["samples"], ds[3]["samples"]
    assert not np.allclose(a, b)
    # ulaw encoding changes values.
    ds_u = ToneDataset(encoding="ulaw")
    assert not np.allclose(ds_u[0]["samples"], ds[0]["samples"])


def test_tones_scaled_spec():
    # "tones:N" scales phases per speaker (large-batch bench fixture);
    # bare "tones" stays the 30-item contract.
    from vq_voice_swap_tpu.data import create_data_loader

    loader, num_labels = create_data_loader(
        "tones:40", batch_size=64, num_workers=0
    )
    assert num_labels == 3
    assert len(loader.dataset) == 120
    batch = next(iter(loader))
    assert batch["samples"].shape[0] == 64
    # Phases remain distinct across the widened index space.
    ds = loader.dataset
    assert not np.allclose(ds[0]["samples"], ds[117]["samples"])


def test_create_data_loader_tones():
    loader, num_labels = create_data_loader("tones", batch_size=4)
    assert num_labels == 3
    batch = next(iter(loader))
    assert batch["samples"].shape == (4, 64000)
    assert batch["label"].shape == (4,)
    assert batch["samples"].dtype == np.float32


def test_data_loader_drop_last_and_shuffle():
    ds = ToneDataset()
    loader = DataLoader(ds, batch_size=7, shuffle=True, drop_last=True,
                        num_workers=2)
    batches = list(loader)
    assert len(batches) == 30 // 7
    # Two epochs shuffle differently.
    first = np.concatenate([b["label"] for b in loader])
    second = np.concatenate([b["label"] for b in loader])
    assert not np.array_equal(first, second)


def _write_wav(path, samples, rate=16000):
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes())


def test_wav_chunk_reader_writer(tmp_path):
    path = os.path.join(tmp_path, "test.wav")
    t = np.arange(8000) / 16000
    signal = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)

    with ChunkWriter(path, 16000) as writer:
        writer.write(signal)
    assert os.path.exists(path)
    assert abs(lookup_audio_duration(path) - 0.5) < 0.05

    with ChunkReader(path, 16000) as reader:
        first = reader.read(4000)
        second = reader.read(4000)
        tail = reader.read(4000)
    np.testing.assert_allclose(first, signal[:4000], atol=1e-3)
    np.testing.assert_allclose(second, signal[4000:], atol=1e-3)
    assert tail is None or len(tail) == 0


def test_librispeech_directory(tmp_path):
    # Two speakers x one file each; 1 s clips -> single window per file.
    for speaker in ["spk_a", "spk_b"]:
        os.makedirs(os.path.join(tmp_path, speaker))
        _write_wav(
            os.path.join(tmp_path, speaker, "utt1.wav"),
            np.random.RandomState(0).randn(16000) * 0.1,
        )
    ds = LibriSpeech(str(tmp_path), window_duration=1.0)
    assert ds.speaker_ids == ["spk_a", "spk_b"]
    assert len(ds) == 2
    item = ds[0]
    assert item["samples"].shape == (16000,)
    assert item["label"] in (0, 1)
    # Index cached to disk.
    assert os.path.exists(os.path.join(tmp_path, "index.json"))
    # Re-instantiation uses the cache.
    ds2 = LibriSpeech(str(tmp_path), window_duration=1.0)
    assert len(ds2) == 2


def test_window_cache(tmp_path):
    from vq_voice_swap_tpu.data.cache import WindowCache

    wav_path = os.path.join(tmp_path, "a.wav")
    signal = np.random.RandomState(0).randn(16000).astype(np.float32) * 0.1
    _write_wav(wav_path, signal)

    cache = WindowCache(os.path.join(tmp_path, "cache"), 16000)
    cache.build([wav_path])
    win = cache.read_window(wav_path, 4000, 8000)
    np.testing.assert_allclose(win, signal[4000:12000], atol=1e-3)
    # Tail zero-padding.
    tail = cache.read_window(wav_path, 12000, 8000)
    np.testing.assert_allclose(tail[:4000], signal[12000:], atol=1e-3)
    np.testing.assert_array_equal(tail[4000:], 0)
    # Rebuilding is a no-op; reload from disk works.
    cache.build([wav_path])
    cache2 = WindowCache(os.path.join(tmp_path, "cache"), 16000)
    assert cache2.file_length(wav_path) == 16000


def test_window_cache_repairs_torn_write(tmp_path):
    """Regression: a builder killed mid-write leaves unindexed (possibly
    4-byte-misaligned) tail bytes in the arena. The next build must
    truncate back to the indexed end and re-decode — appending after the
    torn tail would shift every new span, and np.memmap('<f4') refuses a
    non-multiple-of-4 file outright (cache permanently bricked)."""
    from vq_voice_swap_tpu.data.cache import WindowCache

    rng = np.random.RandomState(3)
    sig_a = rng.randn(16000).astype(np.float32) * 0.1
    sig_b = rng.randn(16000).astype(np.float32) * 0.1
    path_a = os.path.join(tmp_path, "a.wav")
    path_b = os.path.join(tmp_path, "b.wav")
    _write_wav(path_a, sig_a)
    _write_wav(path_b, sig_b)

    cache_dir = os.path.join(tmp_path, "cache")
    cache = WindowCache(cache_dir, 16000)
    cache.build([path_a])
    # Simulate a SIGKILL mid arena.write: 7 garbage bytes past the
    # indexed end (not a multiple of the 4-byte sample size).
    with open(cache.arena_path, "ab") as f:
        f.write(b"\x01" * 7)

    fresh = WindowCache(cache_dir, 16000)
    fresh.build([path_a, path_b])
    np.testing.assert_allclose(
        fresh.read_window(path_a, 0, 8000), sig_a[:8000], atol=1e-3
    )
    np.testing.assert_allclose(
        fresh.read_window(path_b, 0, 8000), sig_b[:8000], atol=1e-3
    )
    assert os.path.getsize(fresh.arena_path) % 4 == 0


def test_window_cache_concurrent_builder_refreshes_mmap(tmp_path):
    """Regression: when another process extended the arena while we waited
    on the build lock, build() must re-open the (now too-short) mmap even
    on its early 'nothing left to do' path — a stale mmap would silently
    zero-pad reads of the newly cached file."""
    from vq_voice_swap_tpu.data.cache import WindowCache

    rng = np.random.RandomState(2)
    sig_a = rng.randn(16000).astype(np.float32) * 0.1
    sig_b = rng.randn(16000).astype(np.float32) * 0.1
    path_a = os.path.join(tmp_path, "a.wav")
    path_b = os.path.join(tmp_path, "b.wav")
    _write_wav(path_a, sig_a)
    _write_wav(path_b, sig_b)

    cache_dir = os.path.join(tmp_path, "cache")
    ours = WindowCache(cache_dir, 16000)
    ours.build([path_a])
    # Open the mmap at the one-file arena size.
    ours.read_window(path_a, 0, 100)

    # "Concurrent" builder (another process) extends the arena.
    other = WindowCache(cache_dir, 16000)
    other.build([path_a, path_b])

    # Our build() takes the early return (other already cached b) but must
    # still serve b's real samples, not zero padding from a stale mmap.
    ours.build([path_a, path_b])
    win = ours.read_window(path_b, 0, 8000)
    np.testing.assert_allclose(win, sig_b[:8000], atol=1e-3)


def test_librispeech_cached_matches_direct(tmp_path):
    os.makedirs(os.path.join(tmp_path, "spk"))
    signal = np.random.RandomState(1).randn(16000).astype(np.float32) * 0.1
    _write_wav(os.path.join(tmp_path, "spk", "u.wav"), signal)
    ds_cached = LibriSpeech(str(tmp_path), window_duration=1.0, use_cache=True)
    ds_direct = LibriSpeech(str(tmp_path), window_duration=1.0, use_cache=False)
    np.testing.assert_allclose(
        ds_cached[0]["samples"], ds_direct[0]["samples"], atol=1e-4
    )


def test_librispeech_windowing(tmp_path):
    os.makedirs(os.path.join(tmp_path, "spk"))
    _write_wav(os.path.join(tmp_path, "spk", "long.wav"),
               np.zeros(32000, np.float32))  # 2 s
    ds = LibriSpeech(str(tmp_path), window_duration=1.0, window_spacing=0.5)
    # total usable = 2 - 0.05 slack; windows at 0.0, 0.5 (1.0+1 >= end)
    assert len(ds) == 2
    offsets = sorted(w.offset for w in ds.windows)
    assert offsets == [0, 8000]


def test_data_loader_bounded_readahead():
    """The loader must NOT precompute the whole epoch when the consumer is
    slow: outstanding work is bounded by num_workers + prefetch (memory
    safety for LibriSpeech-scale epochs)."""
    import threading
    import time as _time

    computed = []
    lock = threading.Lock()

    class CountingDataset:
        def __len__(self):
            return 400

        def __getitem__(self, i):
            with lock:
                computed.append(i)
            return {"label": 0, "samples": np.zeros(16, np.float32)}

        speaker_ids = [0]

    from vq_voice_swap_tpu.data.loader import DataLoader

    loader = DataLoader(
        CountingDataset(), batch_size=4, num_workers=2, prefetch=2,
        shuffle=False,
    )
    it = iter(loader)
    next(it)
    next(it)
    _time.sleep(0.5)  # give an eager producer time to run away
    with lock:
        done = len(computed)
    # 100 batches total; bounded readahead keeps us far below the epoch.
    assert done <= 4 * (2 + 2 + 4), f"producer ran ahead: {done} items"
    # Drain to let the thread exit cleanly; all batches still arrive.
    rest = list(it)
    assert len(rest) == 98


def test_loader_early_abandon_releases_producer():
    """Breaking out of iteration mid-epoch (what loop(max_steps=N) does)
    must release the producer thread and its executor, not leave them
    pinned on a full queue."""
    import gc
    import threading
    import time as _time

    from vq_voice_swap_tpu.data import create_data_loader

    before = threading.active_count()
    loader, _ = create_data_loader("tones", batch_size=2)
    for _ in range(3):
        it = iter(loader)
        next(it)
        it.close()  # what GC of an abandoned generator does
    gc.collect()
    deadline = _time.time() + 10
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.1)
    assert threading.active_count() <= before + 1, (
        f"{threading.active_count() - before} leaked threads"
    )


def test_loader_batch_larger_than_dataset_raises():
    from vq_voice_swap_tpu.data import create_data_loader

    loader, _ = create_data_loader("tones", batch_size=1000)
    with pytest.raises(ValueError, match="batch_size"):
        next(iter(loader))


class _IndexDataset:
    """Dataset whose label IS the index — for shard/ordering assertions."""

    def __init__(self, n):
        self.n = n
        self.speaker_ids = [0]

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"label": i, "samples": np.zeros(8, np.float32)}


def test_loader_sentinel_survives_full_queue():
    """Regression: a slow consumer keeps the prefetch queue full, so the
    end-of-epoch sentinel must use a blocking (stop-aware) put. With the
    old put_nowait the sentinel was dropped and iteration hung forever
    after the last batch."""
    import threading
    import time as _time

    loader = DataLoader(
        _IndexDataset(12), batch_size=1, num_workers=2, prefetch=1,
        shuffle=False,
    )
    got = []
    done = threading.Event()

    def consume():
        for batch in loader:
            got.append(int(batch["label"][0]))
            _time.sleep(0.05)  # slower than decode => queue stays full
        done.set()

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    assert done.wait(timeout=30), (
        f"iteration hung at epoch boundary after {len(got)}/12 batches"
    )
    assert got == list(range(12))


def test_loader_host_sharding_is_a_global_epoch():
    """num_shards hosts with the SAME seed take equal-size disjoint slices
    of one shared permutation: no sample repeats within a global step's
    worth of shards and the union covers the epoch."""
    n, shards = 31, 3
    per_shard = []
    for k in range(shards):
        loader = DataLoader(
            _IndexDataset(n), batch_size=5, num_workers=1, seed=7,
            shard_index=k, num_shards=shards,
        )
        assert len(loader) == (n // shards) // 5
        labels = np.concatenate([b["label"] for b in loader])
        per_shard.append(set(int(x) for x in labels))
        assert len(per_shard[-1]) == 10  # 31 -> 30 usable -> 10/shard
    # Disjoint across shards.
    assert len(set.union(*per_shard)) == sum(len(s) for s in per_shard)


def test_loader_shard_epochs_decorrelated_across_hosts():
    """Regression: host k's epoch e must not replay host k+1's epoch e-1
    (the old per-host `seed + process_index` offset collided with the
    per-epoch `seed + epoch` increment)."""
    def epoch_labels(shard, n_epochs):
        loader = DataLoader(
            _IndexDataset(30), batch_size=5, num_workers=1, seed=3,
            shard_index=shard, num_shards=2,
        )
        return [
            tuple(int(x) for b in loader for x in b["label"])
            for _ in range(n_epochs)
        ]

    host0 = epoch_labels(0, 3)
    host1 = epoch_labels(1, 3)
    for e in range(1, 3):
        assert host0[e] != host1[e - 1]
        assert host1[e] != host0[e - 1]


def test_loader_shard_index_validation():
    with pytest.raises(ValueError, match="shard"):
        DataLoader(_IndexDataset(10), batch_size=2, shard_index=2,
                   num_shards=2)


def _fake_ffmpeg_popen(script_for_fd):
    """Popen replacement for the audio_io ffmpeg paths: parses the
    pipe:<fd> from the ffmpeg argv and runs `sh -c script` with that fd
    inherited, so the pipe plumbing is exercised without ffmpeg."""
    import subprocess

    import sys

    real_popen = subprocess.Popen  # monkeypatch replaces the module attr

    def popen(cmd, *args, pass_fds=(), **kw):
        fds = [
            int(a.split(":")[1]) for a in cmd if str(a).startswith("pipe:")
        ]
        if not fds:
            # Unrelated subprocess call (e.g. numpy.testing's lazy lscpu):
            # pass it through untouched.
            return real_popen(cmd, *args, pass_fds=pass_fds, **kw)
        # python, not sh: POSIX sh redirection only supports single-digit
        # fds and the pipe fd is usually >= 10.
        return real_popen(
            [sys.executable, "-c", script_for_fd(fds[0])], pass_fds=pass_fds,
        )

    return popen


def test_chunk_reader_raises_on_midstream_decoder_failure(
    tmp_path, monkeypatch
):
    """Regression: a decoder that dies after producing SOME samples (a
    corrupt file mid-stream) must raise, not silently truncate — the
    truncated file would otherwise feed zero-padded windows forever."""
    import vq_voice_swap_tpu.data.audio_io as aio

    raw = os.path.join(tmp_path, "raw.s16le")
    with open(raw, "wb") as f:
        f.write(np.zeros(1000, "<i2").tobytes())

    monkeypatch.setattr(aio, "have_ffmpeg", lambda: True)
    monkeypatch.setattr(
        aio.subprocess, "Popen",
        _fake_ffmpeg_popen(
            lambda fd: (
                f"import os; os.write({fd}, open({raw!r},'rb').read()); "
                f"os.close({fd}); os._exit(3)"
            )
        ),
    )
    reader = aio.ChunkReader(os.path.join(tmp_path, "x.flac"), 16000)
    with pytest.raises(RuntimeError, match="exit 3"):
        # 1000 samples arrive, then the decoder dies mid-file.
        reader.read(4000)


def test_chunk_reader_fake_ffmpeg_clean_stream(tmp_path, monkeypatch):
    """The pipe path end-to-end with a clean exit: all samples arrive,
    chunked reads cross the bounded-read loop, EOF returns None."""
    import vq_voice_swap_tpu.data.audio_io as aio

    sig = (np.sin(np.arange(5000) * 0.01) * 0.25).astype(np.float32)
    raw = os.path.join(tmp_path, "raw.s16le")
    with open(raw, "wb") as f:
        f.write((sig * 32767).astype("<i2").tobytes())

    monkeypatch.setattr(aio, "have_ffmpeg", lambda: True)
    monkeypatch.setattr(
        aio.subprocess, "Popen",
        _fake_ffmpeg_popen(
            lambda fd: (
                f"import os; os.write({fd}, open({raw!r},'rb').read()); "
                f"os.close({fd}); os._exit(0)"
            )
        ),
    )
    reader = aio.ChunkReader(os.path.join(tmp_path, "x.flac"), 16000)
    got = reader.read(1 << 40)  # huge request: bounded-read loop
    np.testing.assert_allclose(got, sig, atol=1e-3)
    assert reader.read(100) is None
    reader.close()


def test_chunk_writer_raises_on_encoder_failure(tmp_path, monkeypatch):
    """Regression: a failed encode (disk full, bad container) must raise
    at close() instead of reporting success with no usable output."""
    import vq_voice_swap_tpu.data.audio_io as aio

    monkeypatch.setattr(aio, "have_ffmpeg", lambda: True)
    monkeypatch.setattr(
        aio.subprocess, "Popen",
        _fake_ffmpeg_popen(
            lambda fd: (
                f"import os\n"
                f"while os.read({fd}, 65536):\n"
                f"    pass\n"
                f"os._exit(2)"
            )
        ),
    )
    writer = aio.ChunkWriter(os.path.join(tmp_path, "out.flac"), 16000)
    writer.write(np.zeros(100, np.float32))
    with pytest.raises(RuntimeError, match="exit 2"):
        writer.close()


def test_chirp_dataset_contract():
    """The harder synthetic fixture: 8 speakers, tones contract (4 s at
    16 kHz, float32, bounded), deterministic per index, with real
    within-speaker variance (unlike the tones fixture's pure phase
    shifts)."""
    from vq_voice_swap_tpu.data import ChirpDataset

    d = ChirpDataset(items_per_speaker=4)
    assert len(d) == 32 and len(d.speaker_ids) == 8
    a, b = d[0], d[0]
    np.testing.assert_array_equal(a["samples"], b["samples"])
    assert a["samples"].shape == (64000,)
    assert a["samples"].dtype == np.float32
    assert np.abs(a["samples"]).max() <= 0.61
    assert a["label"] == 0 and d[1]["label"] == 1 and d[9]["label"] == 1
    # within-speaker variance: same speaker, different items differ
    assert not np.array_equal(d[0]["samples"], d[8]["samples"])
    # speakers are spectrally distinct: dominant FFT bin ordering follows
    # the carrier ladder
    def peak_hz(x):
        f = np.fft.rfft(x * np.hanning(len(x)))
        return np.argmax(np.abs(f)) / 4.0  # 4 s window -> 0.25 Hz bins

    peaks = [peak_hz(d[s]["samples"]) for s in range(8)]
    assert all(p2 > p1 * 1.15 for p1, p2 in zip(peaks, peaks[1:])), peaks


def test_chirp_loader_dispatch():
    from vq_voice_swap_tpu.data import create_data_loader

    loader, n_labels = create_data_loader(
        directory="chirps:3", batch_size=8, encoding="ulaw", seed=1
    )
    assert n_labels == 8
    batch = next(iter(loader))
    assert batch["samples"].shape == (8, 64000)
    assert set(int(v) for v in batch["label"]) <= set(range(8))
