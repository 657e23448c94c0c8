"""Independent numpy MFCC implementation for golden validation.

Written directly from the torchaudio semantics the reference model depends on
(/root/reference/vq_voice_swap/models/conv_encoder.py:42-58 constructs
``torchaudio.transforms.MFCC``), deliberately NOT sharing any code with
``vq_voice_swap_tpu/ops/mfcc.py`` so a constant error in either shows up as a
mismatch:

- ``torch.stft``: center=True reflect padding of n_fft//2, periodic Hann
  window (``torch.hann_window`` default), one-sided FFT, power-2 spectrum.
- ``Spectrogram(normalized=True)`` divides the complex STFT by
  ``window.pow(2).sum().sqrt()`` before taking the power.
- ``MelScale``: HTK mel scale, ``torch.linspace(0, sample_rate // 2,
  n_freqs)`` frequency grid, triangular filters from n_mels+2 mel-spaced
  points, no filterbank normalisation (norm=None).
- ``MFCC(log_mels=True)``: ``log(mel + 1e-6)``; ``log_mels=False``:
  ``AmplitudeToDB('power', top_db=80)`` = ``10*log10(clamp(mel, 1e-10))``
  clamped to a single global ``max - top_db`` floor across the
  whole batch (torchaudio folds the batch dim into channels for 3-D input).
- DCT-II with 'ortho' norm over the mel axis, first n_mfcc coefficients
  (validated here via scipy.fft.dct rather than an explicit matrix).

All math is float64.
"""

import numpy as np
from scipy.fft import dct


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def triangular_filterbank(n_freqs, n_mels, sample_rate):
    """[n_freqs, n_mels], built filter-by-filter (torchaudio melscale_fbanks
    semantics, different construction than ops/mfcc.py)."""
    freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    hz_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sample_rate / 2.0), n_mels + 2))
    fb = np.zeros((n_freqs, n_mels), dtype=np.float64)
    for j in range(n_mels):
        lo, center, hi = hz_pts[j], hz_pts[j + 1], hz_pts[j + 2]
        rising = (freqs - lo) / (center - lo)
        falling = (hi - freqs) / (hi - center)
        fb[:, j] = np.clip(np.minimum(rising, falling), 0.0, None)
    return fb


def mfcc_numpy(
    wav,
    sample_rate=16000,
    n_mfcc=13,
    n_fft=320,
    hop_length=160,
    n_mels=40,
    log_mels=True,
    normalized=False,
    top_db=80.0,
):
    """[N, T] float waveform -> [N, frames, n_mfcc] float64 MFCCs."""
    wav = np.asarray(wav, dtype=np.float64)
    # Periodic Hann window, explicit formula (torch.hann_window default).
    n = np.arange(n_fft, dtype=np.float64)
    window = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / n_fft)

    pad = n_fft // 2
    padded = np.pad(wav, [(0, 0), (pad, pad)], mode="reflect")
    n_frames = 1 + (padded.shape[1] - n_fft) // hop_length
    frames = np.stack(
        [padded[:, i * hop_length:i * hop_length + n_fft] for i in range(n_frames)],
        axis=1,
    )
    stft = np.fft.rfft(frames * window, axis=-1)
    if normalized:
        stft = stft / np.sqrt(np.sum(window**2))
    power = np.abs(stft) ** 2

    mel = power @ triangular_filterbank(n_fft // 2 + 1, n_mels, sample_rate)
    if log_mels:
        feats = np.log(mel + 1e-6)
    else:
        db = 10.0 * np.log10(np.clip(mel, 1e-10, None))
        # Global (whole-batch) floor: torchaudio's amplitude_to_DB folds the
        # leading dim of a 3-D [N, mels, time] input into "channels" and
        # takes one amax over everything (functional.py reshape to
        # (1, N, mels, time), amax over the last three dims).
        floor = db.max() - top_db
        feats = np.maximum(db, floor)

    return dct(feats, type=2, axis=-1, norm="ortho")[..., :n_mfcc]


def deltas_numpy(seq):
    """Reference conv_encoder.py:123-129 deltas over the frame axis of
    [N, frames, C]: (right_shift - left_shift) / 2 with edge replication."""
    right = np.concatenate([seq[:, :1], seq[:, :-1]], axis=1)
    left = np.concatenate([seq[:, 1:], seq[:, -1:]], axis=1)
    return (right - left) / 2.0


def mfcc_features_numpy(wav, version=1, input_rate=16000, mfcc_rate=100, input_ulaw=True):
    """Full reference MFCC frontend (conv_encoder.py:93-99): optional µ-law
    inversion, MFCC, delta, delta-delta, concat -> [N, frames, 39]."""
    wav = np.asarray(wav, dtype=np.float64)
    if input_ulaw:
        mu = 255.0
        wav = np.sign(wav) * (1.0 / mu) * ((1.0 + mu) ** np.abs(wav) - 1.0)
    if version == 2:
        n_fft = round(400 * input_rate / 16000)
    else:
        n_fft = (input_rate // mfcc_rate) * 2
    h = mfcc_numpy(
        wav,
        sample_rate=input_rate,
        n_fft=n_fft,
        hop_length=input_rate // mfcc_rate,
        n_mels=40 if version == 1 else 80,
        log_mels=version == 1,
        normalized=version == 2,
    )
    d1 = deltas_numpy(h)
    d2 = deltas_numpy(d1)
    return np.concatenate([h, d1, d2], axis=-1)
