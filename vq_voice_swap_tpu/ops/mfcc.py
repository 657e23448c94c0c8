"""Jittable MFCC frontend.

Replaces the reference's torchaudio.transforms.MFCC call
(/root/reference/vq_voice_swap/models/conv_encoder.py:42-58) with a pure JAX
implementation so the ConvMFCCEncoder compiles end-to-end on TPU: reflect-pad
framing, Hann-window rfft power spectrogram, HTK mel filterbank, log /
amplitude-to-dB compression, and an orthonormal DCT-II — the framing matmuls
and DCT run on the MXU.

Semantics follow torchaudio defaults: center=True reflect padding, win_length
= n_fft, power-2 spectrogram, HTK mel scale with f_min=0 / f_max=sr/2 and no
filterbank norm, and DCT-II with ortho normalisation.
"""

from typing import Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["MFCCConfig", "mfcc", "mel_filterbank", "dct_matrix"]


def _hz_to_mel_htk(f: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz_htk(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def mel_filterbank(
    n_freqs: int, n_mels: int, sample_rate: int,
    f_min: float = 0.0, f_max: Optional[float] = None,
) -> np.ndarray:
    """[n_freqs, n_mels] triangular HTK mel filterbank (no normalisation)."""
    f_max = f_max or sample_rate / 2.0
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(_hz_to_mel_htk(np.asarray(f_min)),
                        _hz_to_mel_htk(np.asarray(f_max)), n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                      # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]         # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def dct_matrix(n_mfcc: int, n_mels: int) -> np.ndarray:
    """[n_mels, n_mfcc] DCT-II matrix with 'ortho' normalisation."""
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)
    dct = np.cos(np.pi / n_mels * (n[:, None] + 0.5) * k[None, :])
    dct *= np.sqrt(2.0 / n_mels)
    dct[:, 0] *= 1.0 / np.sqrt(2.0)
    return dct.astype(np.float32)


class MFCCConfig:
    """Precomputed constants for an MFCC transform (host-side numpy)."""

    def __init__(
        self,
        sample_rate: int = 16000,
        n_mfcc: int = 13,
        n_fft: int = 320,
        hop_length: int = 160,
        n_mels: int = 40,
        log_mels: bool = True,
        normalized: bool = False,
        top_db: float = 80.0,
    ):
        self.sample_rate = sample_rate
        self.n_mfcc = n_mfcc
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.n_mels = n_mels
        self.log_mels = log_mels
        self.normalized = normalized
        self.top_db = top_db
        self.window = np.hanning(n_fft + 1)[:-1].astype(np.float32)
        self.fb = mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate)
        self.dct = dct_matrix(n_mfcc, n_mels)


def _frame(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """[N, T] -> [N, frames, n_fft] with center=True reflect padding."""
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n, t = x.shape
    n_frames = 1 + (t - n_fft) // hop
    idx = (jnp.arange(n_frames) * hop)[:, None] + jnp.arange(n_fft)[None, :]
    return x[:, idx]


def mfcc(x: jnp.ndarray, cfg: MFCCConfig) -> jnp.ndarray:
    """Compute MFCCs for a [N, T] float waveform -> [N, frames, n_mfcc]."""
    x = x.astype(jnp.float32)
    frames = _frame(x, cfg.n_fft, cfg.hop_length)
    frames = frames * jnp.asarray(cfg.window)[None, None, :]
    spec = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2
    if cfg.normalized:
        spec = spec / float(np.sum(cfg.window**2))
    mel = spec @ jnp.asarray(cfg.fb)  # [N, frames, n_mels]
    if cfg.log_mels:
        feats = jnp.log(mel + 1e-6)
    else:
        amin = 1e-10
        db = 10.0 * jnp.log10(jnp.maximum(mel, amin))
        # torchaudio amplitude_to_DB semantics for the 3-D [N, mels, time]
        # input MFCC produces: the leading dim is folded into "channels",
        # so the top_db floor is a SINGLE global max over the whole batch
        # (torchaudio functional.py reshapes to (1, N, mels, time) and
        # amaxes the last three dims) — NOT a per-item clamp. Yes, that
        # makes each item's features depend on its batchmates; parity with
        # the reference checkpoints requires reproducing it exactly.
        ceil = jnp.max(db) - cfg.top_db
        feats = jnp.maximum(db, ceil)
    return feats @ jnp.asarray(cfg.dct)  # [N, frames, n_mfcc]
