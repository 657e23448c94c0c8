"""Numerical tests for the JAX MFCC frontend (independent of torchaudio)."""

import jax.numpy as jnp
import numpy as np

from vq_voice_swap_tpu.ops.mfcc import MFCCConfig, dct_matrix, mel_filterbank, mfcc


def test_dct_matrix_orthonormal():
    d = dct_matrix(8, 8)
    np.testing.assert_allclose(d.T @ d, np.eye(8), atol=1e-5)


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(161, 40, 16000)
    assert fb.shape == (161, 40)
    assert fb.min() >= 0
    # Every interior frequency bin is covered by at least one filter.
    coverage = fb[5:-5].sum(axis=1)
    assert (coverage > 0).all()


def test_mfcc_frame_count():
    cfg = MFCCConfig()
    x = jnp.zeros((2, 16000))
    out = mfcc(x, cfg)
    # center=True: 1 + T/hop frames.
    assert out.shape == (2, 101, 13)


def test_mfcc_tone_energy():
    """A louder tone must produce a larger first MFCC coefficient (log
    energy), and the output must react to frequency content."""
    cfg = MFCCConfig()
    t = np.arange(16000) / 16000
    quiet = 0.01 * np.sin(2 * np.pi * 440 * t)
    loud = 0.5 * np.sin(2 * np.pi * 440 * t)
    other = 0.5 * np.sin(2 * np.pi * 3000 * t)
    feats = np.asarray(
        mfcc(jnp.asarray(np.stack([quiet, loud, other]), dtype=jnp.float32), cfg)
    )
    # c0 tracks log energy.
    assert feats[1, 50, 0] > feats[0, 50, 0]
    # Different frequencies produce different cepstra.
    assert np.abs(feats[1, 50] - feats[2, 50]).max() > 1.0


def test_mfcc_v2_config():
    cfg = MFCCConfig(n_fft=400, n_mels=80, log_mels=False, normalized=True)
    x = jnp.asarray(
        0.1 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)[None, :],
        dtype=jnp.float32,
    )
    out = mfcc(x, cfg)
    assert out.shape == (1, 101, 13)
    assert np.all(np.isfinite(np.asarray(out)))
