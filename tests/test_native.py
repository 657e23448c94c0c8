"""Native audio-kernel tests (built on demand; numpy fallback must agree)."""

import numpy as np
import pytest

from vq_voice_swap_tpu.data.audio_io import decode_u_law, encode_u_law
from vq_voice_swap_tpu.data.native import (
    batch_gather_windows,
    build_native,
    get_native,
)


@pytest.fixture(scope="module")
def native():
    if get_native() is None and not build_native():
        pytest.skip("native toolchain unavailable")
    return get_native()


def test_pcm16_to_f32(native):
    pcm = np.asarray([-32768, -1, 0, 1, 16384, 32767], np.int16)
    out = np.frombuffer(native.pcm16_to_f32(pcm.tobytes()), np.float32)
    np.testing.assert_allclose(out, pcm.astype(np.float32) / 32768.0)


def test_ulaw_matches_numpy(native):
    x = np.linspace(-1, 1, 257).astype(np.float32)
    enc = np.frombuffer(native.ulaw_encode(x.tobytes()), np.float32)
    np.testing.assert_allclose(enc, encode_u_law(x), atol=1e-6)
    dec = np.frombuffer(native.ulaw_decode(enc.tobytes()), np.float32)
    np.testing.assert_allclose(dec, decode_u_law(enc), atol=1e-6)
    np.testing.assert_allclose(dec, x, atol=1e-5)


def test_gather_windows_matches_numpy(native):
    arena = np.random.RandomState(0).randn(1000).astype(np.float32)
    starts = np.asarray([0, 100, 950], np.int64)
    avail = np.asarray([1000, 900, 50], np.int64)  # last row needs padding
    got = batch_gather_windows(arena, starts, avail, 128)
    assert got.shape == (3, 128)
    np.testing.assert_array_equal(got[0], arena[:128])
    np.testing.assert_array_equal(got[1], arena[100:228])
    np.testing.assert_array_equal(got[2, :50], arena[950:])
    np.testing.assert_array_equal(got[2, 50:], 0)


def test_gather_windows_bounds_check(native):
    arena = np.zeros(10, np.float32)
    with pytest.raises(ValueError):
        native.gather_windows(
            memoryview(arena),
            np.asarray([8], np.int64).tobytes(),
            np.asarray([5], np.int64).tobytes(),
            5,
        )
