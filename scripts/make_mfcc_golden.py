"""Generate the committed MFCC golden vectors (tests/golden/mfcc_golden.npz).

Inputs are fixed, deterministic waveforms; expected outputs come from the
independent float64 numpy implementation in tests/mfcc_reference.py. Re-run
this script only if the golden protocol itself changes; tests also recompute
the numpy reference so silent drift of either side fails loudly.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from mfcc_reference import mfcc_features_numpy, mfcc_numpy  # noqa: E402


def fixed_inputs():
    rng = np.random.RandomState(1234)
    noise = (0.3 * rng.randn(2, 4000)).clip(-1, 1)
    t = np.arange(4000) / 16000.0
    chirp = 0.5 * np.sin(2 * np.pi * (200 + 1500 * t) * t)
    tones = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 3000 * t)
    mix = np.stack([chirp, tones]) + 0.01 * rng.randn(2, 4000)
    return np.concatenate([noise, mix]).astype(np.float64)  # [4, 4000]


def main():
    wav = fixed_inputs()
    v1 = mfcc_numpy(wav, n_fft=320, hop_length=160, n_mels=40,
                    log_mels=True, normalized=False)
    v2 = mfcc_numpy(wav, n_fft=400, hop_length=160, n_mels=80,
                    log_mels=False, normalized=True)
    feats_v1 = mfcc_features_numpy(wav, version=1, input_ulaw=True)
    feats_v2 = mfcc_features_numpy(wav, version=2, input_ulaw=False)

    out_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "mfcc_golden.npz")
    np.savez_compressed(
        path, wav=wav, mfcc_v1=v1, mfcc_v2=v2,
        features_v1_ulaw=feats_v1, features_v2_linear=feats_v2,
    )
    print(f"wrote {path}")
    for k, v in [("mfcc_v1", v1), ("mfcc_v2", v2),
                 ("features_v1_ulaw", feats_v1), ("features_v2_linear", feats_v2)]:
        print(f"  {k}: shape={v.shape} mean={v.mean():.6f} std={v.std():.6f}")


if __name__ == "__main__":
    main()
