"""Loader for the optional native (C) audio kernels.

Falls back to numpy transparently when the extension has not been built.
Build with build_native() (compiles native/audio_native.c with the local
toolchain) — a few seconds, once per machine.
"""

import importlib
import os
import subprocess
import sys


import numpy as np

__all__ = ["get_native", "build_native", "batch_gather_windows"]

_NATIVE = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )


def get_native():
    """The _audio_native module, or None when unavailable."""
    global _NATIVE, _TRIED
    if _TRIED:
        return _NATIVE
    _TRIED = True
    native_dir = os.path.join(_repo_root(), "native")
    if os.path.isdir(native_dir) and native_dir not in sys.path:
        sys.path.append(native_dir)
    try:
        _NATIVE = importlib.import_module("_audio_native")
    except ImportError:
        _NATIVE = None
    return _NATIVE


def build_native(verbose: bool = False) -> bool:
    """Compile the extension in-tree and make it importable. Returns success."""
    global _NATIVE, _TRIED
    native_dir = os.path.join(_repo_root(), "native")
    if not os.path.isdir(native_dir):
        return False
    result = subprocess.run(
        [sys.executable, "setup.py", "build_ext", "--inplace"],
        cwd=native_dir,
        capture_output=not verbose,
    )
    if result.returncode != 0:
        return False
    if native_dir not in sys.path:
        sys.path.insert(0, native_dir)
    _TRIED = False
    _NATIVE = None
    return get_native() is not None


def batch_gather_windows(
    arena: np.ndarray,
    starts: np.ndarray,
    avail: np.ndarray,
    window: int,
) -> np.ndarray:
    """[N] spans from a float32 arena -> [N, window] batch, zero-padded.

    Uses the C kernel when built (one memcpy per row, no per-row Python);
    numpy otherwise.
    """
    native = get_native()
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    avail = np.ascontiguousarray(avail, dtype=np.int64)
    if native is not None:
        raw = native.gather_windows(
            memoryview(arena), starts.tobytes(), avail.tobytes(), window
        )
        return np.frombuffer(raw, dtype=np.float32).reshape(-1, window)
    out = np.zeros((len(starts), window), dtype=np.float32)
    for i, (s, n) in enumerate(zip(starts, avail)):
        n = min(int(n), window)
        out[i, :n] = arena[int(s):int(s) + n]
    return out
