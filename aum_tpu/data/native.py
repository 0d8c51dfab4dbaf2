"""ctypes bindings for the native batch WAV decoder (csrc/wavloader.cpp).

Build with `make -C csrc` (produces aum_tpu/data/libaumwav.so). When the
library is missing, callers fall back to the pure-Python decoder in
aum_tpu.data.datasets — the pipeline works either way; the native path
removes Python from the per-sample decode loop (the role torchaudio's C++
backend plays in the reference).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "libaumwav.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.aum_decode_wav.restype = ctypes.c_int
    lib.aum_decode_wav.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int)]
    lib.aum_decode_wav_batch.restype = None
    lib.aum_decode_wav_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def decode_wav_batch(
    paths: Sequence[str],
    max_samples: int,
    threads: int = 8,
) -> Optional[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Decode a batch of WAVs natively.

    Returns (waves (n, max_samples) float32 mean-subtracted+padded,
    n_samples (n,), sample_rates (n,), statuses (n,)) or None when the
    native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.zeros((n, max_samples), np.float32)
    n_samples = np.zeros(n, np.int64)
    rates = np.zeros(n, np.int32)
    statuses = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.aum_decode_wav_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples,
        n_samples.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        threads)
    return out, n_samples, rates, statuses
