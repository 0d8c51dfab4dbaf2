"""ctypes bindings for the native batch audio decoders.

Two libraries, built with `make -C csrc`:
- libaumwav.so (csrc/wavloader.cpp): dependency-free RIFF/WAVE PCM decoder;
- libaumaudio.so (csrc/audiodecode.cpp): ffmpeg-backed generic decoder
  (flac / m4a / mp3 / ogg / wav — the format coverage of the reference's
  `torchaudio.load`, dataloader.py:98); built only when the system libav*
  headers exist, loaded only when the shared libs resolve.

When a library is missing, callers fall back to the pure-Python WAV decoder
in aum_tpu.data.datasets — the pipeline works either way; the native path
removes Python from the per-sample decode loop (the role torchaudio's C++
backend plays in the reference).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libaumwav.so")
_AUDIO_LIB_PATH = os.path.join(_DIR, "libaumaudio.so")
_lib = None
_audio_lib = None
_audio_lib_failed = False

_BATCH_ARGTYPES = [
    ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
    ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.c_int), ctypes.c_int]


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
    lib.aum_decode_wav_batch.argtypes = _BATCH_ARGTYPES
    _lib = lib
    return lib


def _load_audio():
    global _audio_lib, _audio_lib_failed
    if _audio_lib is not None or _audio_lib_failed:
        return _audio_lib
    if not os.path.exists(_AUDIO_LIB_PATH):
        _audio_lib_failed = True
        return None
    try:
        lib = ctypes.CDLL(_AUDIO_LIB_PATH)
    except OSError:  # libav* runtime libs absent on this host
        _audio_lib_failed = True
        return None
    lib.aum_decode_audio.restype = ctypes.c_int
    lib.aum_decode_audio.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int)]
    lib.aum_decode_audio_batch.restype = None
    lib.aum_decode_audio_batch.argtypes = _BATCH_ARGTYPES
    lib.aum_test_encode.restype = ctypes.c_int
    lib.aum_test_encode.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int]
    _audio_lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def audio_decoder_available() -> bool:
    """True when the generic (flac/m4a/...) native decoder is loadable."""
    return _load_audio() is not None


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
    return _run_batch(lib.aum_decode_wav_batch, paths, max_samples, threads)


def _run_batch(fn, paths, max_samples, threads):
    n = len(paths)
    out = np.zeros((n, max_samples), np.float32)
    n_samples = np.zeros(n, np.int64)
    rates = np.zeros(n, np.int32)
    statuses = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    fn(arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
       max_samples,
       n_samples.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
       rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
       statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
       threads)
    return out, n_samples, rates, statuses


def decode_audio_batch(
    paths: Sequence[str],
    max_samples: int,
    threads: int = 8,
) -> Optional[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Decode a batch of audio files of ANY libav-supported format.

    Same contract as decode_wav_batch; None when the generic decoder
    library is unavailable.
    """
    lib = _load_audio()
    if lib is None:
        return None
    return _run_batch(lib.aum_decode_audio_batch, paths, max_samples,
                      threads)


def decode_audio(path: str, max_samples: int):
    """Decode one file via the generic native decoder.

    Returns (wave (max_samples,) float32 mean-subtracted+padded, n_samples,
    sample_rate); raises on failure or when the library is unavailable —
    the dataset's retry loop treats that like any decode error.
    """
    lib = _load_audio()
    if lib is None:
        raise RuntimeError(
            f"no decoder for {path}: the native generic audio decoder "
            "(libaumaudio.so) is unavailable — build with `make -C csrc` "
            "(needs system libavformat/libavcodec)")
    out = np.zeros(max_samples, np.float32)
    n_samples = ctypes.c_int64(0)
    rate = ctypes.c_int(0)
    st = lib.aum_decode_audio(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples, ctypes.byref(n_samples), ctypes.byref(rate))
    if st != 0:
        raise RuntimeError(f"native audio decode failed ({st}): {path}")
    return out, int(n_samples.value), int(rate.value)


def encode_test_audio(path: str, codec: str, samples: np.ndarray,
                      sample_rate: int) -> None:
    """Test helper: synthesize a compressed fixture (codec 'flac' or 'aac')
    so the test suite never ships binary assets."""
    lib = _load_audio()
    if lib is None:
        raise RuntimeError("native audio library unavailable")
    s = np.ascontiguousarray(samples, np.float32)
    st = lib.aum_test_encode(
        path.encode(), codec.encode(),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(s),
        sample_rate)
    if st != 0:
        raise RuntimeError(f"test encode failed ({st}): {codec} -> {path}")
