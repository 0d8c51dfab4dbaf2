"""librosa-compatible STFT log-mel spectrogram, batched in JAX.

The EPIC-SOUNDS frontend uses `librosa.stft(n_fft=2048, window='hann',
hop/win from cfg, pad_mode='constant')` + `librosa.filters.mel(htk=True,
norm=None)` + log(mel + 1e-6) (/root/reference/src/epic_sounds/epic_data/
audio_loader_epicsounds.py:94-125). librosa is not available here, so this
module re-implements those exact conventions:

- centered frames: input padded by n_fft//2 on both sides with zeros;
  frame t covers samples [t*hop, t*hop + n_fft) of the padded signal;
  num_frames = 1 + len(audio)//hop;
- hann window of win_length, zero-padded symmetrically to n_fft
  (librosa's pad_center), periodic hann (sym=False);
- HTK mel triangles: mel = 2595*log10(1+f/700), n_mels+2 edge frequencies
  uniform in mel between 0 and sr/2, triangle weights computed in Hz with
  peak 1.0 (norm=None).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@lru_cache(maxsize=8)
def mel_filterbank_htk(sr: float, n_fft: int, n_mels: int,
                       fmin: float = 0.0, fmax: float | None = None):
    """librosa.filters.mel(htk=True, norm=None): (n_mels, 1 + n_fft//2)."""
    if fmax is None:
        fmax = sr / 2.0
    n_bins = 1 + n_fft // 2
    fft_freqs = np.linspace(0, sr / 2.0, n_bins)
    mel_pts = np.linspace(_hz_to_mel_htk(fmin), _hz_to_mel_htk(fmax),
                          n_mels + 2)
    hz_pts = _mel_to_hz_htk(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    weights = np.zeros((n_mels, n_bins))
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0.0, np.minimum(lower, upper))
    return weights.astype(np.float32)


@lru_cache(maxsize=8)
def _hann_padded(win_length: int, n_fft: int) -> np.ndarray:
    """Periodic hann of win_length, zero-pad-centered to n_fft."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    pad = n_fft - win_length
    lpad = pad // 2
    out = np.zeros(n_fft)
    out[lpad:lpad + win_length] = w
    return out.astype(np.float32)


def stft_log_mel(
    audio: jax.Array,
    sr: float = 24000.0,
    n_fft: int = 2048,
    window_ms: float = 10.0,
    hop_ms: float = 5.0,
    n_mels: int = 128,
    eps: float = 1e-6,
) -> jax.Array:
    """Batched log-mel: audio (B, S) or (S,) -> (B, T, n_mels) with
    T = 1 + S//hop (librosa centered framing)."""
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    win_length = int(round(window_ms * sr / 1e3))
    hop = int(round(hop_ms * sr / 1e3))
    b, s = audio.shape
    t = 1 + s // hop

    x = jnp.pad(audio.astype(jnp.float32),
                [(0, 0), (n_fft // 2, n_fft // 2)])
    idx = jnp.arange(t)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = x[:, idx]  # (B, T, n_fft)
    window = jnp.asarray(_hann_padded(win_length, n_fft))
    spec = jnp.fft.rfft(frames * window[None, None, :], axis=-1)
    mag = jnp.abs(spec)  # (B, T, 1+n_fft//2)
    mel = jnp.asarray(mel_filterbank_htk(float(sr), n_fft, n_mels))
    mel_spec = jnp.einsum("btf,mf->btm", mag, mel)
    out = jnp.log(mel_spec + eps)
    return out[0] if squeeze else out
