"""Kaldi-compatible log-mel filterbank frontend, on-device in JAX.

The reference computes features on the host per sample with
`torchaudio.compliance.kaldi.fbank(htk_compat=True, window_type='hanning',
num_mel_bins, dither=0.0, frame_shift=fshift)` (/root/reference/src/
dataloader.py:134-135). Here the whole frontend is a batched JAX function:
framing is a gather, the window/preemphasis are fused VPU work, the FFT is
XLA's batched rfft, and the mel projection is a single MXU matmul — so
feature extraction runs on the TPU and never stalls the input pipeline
(BASELINE.json north star).

Implements the Kaldi algorithm (snip-edges framing, per-frame DC removal,
preemphasis with edge duplication, window, power spectrum, mel-triangle bank
on 1127*ln(1+f/700) scale, log with epsilon floor) for the parameter subset
the reference uses: dither=0, use_energy=False, use_power=True,
raw_energy=True, remove_dc_offset=True, snip_edges=True,
round_to_power_of_two=True, low_freq=20, high_freq=0 (Nyquist).
With use_energy=False, `htk_compat` only affects ordering of the (absent)
energy bin, so outputs are the htk_compat outputs.

An independent numpy implementation lives in tests/test_fbank.py as the
correctness oracle.
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FbankConfig:
    sample_frequency: float = 16000.0
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    num_mel_bins: int = 128
    window_type: str = "hanning"   # hanning | povey | hamming | rectangular
    preemphasis_coefficient: float = 0.97
    remove_dc_offset: bool = True
    low_freq: float = 20.0
    high_freq: float = 0.0          # <=0 means offset from Nyquist
    use_power: bool = True

    @property
    def frame_length(self) -> int:
        return int(self.sample_frequency * self.frame_length_ms / 1000)

    @property
    def frame_shift(self) -> int:
        return int(self.sample_frequency * self.frame_shift_ms / 1000)

    @property
    def padded_window_size(self) -> int:
        # round_to_power_of_two=True
        n = 1
        while n < self.frame_length:
            n *= 2
        return n

    def num_frames(self, num_samples: int) -> int:
        # snip_edges=True
        if num_samples < self.frame_length:
            return 0
        return 1 + (num_samples - self.frame_length) // self.frame_shift


def _mel(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


@lru_cache(maxsize=16)
def _mel_banks_np(num_bins: int, window_length_padded: int, sample_freq: float,
                  low_freq: float, high_freq: float) -> np.ndarray:
    """Kaldi MelBanks weights: (num_bins, window_length_padded // 2).

    Triangles over fft bins k = 0 .. N/2 - 1 at frequencies k * fs / N
    (the Nyquist bin is excluded, matching Kaldi's num_fft_bins = N/2).
    """
    if high_freq <= 0.0:
        high_freq = 0.5 * sample_freq + high_freq
    num_fft_bins = window_length_padded // 2
    fft_bin_width = sample_freq / window_length_padded
    mel_low = _mel(low_freq)
    mel_high = _mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bins = np.zeros((num_bins, num_fft_bins), dtype=np.float64)
    fft_freqs = _mel(fft_bin_width * np.arange(num_fft_bins))
    for b in range(num_bins):
        left = mel_low + b * mel_delta
        center = mel_low + (b + 1) * mel_delta
        right = mel_low + (b + 2) * mel_delta
        up = (fft_freqs - left) / (center - left)
        down = (right - fft_freqs) / (right - center)
        bins[b] = np.maximum(0.0, np.minimum(up, down))
    return bins.astype(np.float32)


def mel_banks(cfg: FbankConfig) -> jax.Array:
    return jnp.asarray(_mel_banks_np(
        cfg.num_mel_bins, cfg.padded_window_size, cfg.sample_frequency,
        cfg.low_freq, cfg.high_freq))


@lru_cache(maxsize=16)
def _window_np(window_type: str, n: int) -> np.ndarray:
    a = 2.0 * math.pi / (n - 1)
    i = np.arange(n, dtype=np.float64)
    if window_type == "hanning":
        w = 0.5 - 0.5 * np.cos(a * i)
    elif window_type == "hamming":
        w = 0.54 - 0.46 * np.cos(a * i)
    elif window_type == "povey":
        w = (0.5 - 0.5 * np.cos(a * i)) ** 0.85
    elif window_type == "rectangular":
        w = np.ones(n)
    else:
        raise ValueError(f"unknown window type {window_type}")
    return w.astype(np.float32)


def fbank(waveform: jax.Array, cfg: FbankConfig = FbankConfig()) -> jax.Array:
    """Batched log-mel fbank.

    Args:
      waveform: (B, S) or (S,) float waveform.
      cfg: frontend configuration.

    Returns:
      (B, T, num_mel_bins) (or (T, num_mel_bins)) log-mel features, T given
      by snip-edges framing.
    """
    squeeze = waveform.ndim == 1
    if squeeze:
        waveform = waveform[None]
    b, s = waveform.shape
    flen = cfg.frame_length
    shift = cfg.frame_shift
    t = cfg.num_frames(s)
    if t == 0:
        raise ValueError(f"waveform too short: {s} < frame length {flen}")

    wave = waveform.astype(jnp.float32)
    idx = jnp.arange(t)[:, None] * shift + jnp.arange(flen)[None, :]
    frames = wave[:, idx]  # (B, T, flen)

    if cfg.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)

    if cfg.preemphasis_coefficient != 0.0:
        # Kaldi: x[i] -= coeff * x[i-1], with x[-1] := x[0] (edge duplicate).
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - cfg.preemphasis_coefficient * prev

    window = jnp.asarray(_window_np(cfg.window_type, flen))
    frames = frames * window[None, None, :]

    nfft = cfg.padded_window_size
    spec = jnp.fft.rfft(frames, n=nfft, axis=-1)
    power = jnp.abs(spec) ** 2 if cfg.use_power else jnp.abs(spec)
    power = power[..., : nfft // 2]  # drop the Nyquist bin (Kaldi)

    mel = mel_banks(cfg)  # (M, nfft//2)
    energies = jnp.einsum("btf,mf->btm", power, mel)
    # use_log_fbank with Kaldi's epsilon floor.
    energies = jnp.log(jnp.maximum(energies, np.finfo(np.float32).eps))
    return energies[0] if squeeze else energies
