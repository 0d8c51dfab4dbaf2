"""Kaldi fbank frontend vs an independent numpy oracle.

The reference relies on `torchaudio.compliance.kaldi.fbank` (dataloader.py:
134-135); torchaudio is not available in this environment, so the oracle here
is an independent step-by-step numpy transcription of the Kaldi algorithm
(framing, DC removal, preemphasis with edge duplication, window, power
spectrum, mel triangles on 1127*ln(1+f/700), log with eps floor) written
separately from the JAX implementation.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from aum_tpu.audio import FbankConfig, fbank


def fbank_numpy_oracle(wave, sr=16000, num_mel_bins=128, frame_shift_ms=10.0):
    """Sequential per-frame Kaldi fbank (independent of the JAX code)."""
    flen = int(sr * 25.0 / 1000)
    shift = int(sr * frame_shift_ms / 1000)
    nfft = 1
    while nfft < flen:
        nfft *= 2
    nframes = 1 + (len(wave) - flen) // shift

    n = np.arange(flen)
    window = 0.5 - 0.5 * np.cos(2 * math.pi * n / (flen - 1))

    def mel(f):
        return 1127.0 * math.log(1.0 + f / 700.0)

    low, high = 20.0, sr / 2.0
    mlow, mhigh = mel(low), mel(high)
    mdelta = (mhigh - mlow) / (num_mel_bins + 1)
    nbins = nfft // 2
    fft_freqs = [mel(k * sr / nfft) for k in range(nbins)]
    banks = np.zeros((num_mel_bins, nbins))
    for b in range(num_mel_bins):
        l, c, r = mlow + b * mdelta, mlow + (b + 1) * mdelta, mlow + (b + 2) * mdelta
        for k in range(nbins):
            f = fft_freqs[k]
            if l < f < r:
                banks[b, k] = (f - l) / (c - l) if f <= c else (r - f) / (r - c)

    out = np.zeros((nframes, num_mel_bins))
    for t in range(nframes):
        fr = wave[t * shift: t * shift + flen].astype(np.float64).copy()
        fr = fr - fr.mean()
        pre = np.empty_like(fr)
        pre[0] = fr[0] - 0.97 * fr[0]
        pre[1:] = fr[1:] - 0.97 * fr[:-1]
        fr = pre * window
        spec = np.fft.rfft(fr, nfft)
        power = np.abs(spec) ** 2
        en = banks @ power[:nbins]
        out[t] = np.log(np.maximum(en, np.finfo(np.float32).eps))
    return out


def test_fbank_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    wave -= wave.mean()
    ref = fbank_numpy_oracle(wave)
    out = np.asarray(fbank(jnp.asarray(wave), FbankConfig()))
    assert out.shape == ref.shape == (98, 128)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_fbank_batched_matches_single():
    rng = np.random.default_rng(1)
    waves = rng.standard_normal((3, 8000)).astype(np.float32) * 0.1
    cfg = FbankConfig()
    batched = np.asarray(fbank(jnp.asarray(waves), cfg))
    for i in range(3):
        single = np.asarray(fbank(jnp.asarray(waves[i]), cfg))
        np.testing.assert_allclose(batched[i], single, rtol=1e-6)


def test_frame_count_formula():
    cfg = FbankConfig()
    # 10s @16k: 1 + (160000-400)//160 = 998 frames (what the reference pads
    # to target_length=1024 for AudioSet, dataloader.py:137-147).
    assert cfg.num_frames(160000) == 998
    # 1s @16k: 98 frames (SPC-V2, padded to 128).
    assert cfg.num_frames(16000) == 98


def test_fbank_under_jit_and_tone():
    # A pure tone should put its energy near the expected mel bin.
    sr = 16000
    t = np.arange(sr) / sr
    wave = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    out = jax.jit(lambda w: fbank(w, FbankConfig()))(jnp.asarray(wave))
    m = np.asarray(out).mean(axis=0)
    peak_bin = int(m.argmax())
    # 1kHz on the 128-bin mel scale (20..8000Hz) sits around bin 55-65.
    assert 40 <= peak_bin <= 75, peak_bin
