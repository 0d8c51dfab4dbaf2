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


def test_fbank_global_offset_invariance():
    """Per-frame DC removal makes a global waveform offset a no-op — the
    claim that lets the device pipeline skip reproducing the reference's
    exact mean-subtraction bookkeeping (dataloader.py:102/129: per-file and
    post-mix re-centering; datasets.py docstring). Pinned here so a future
    FbankConfig change (remove_dc_offset=False) can't silently invalidate
    the equivalence argument."""
    rng = np.random.default_rng(7)
    wave = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    base = np.asarray(fbank(jnp.asarray(wave), FbankConfig()))
    shifted = np.asarray(fbank(jnp.asarray(wave + 0.37), FbankConfig()))
    np.testing.assert_allclose(shifted, base, rtol=2e-5, atol=2e-5)


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


def test_kaldi_constants_pinned():
    """Property tests pinning the Kaldi constants to hand-computed literals
    (VERDICT r3 #6): mel scale edges, mel-bank triangle geometry, window
    coefficients. The formulas: mel(f) = 1127*ln(1+f/700) (Kaldi
    mel-computations.cc), hanning w[i] = 0.5 - 0.5*cos(2*pi*i/(N-1))
    (feature-window.cc — note the N-1 denominator, NOT numpy.hanning's
    periodic variant), povey = hanning**0.85. Literals evaluated
    independently in double precision from those published formulas."""
    from aum_tpu.audio.fbank import _mel, _mel_banks_np, _window_np

    # mel-scale edges for the reference's 16 kHz / low 20 Hz configuration
    np.testing.assert_allclose(_mel(20.0), 31.748578341466644, rtol=1e-12)
    np.testing.assert_allclose(_mel(8000.0), 2840.0377117383778, rtol=1e-12)

    banks = _mel_banks_np(128, 512, 16000.0, 20.0, 0.0).astype(np.float64)
    assert banks.shape == (128, 256)  # Nyquist bin EXCLUDED (num_fft_bins)
    # triangle peak of bin b sits at mel_low + (b+1)*delta with
    # delta = (mel_high - mel_low)/(num_bins + 1) = 21.769683204627217:
    # bin 0 peaks at 34.043 Hz -> between fft bins 1 (31.25 Hz) and 2;
    # the left edge (20 Hz) is below fft bin 1, so bin 0 must weight fft
    # bin 1 on the RISING slope: (mel(31.25)-mel(20))/delta.
    w01 = (_mel(31.25) - _mel(20.0)) / 21.769683204627217
    np.testing.assert_allclose(banks[0, 1], w01, rtol=1e-6)
    assert banks[0, 0] == 0.0  # DC bin below every triangle (low_freq 20)
    # last triangle's right edge is exactly high_freq = 8000 Hz = Nyquist:
    # every weight of bin 127 lies strictly inside (7660.6, 8000) Hz.
    nz = np.nonzero(banks[127])[0]
    assert nz.min() * 31.25 > 7660.0 and nz.max() * 31.25 < 8000.0
    # each fft bin in-band is claimed by at most 2 triangles which sum to 1
    # on the interior (adjacent triangles share slopes).
    colsum = banks.sum(axis=0)
    interior = slice(3, 245)  # between bin-0's peak and bin-127's peak
    np.testing.assert_allclose(colsum[interior], 1.0, atol=5e-6)
    assert int((banks > 0).sum(axis=0).max()) == 2

    # window coefficients at N=400 (25 ms @ 16 kHz)
    w = _window_np("hanning", 400).astype(np.float64)
    np.testing.assert_allclose(w[0], 0.0, atol=0)
    np.testing.assert_allclose(w[1], 6.199333200590518e-05, rtol=1e-6)
    np.testing.assert_allclose(w[100], 0.5019684113649876, rtol=1e-6)
    np.testing.assert_allclose(w[200], 0.9999845014267927, rtol=1e-6)
    np.testing.assert_allclose(w[399], 0.0, atol=1e-12)  # symmetric window
    np.testing.assert_allclose(_window_np("povey", 400)[100],
                               0.5566406644983896, rtol=1e-6)


def test_snip_edges_frame_count_edges():
    """snip_edges=True frame-count boundary cases, hand-computed
    (Kaldi feature-window.cc NumFrames: 1 + (S - 400) // 160)."""
    cfg = FbankConfig()
    assert cfg.num_frames(399) == 0
    assert cfg.num_frames(400) == 1
    assert cfg.num_frames(559) == 1
    assert cfg.num_frames(560) == 2
    assert cfg.num_frames(160000) == 998
    assert cfg.padded_window_size == 512


def test_preemphasis_edge_duplication():
    """Kaldi duplicates the frame's FIRST sample for preemphasis
    (x[0] -= coeff*x[0], feature-window.cc ProcessWindow) instead of
    zero-padding. A constant frame therefore becomes uniformly
    (1-coeff)*c — including sample 0. Checked end-to-end through fbank with
    a rectangular window and DC removal off: the DC Fourier coefficient of
    the preemphasized constant frame must be 400*(1-0.97)*c; with
    zero-padding semantics sample 0 would stay c and the DC coefficient
    would be (399*0.03 + 1)*c instead."""
    c = 0.5
    cfg = FbankConfig(window_type="rectangular", remove_dc_offset=False,
                      low_freq=0.0)
    wave = np.full(400, c, np.float32)
    out = np.asarray(fbank(jnp.asarray(wave), cfg))
    # recover the power at fft bin 0 from the mel projection: with
    # low_freq=0 the first triangle's rising slope spans [0, delta] in mel,
    # so fft bin 0 (0 Hz, mel 0... weight 0 at exactly left edge) — instead
    # reconstruct via the full forward: compare against the closed-form
    # spectrum of the constant preemphasized frame.
    from aum_tpu.audio.fbank import _mel_banks_np

    frame = np.full(400, c * (1.0 - 0.97))  # edge-duplication semantics
    spec = np.fft.rfft(frame, 512)
    power = (np.abs(spec) ** 2)[:256]
    banks = _mel_banks_np(128, 512, 16000.0, 0.0, 0.0).astype(np.float64)
    want = np.log(np.maximum(banks @ power, np.finfo(np.float32).eps))
    np.testing.assert_allclose(out[0], want, rtol=2e-4, atol=2e-4)
    # and the zero-padding variant is measurably different (sanity that the
    # test discriminates):
    frame_zp = frame.copy()
    frame_zp[0] = c
    spec_zp = np.fft.rfft(frame_zp, 512)
    power_zp = (np.abs(spec_zp) ** 2)[:256]
    want_zp = np.log(np.maximum(banks @ power_zp,
                                np.finfo(np.float32).eps))
    assert np.abs(want_zp - want).max() > 0.1


def test_verify_ckpt_features_mode(tmp_path):
    """scripts/verify_ckpt.py --features: record raw per-clip fbanks, then
    compare clip-by-clip (the frontend-parity drill for real-checkpoint
    day, VERDICT r3 #6); a perturbed golden must FAIL."""
    import wave as wave_mod

    from scripts.verify_ckpt import main as verify_main

    rng = np.random.default_rng(7)
    paths = []
    for i, n in enumerate((16000, 8000)):
        w = (rng.standard_normal(n) * 0.05).astype(np.float32)
        data = np.clip(w * 32767.0, -32768, 32767).astype("<i2")
        p = str(tmp_path / f"c{i}.wav")
        with wave_mod.open(p, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(16000)
            f.writeframes(data.tobytes())
        paths.append(p)

    golden = str(tmp_path / "feat.npz")
    assert verify_main(["--wav", *paths,
                        "--features-record-to", golden]) == 0
    g = np.load(golden)
    assert g["clip_000"].shape == (98, 128)
    assert g["clip_001"].shape == (48, 128)
    assert verify_main(["--wav", *paths, "--features", golden]) == 0
    bad = {k: g[k].copy() for k in g.files}
    bad["clip_001"][3, 7] += 1.0
    badf = str(tmp_path / "bad.npz")
    np.savez(badf, **bad)
    assert verify_main(["--wav", *paths, "--features", badf]) == 1
