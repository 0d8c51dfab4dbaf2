"""Data pipeline: WAV decode, datafiles, on-device featurization, sampling."""

import json
import os
import wave as wave_mod

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aum_tpu.audio import FbankConfig, fbank, mixup_waveforms, spec_augment
from aum_tpu.data import (
    AudioConf,
    AudioJsonDataset,
    BatchPipeline,
    balanced_sample_weights,
    load_wav,
)


def write_wav(path, wave, sr=16000):
    data = np.clip(wave * 32767.0, -32768, 32767).astype("<i2")
    with wave_mod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(data.tobytes())


@pytest.fixture()
def tiny_dataset(tmp_path):
    rng = np.random.default_rng(0)
    entries = []
    for i in range(8):
        path = str(tmp_path / f"clip{i}.wav")
        dur = rng.integers(8000, 20000)
        write_wav(path, rng.standard_normal(dur) * 0.1)
        entries.append({"wav": path, "labels": f"/m/{i % 3}"})
    datafile = tmp_path / "data.json"
    datafile.write_text(json.dumps({"data": entries}))
    label_csv = tmp_path / "labels.csv"
    label_csv.write_text(
        "index,mid,display_name\n" + "\n".join(
            f"{i},/m/{i},class{i}" for i in range(3)))
    conf = AudioConf(target_length=128, mixup=0.0, freqm=0, timem=0,
                     mean=-5.0, std=4.0)
    return AudioJsonDataset(str(datafile), conf, str(label_csv))


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(5000) * 0.2).astype(np.float32)
    path = str(tmp_path / "x.wav")
    write_wav(path, wav)
    got, sr = load_wav(path)
    assert sr == 16000
    np.testing.assert_allclose(got, np.clip(wav, -1, 1), atol=1e-4)


def test_dataset_waveform_padding(tiny_dataset):
    conf = tiny_dataset.conf
    wave, n_frames = tiny_dataset.waveform(0)
    assert wave.shape == (conf.target_samples,)
    assert 0 < n_frames <= conf.target_length


def test_featurize_matches_reference_pad_semantics(tiny_dataset):
    """Device zero-pads fbank rows past n_frames — exactly the reference's
    ZeroPad2d-on-fbank (dataloader.py:137-147), pre-normalization."""
    conf = tiny_dataset.conf
    wave, n_frames = tiny_dataset.waveform(1)
    from aum_tpu.data.pipeline import make_featurize

    feat = make_featurize(conf, train=False)
    out = feat(jax.random.PRNGKey(0), wave[None], np.array([n_frames]),
               np.zeros((1, 3), np.float32))
    x = np.asarray(out["x"])[0]
    assert x.shape == (conf.target_length, conf.num_mel_bins)
    # Padded rows are (0 - mean) / (2 std) of 0 pre-norm:
    expected_pad = (0.0 - conf.mean) / (2 * conf.std)
    if n_frames < conf.target_length:
        np.testing.assert_allclose(x[n_frames:], expected_pad, atol=1e-6)
    # Real rows match a direct fbank of the unpadded wave.
    direct = np.asarray(fbank(jnp.asarray(wave), FbankConfig()))
    direct = (direct - conf.mean) / (2 * conf.std)
    np.testing.assert_allclose(x[:n_frames], direct[:n_frames], atol=2e-4)


def test_pipeline_batches(tiny_dataset):
    pipe = BatchPipeline(tiny_dataset, batch_size=4, train=True, seed=0,
                         num_workers=2)
    batches = list(pipe.batches(epoch=1))
    assert len(batches) == 2
    for b in batches:
        assert b["x"].shape == (4, 128, 128)
        assert b["y"].shape == (4, 3)
    # Deterministic per (seed, epoch); different across epochs.
    again = list(pipe.batches(epoch=1))
    np.testing.assert_allclose(np.asarray(batches[0]["x"]),
                               np.asarray(again[0]["x"]))


def test_balanced_weights(tiny_dataset):
    w = balanced_sample_weights(tiny_dataset)
    assert w.shape == (8,)
    # class 0 appears 3x (clips 0,3,6), class 2 appears 2x (clips 2,5):
    # rarer-class samples get larger weight.
    assert w[2] > w[0]


def test_mixup_labels_and_shapes():
    key = jax.random.PRNGKey(0)
    waves = jax.random.normal(jax.random.PRNGKey(1), (8, 4000))
    labels = jax.nn.one_hot(jnp.arange(8) % 3, 3)
    mixed, ml = mixup_waveforms(key, waves, labels, mixup_rate=1.0)
    assert mixed.shape == waves.shape
    np.testing.assert_allclose(np.asarray(ml.sum(1)), 1.0, atol=1e-5)
    # rate 0 -> identity labels
    _, ml0 = mixup_waveforms(key, waves, labels, mixup_rate=0.0)
    np.testing.assert_allclose(np.asarray(ml0), np.asarray(labels))


def test_mixup_partner_pool_widens_partners():
    """Partner pool (previous batch) draws: mixed labels must include mass
    from pool-only classes when every partner comes from the pool."""
    waves = jnp.zeros((8, 4000))
    labels = jax.nn.one_hot(jnp.zeros(8, jnp.int32), 4)  # batch: class 0
    p_waves = jnp.ones((8, 4000))
    p_labels = jax.nn.one_hot(3 * jnp.ones(8, jnp.int32), 4)  # pool: class 3
    found_pool_partner = False
    for s in range(6):
        _, ml = mixup_waveforms(jax.random.PRNGKey(s), waves, labels,
                                mixup_rate=1.0, partner_wave=p_waves,
                                partner_labels=p_labels)
        np.testing.assert_allclose(np.asarray(ml.sum(1)), 1.0, atol=1e-5)
        if np.asarray(ml[:, 3]).sum() > 0:
            found_pool_partner = True
    assert found_pool_partner  # P(no pool partner in 48 draws) = 2^-48


def test_spec_augment_masks_within_bounds():
    key = jax.random.PRNGKey(3)
    fb = jnp.ones((4, 100, 128))
    out = np.asarray(spec_augment(key, fb, freq_mask_param=20,
                                  time_mask_param=30))
    assert out.shape == (4, 100, 128)
    assert (out == 0).any()  # some masking happened
    frac_masked = (out == 0).mean()
    assert frac_masked < 0.5


def test_native_decoder_matches_python(tmp_path):
    from aum_tpu.data.native import decode_wav_batch, native_available

    if not native_available():
        pytest.skip("native wav library not built")
    rng = np.random.default_rng(5)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"n{i}.wav")
        write_wav(p, rng.standard_normal(6000 + 500 * i) * 0.2)
        paths.append(p)
    waves, n_samples, rates, statuses = decode_wav_batch(paths, 8000,
                                                         threads=2)
    assert (statuses == 0).all()
    assert (rates == 16000).all()
    for i, p in enumerate(paths):
        ref, _ = load_wav(p)
        ref = ref - ref.mean()
        n = len(ref)
        assert n_samples[i] == n
        np.testing.assert_allclose(waves[i, :n], ref, atol=1e-5)
        np.testing.assert_allclose(waves[i, n:], 0.0)


def test_generic_decoder_flac_m4a_through_pipeline(tmp_path):
    """flac/m4a decode (dataloader.py:98 torchaudio.load format coverage):
    synthesized compressed fixtures flow through AudioJsonDataset +
    BatchPipeline with retry semantics intact."""
    from aum_tpu.data.native import (audio_decoder_available,
                                     decode_audio_batch, encode_test_audio)

    if not audio_decoder_available():
        pytest.skip("native generic audio library not built")
    rng = np.random.default_rng(7)
    sr = 16000
    entries = []
    ref_waves = {}
    for i, ext in enumerate(["flac", "m4a", "flac", "wav"]):
        wav = (rng.standard_normal(9000 + 700 * i) * 0.2).astype(np.float32)
        p = str(tmp_path / f"c{i}.{ext}")
        if ext == "wav":
            write_wav(p, wav)
        else:
            encode_test_audio(p, "flac" if ext == "flac" else "aac", wav, sr)
        entries.append({"wav": p, "labels": f"/m/{i % 2}"})
        ref_waves[p] = wav
    # One missing file exercises the decode-retry path (dataloader.py:163).
    entries.append({"wav": str(tmp_path / "missing.flac"), "labels": "/m/0"})
    datafile = tmp_path / "data.json"
    datafile.write_text(json.dumps({"data": entries}))
    label_csv = tmp_path / "labels.csv"
    label_csv.write_text("index,mid,display_name\n0,/m/0,a\n1,/m/1,b")
    conf = AudioConf(target_length=64, mean=-5.0, std=4.0)
    ds = AudioJsonDataset(str(datafile), conf, str(label_csv))

    # Direct dataset decode: flac is lossless within S16 quantization.
    w0, nf0 = ds.waveform(0)
    ref0 = ref_waves[entries[0]["wav"]]
    ref0 = (ref0 - ref0.mean())[: conf.target_samples]
    np.testing.assert_allclose(w0[: len(ref0)], ref0, atol=2e-4)

    # Retry path: the missing file resolves to some other clip.
    wave, n_frames, y = ds.sample(4, np.random.default_rng(0))
    assert np.isfinite(wave).all() and n_frames > 0

    # Batch pipeline (generic native batch decode on the mixed batch).
    pipe = BatchPipeline(ds, batch_size=4, train=False, num_workers=2)
    batches = list(pipe.batches(0))
    assert batches[0]["x"].shape == (4, 64, conf.num_mel_bins)
    assert np.isfinite(np.asarray(batches[0]["x"])).all()

    # And the batch decoder agrees with the single-file path on flac.
    waves, n_samples, rates, statuses = decode_audio_batch(
        [entries[0]["wav"]], conf.target_samples, threads=1)
    assert statuses[0] == 0 and rates[0] == sr
    np.testing.assert_allclose(waves[0][: len(ref0)], ref0, atol=2e-4)


def test_pipeline_native_matches_python(tiny_dataset):
    from aum_tpu.data.native import native_available

    if not native_available():
        pytest.skip("native wav library not built")
    pn = BatchPipeline(tiny_dataset, batch_size=4, train=False,
                       num_workers=2, use_native=True)
    pp = BatchPipeline(tiny_dataset, batch_size=4, train=False,
                       num_workers=2, use_native=False)
    bn = next(iter(pn.batches(0)))
    bp = next(iter(pp.batches(0)))
    np.testing.assert_allclose(np.asarray(bn["x"]), np.asarray(bp["x"]),
                               atol=2e-4)


def test_prefetcher_yields_all_and_propagates_errors():
    from aum_tpu.data.pipeline import Prefetcher

    assert list(Prefetcher(iter(range(7)))) == list(range(7))

    def boom():
        yield 1
        raise RuntimeError("decode failed")

    it = iter(Prefetcher(boom()))
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        list(it)


def test_bench_pipeline_script(capsys):
    """scripts/bench_pipeline.py smoke: tiny shapes, one epoch, prints a
    JSON line with positive rates and the native-decode flag."""
    from scripts.bench_pipeline import main as bench_main

    assert bench_main(["--n-files", "6", "--secs", "0.5", "--batch", "3",
                       "--epochs", "1", "--target-length", "64"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["host_assembly_clips_per_sec"] > 0
    assert out["assembly_plus_cpu_featurize_clips_per_sec"] > 0


def test_native_feed_rate_meets_consumption(tmp_path):
    """Feed-rate proof for the real datapath (VERDICT r4 #7): 10s WAVs
    through the csrc native decoders -> label stack -> batch assembly must
    sustain at least the measured TRAIN-step consumption rate (80 clips/s
    at B=12, docs/ROOFLINE.md) with 2x margin even on this 1-core build
    host. The reference point is scripts/bench_pipeline.py's 754 clips/s
    host-assembly measurement (ROOFLINE.md "Host input pipeline"); the
    featurize runs on-device on TPU and overlaps the step (Prefetcher), so
    host assembly is the binding feed rate. Also pins that the native C++
    decode path is actually engaged — a silent fallback to the python
    decoder is the regression most worth catching."""
    import time

    from scripts.bench_pipeline import gen_wavs
    from aum_tpu.data import AudioConf, AudioJsonDataset
    from aum_tpu.data.pipeline import BatchPipeline

    entries = gen_wavs(str(tmp_path), 24, 10.0)
    datafile = tmp_path / "data.json"
    datafile.write_text(json.dumps({"data": entries}))
    label_csv = tmp_path / "labels.csv"
    label_csv.write_text("index,mid,display_name\n" + "\n".join(
        f"{i},/m/{i},c{i}" for i in range(5)))

    conf = AudioConf(target_length=1024, mixup=0.5, freqm=48, timem=192,
                     mean=-4.2677393, std=4.5689974)
    ds = AudioJsonDataset(str(datafile), conf, str(label_csv))
    pipe = BatchPipeline(ds, batch_size=12, train=True, seed=0,
                         num_workers=4)
    assert pipe._native, "native C++ WAV decode path not engaged"
    pipe._featurize = lambda k, w, nf, y, *a: (w, nf, y)  # host-only

    for _ in pipe.batches(0):  # warm (page cache, worker spin-up)
        pass
    clips, t0 = 0, time.perf_counter()
    for epoch in (1, 2, 3):
        for b in pipe.batches(epoch):
            clips += 12
    rate = clips / (time.perf_counter() - t0)
    # 160 = 2x the 80 clips/s train consumption; measured 754 on this host
    # class, so a pass needs >4.7x degradation margin but a real pipeline
    # regression (python fallback ~100 clips/s, or quadratic assembly)
    # still fails loudly.
    assert rate >= 160.0, f"host assembly too slow: {rate:.1f} clips/s"
