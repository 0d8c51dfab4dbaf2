"""EPIC-SOUNDS pipeline: spectrogram frontend, sparse-warp SpecAugment,
HDF5 dataset, ensemble-view sampling."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aum_tpu.audio.spec_warp import (
    combined_transforms,
    dense_image_warp,
    freq_mask,
    interpolate_spline_flow,
    sparse_image_warp,
    time_mask,
    time_warp,
)
from aum_tpu.audio.spectrogram import mel_filterbank_htk, stft_log_mel
from aum_tpu.data.epic import (
    EpicAudioConfig,
    EpicBatchPipeline,
    EpicSoundsDataset,
    get_start_end_idx,
    timestamp_to_sec,
)


def test_timestamp_to_sec():
    assert np.isclose(timestamp_to_sec("00:00:01.500"), 1.5)
    assert np.isclose(timestamp_to_sec("01:02:03.250"), 3723.25)


def test_mel_filterbank_htk_shape_and_peaks():
    mel = mel_filterbank_htk(24000.0, 2048, 128)
    assert mel.shape == (128, 1025)
    # norm=None triangles peak at ~1.
    assert 0.9 < mel.max() <= 1.0 + 1e-6
    # every filter has some support
    assert (mel.sum(axis=1) > 0).all()


def test_stft_log_mel_frames_and_tone():
    sr = 24000
    t = np.arange(sr) / sr
    wave = np.sin(2 * np.pi * 2000.0 * t).astype(np.float32)
    out = np.asarray(stft_log_mel(jnp.asarray(wave), sr=sr))
    # librosa centered framing: 1 + S//hop frames, hop=120.
    assert out.shape == (1 + sr // 120, 128)
    m = out.mean(axis=0)
    # 2kHz peak lands in the right third of the HTK mel axis for fmax=12k.
    assert 30 <= int(m.argmax()) <= 90


def test_stft_log_mel_matches_numpy_oracle():
    """Independent numpy transcription of librosa's centered stft + mel."""
    rng = np.random.default_rng(0)
    sr, n_fft, hop, win = 24000, 2048, 120, 240
    wave = (rng.standard_normal(4800) * 0.1).astype(np.float32)

    padded = np.pad(wave, n_fft // 2)
    n_frames = 1 + len(wave) // hop
    w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win) / win)
    wfull = np.zeros(n_fft)
    lpad = (n_fft - win) // 2
    wfull[lpad:lpad + win] = w
    mel = np.asarray(mel_filterbank_htk(float(sr), n_fft, 128))
    ref = np.zeros((n_frames, 128))
    for t in range(n_frames):
        fr = padded[t * hop:t * hop + n_fft] * wfull
        mag = np.abs(np.fft.rfft(fr))
        ref[t] = np.log(mel @ mag + 1e-6)

    out = np.asarray(stft_log_mel(jnp.asarray(wave), sr=sr))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_spline_interpolation_exact_at_control_points():
    pts = jnp.asarray([[3.0, 10.0], [7.0, 30.0]])
    flows = jnp.asarray([[0.0, 4.0], [0.0, -2.0]])
    at_pts = interpolate_spline_flow(pts, flows, pts)
    np.testing.assert_allclose(np.asarray(at_pts), np.asarray(flows),
                               atol=1e-3)


def test_dense_image_warp_identity_and_shift():
    img = jnp.asarray(np.random.default_rng(0).standard_normal((16, 24)),
                      jnp.float32)
    flow0 = jnp.zeros((16, 24, 2))
    np.testing.assert_allclose(np.asarray(dense_image_warp(img, flow0)),
                               np.asarray(img), atol=1e-6)
    # flow of +1 in x means output(x) = img(x-1)
    flow = jnp.zeros((16, 24, 2)).at[..., 1].set(1.0)
    out = np.asarray(dense_image_warp(img, flow))
    np.testing.assert_allclose(out[:, 1:], np.asarray(img)[:, :-1], atol=1e-5)


def test_sparse_image_warp_moves_point():
    img = jnp.zeros((32, 64)).at[16, 20].set(1.0)
    src = jnp.asarray([[16.0, 20.0]])
    dst = jnp.asarray([[16.0, 25.0]])
    out = np.asarray(sparse_image_warp(img, src, dst))
    # mass should move toward x=25
    assert out[16, 23:28].sum() > out[16, 18:21].sum()


def test_masks_fill_with_mean():
    key = jax.random.PRNGKey(0)
    spec = jnp.ones((2, 100, 64)) * 3.0
    out = np.asarray(freq_mask(key, spec, F=20, num_masks=2))
    np.testing.assert_allclose(out, 3.0)  # mean of constant = constant
    spec2 = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 100, 64)), jnp.float32)
    out2 = np.asarray(time_mask(key, spec2, T=40, num_masks=2))
    assert out2.shape == spec2.shape


def test_combined_transforms_jits():
    key = jax.random.PRNGKey(1)
    spec = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 256, 128)), jnp.float32)
    fn = jax.jit(lambda k, s: combined_transforms(k, s, 48, 24, 5))
    out = np.asarray(fn(key, spec))
    assert out.shape == (2, 256, 128)
    assert np.isfinite(out).all()


def test_get_start_end_idx_uniform_views():
    starts = [get_start_end_idx(1000, 300, i, 5)[0] for i in range(5)]
    np.testing.assert_allclose(starts, np.linspace(0, 700, 5))


@pytest.fixture()
def epic_h5(tmp_path):
    import h5py
    import pandas as pd

    cfg = EpicAudioConfig(clip_secs=0.5, num_frames=64, sampling_rate=8000,
                          num_classes=5)
    rng = np.random.default_rng(0)
    with h5py.File(tmp_path / "audio.hdf5", "w") as f:
        f.create_dataset("video1", data=rng.standard_normal(40000)
                         .astype(np.float32))
        f.create_dataset("video2", data=rng.standard_normal(24000)
                         .astype(np.float32))
    rows = [
        {"participant_id": "P1", "video_id": "video1",
         "annotation_id": "a1", "start_timestamp": "00:00:00.500",
         "stop_timestamp": "00:00:03.500", "class_id": 2},
        {"participant_id": "P1", "video_id": "video2",
         "annotation_id": "a2", "start_timestamp": "00:00:00.100",
         "stop_timestamp": "00:00:00.300", "class_id": 4},  # short segment
    ]
    pd.DataFrame(rows).to_pickle(tmp_path / "ann.pkl")
    return str(tmp_path / "ann.pkl"), str(tmp_path / "audio.hdf5"), cfg


def test_epic_smoke_fixture_alignment(tmp_path):
    """scripts/epic_smoke_tpu.py's fixture must stay aligned with the
    pipeline's default SAMPLING_RATE (a review caught an 8 kHz fixture
    being indexed at 24 kHz): both the sub-clip and the >clip_secs record
    kinds must slice inside their stored audio and produce the expected
    frame counts."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from epic_smoke_tpu import build_fixture

    ann, h5 = build_fixture(str(tmp_path))
    cfg = EpicAudioConfig(num_classes=5, num_frames=128)
    ds = EpicSoundsDataset(ann, h5, cfg, split="train")
    rng = np.random.default_rng(0)
    # record 0: 0.4 s segment -> whole-segment path with REAL edge-padding
    # (0.4 s = 81 frames < the 128-frame target)
    wave, n_frames, y, _ = ds.sample(0, rng)
    assert wave.shape == (cfg.clip_samples,)
    assert n_frames < cfg.num_frames
    assert np.abs(wave[: int(0.4 * cfg.sampling_rate)]).max() > 0.05
    # record 1: 2 s sub-clip segment -> whole-segment path, frame-full
    wave1, n1, _, _ = ds.sample(1, rng)
    assert n1 == cfg.num_frames
    assert np.abs(wave1[: 2 * cfg.sampling_rate]).max() > 0.05
    # record 2: 11 s segment > clip_secs=10 -> random-window path, full clip
    wave2, n2, _, _ = ds.sample(2, rng)
    assert n2 == cfg.num_frames
    # the tail of the 10 s clip window is real audio, not padding
    assert np.abs(wave2[-cfg.sampling_rate:]).max() > 0.05


def test_epic_dataset_and_pipeline(epic_h5):
    ann, h5, cfg = epic_h5
    ds = EpicSoundsDataset(ann, h5, cfg, split="train")
    assert len(ds) == 2
    rng = np.random.default_rng(0)
    wave, n_frames, y, ridx = ds.sample(0, rng)
    assert wave.shape == (cfg.clip_samples,)
    assert y.argmax() == 2
    # short segment: whole segment used, padded
    wave2, n2, y2, _ = ds.sample(1, rng)
    assert n2 < cfg.num_frames
    assert y2.argmax() == 4

    pipe = EpicBatchPipeline(ds, batch_size=2, train=True, num_workers=1)
    batch = next(iter(pipe.batches(1)))
    assert batch["x"].shape == (2, cfg.num_frames, cfg.num_frequencies)
    assert np.isfinite(np.asarray(batch["x"])).all()

    ds_test = EpicSoundsDataset(ann, h5, cfg, split="test")
    assert len(ds_test) == 2 * cfg.num_ensemble_views
    pipe_t = EpicBatchPipeline(ds_test, batch_size=5, train=False,
                               num_workers=1)
    batches = list(pipe_t.batches())
    assert sum(b["x"].shape[0] for b in batches) == 10
    # ensemble views of the same record share its index for averaging
    assert (batches[0]["record_index"][:5] == 0).all()


def test_epic_flexi_pipeline(epic_h5):
    from aum_tpu.data.epic import EpicFlexiBatchPipeline

    ann, h5, cfg = epic_h5
    ds = EpicSoundsDataset(ann, h5, cfg, split="train")
    pipe = EpicFlexiBatchPipeline(ds, batch_size=2, train=True,
                                  num_workers=1)
    batches = list(pipe.batches(0))
    assert batches, "no flexi batches produced"
    for b in batches:
        t = b["x"].shape[1]
        assert t % 16 == 0 or t == cfg.num_frames
        assert b["x"].shape[2] == cfg.num_frequencies
        assert np.isfinite(np.asarray(b["x"])).all()


def test_epic_runner_end_to_end(epic_h5, tmp_path):
    """The EPIC branch of aum_tpu.run: yaml-free config, hdf5 pipeline,
    CE training + val, checkpoints."""
    from aum_tpu.run import main

    ann, h5, cfg = epic_h5
    exp_dir = str(tmp_path / "epicexp")
    history = main([
        "--recipe", "epic_sounds/aum-base_scratch",
        "--epic-hdf5", h5,
        "--epic-annotations-train", ann,
        "--epic-annotations-val", ann,
        "--exp-dir", exp_dir,
        "--num-workers", "1",
        "--set", "depth=2", "--set", "model_type=tiny",
        "--set", "n_class=5", "--set", "batch_size=2",
        "--set", "n_epochs=1", "--set", "dtype=float32",
        "--set", "audio_length=64", "--set", "timem=8", "--set", "freqm=8",
    ])
    assert len(history) == 1
    assert np.isfinite(history[0]["loss"])
    import os

    assert os.path.exists(os.path.join(exp_dir, "result.csv"))


def test_epic_runner_test_split_ensemble_eval(epic_h5, tmp_path):
    from aum_tpu.run import main

    ann, h5, cfg = epic_h5
    m = main([
        "--recipe", "epic_sounds/aum-base_scratch",
        "--epic-hdf5", h5,
        "--epic-annotations-test", ann,
        "--exp-dir", str(tmp_path / "epiceval"),
        "--run-type", "eval",
        "--num-workers", "1",
        "--set", "depth=2", "--set", "model_type=tiny",
        "--set", "n_class=5", "--set", "batch_size=2",
        "--set", "dtype=float32", "--set", "audio_length=64",
    ])
    assert 0.0 <= m["acc"] <= 1.0
