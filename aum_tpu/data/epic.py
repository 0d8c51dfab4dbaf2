"""EPIC-SOUNDS dataset pipeline: HDF5 audio store + annotation records.

Rebuild of /root/reference/src/epic_sounds/epic_data/{epicsounds,
epicsounds_record,audio_loader_epicsounds,build,loader}.py for the TPU
division of labor: the host slices fixed-length sample windows out of the
HDF5 store; the librosa-compatible log-mel (aum_tpu.audio.spectrogram) and
the sparse-warp SpecAugment (aum_tpu.audio.spec_warp) run batched on device.

Preserved semantics:
- annotation records: pandas-pickled rows with HH:MM:SS.fff timestamps ->
  sample indices (epicsounds_record.py:12-44);
- clip sampling: train = random window in the segment, test = uniform
  NUM_ENSEMBLE_VIEWS windows (audio_loader_epicsounds.py:25-53); segments
  shorter than the clip use the whole segment;
- log-mel frames edge-padded ("edge" mode, i.e. the last real frame
  repeated) or cropped to NUM_FRAMES (audio_loader_epicsounds.py:137-141) —
  done on device via the per-clip true frame count;
- train-time combined_transforms (time_warp + masks) then one-hot labels
  (epicsounds.py:116-133).
"""

from __future__ import annotations

import dataclasses
import time as _time
from datetime import timedelta
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aum_tpu.audio.spec_warp import combined_transforms
from aum_tpu.audio.spectrogram import stft_log_mel


def timestamp_to_sec(timestamp: str) -> float:
    """HH:MM:SS.fff -> seconds (epicsounds_record.py:4-10)."""
    x = _time.strptime(timestamp, "%H:%M:%S.%f")
    sec = float(timedelta(hours=x.tm_hour, minutes=x.tm_min,
                          seconds=x.tm_sec).total_seconds())
    return sec + float(timestamp.split(".")[-1]) / 1000


@dataclasses.dataclass(frozen=True)
class EpicAudioConfig:
    """AUDIO_DATA + augmentation keys of config_default.yaml."""

    clip_secs: float = 10.0
    hop_length_ms: float = 5.0
    num_frames: int = 1024
    num_frequencies: int = 128
    sampling_rate: int = 24000
    window_length_ms: float = 10.0
    t_mask: int = 192
    f_mask: int = 48
    t_warp: int = 5
    num_ensemble_views: int = 5
    num_classes: int = 44
    mean: float = -6.627534
    std: float = 4.4917786

    @property
    def clip_samples(self) -> int:
        return int(round(self.sampling_rate * self.clip_secs))

    @property
    def hop_samples(self) -> int:
        return int(round(self.hop_length_ms * self.sampling_rate / 1e3))

    @staticmethod
    def from_yaml(path: str, **overrides) -> "EpicAudioConfig":
        import yaml

        with open(path) as f:
            cfg = yaml.safe_load(f)
        ad = cfg.get("AUDIO_DATA", {})
        kw = dict(
            clip_secs=ad.get("CLIP_SECS", 10),
            hop_length_ms=ad.get("HOP_LENGTH", 5),
            num_frames=ad.get("NUM_FRAMES", 1024),
            num_frequencies=ad.get("NUM_FREQUENCIES", 128),
            sampling_rate=ad.get("SAMPLING_RATE", 24000),
            window_length_ms=ad.get("WINDOW_LENGTH", 10),
            t_mask=cfg.get("T_MASK", 192),
            f_mask=cfg.get("F_MASK", 48),
            t_warp=cfg.get("T_WARP", 5),
            num_ensemble_views=cfg.get("TEST", {}).get(
                "NUM_ENSEMBLE_VIEWS", 5),
        )
        kw.update(overrides)
        return EpicAudioConfig(**kw)


class EpicSoundsRecord:
    def __init__(self, series, sampling_rate: int = 24000):
        self._series = series
        self.sampling_rate = sampling_rate

    @property
    def video_id(self):
        return self._series["video_id"]

    @property
    def start_audio_sample(self) -> int:
        return int(timestamp_to_sec(self._series["start_timestamp"])
                   * self.sampling_rate)

    @property
    def end_audio_sample(self) -> int:
        return int(timestamp_to_sec(self._series["stop_timestamp"])
                   * self.sampling_rate)

    @property
    def label(self) -> int:
        return int(self._series.get("class_id", 0))

    @property
    def num_audio_samples(self) -> int:
        return self.end_audio_sample - self.start_audio_sample


def get_start_end_idx(audio_size, clip_size, clip_idx, num_clips,
                      start_sample=0, rng: Optional[np.random.Generator] = None):
    """audio_loader_epicsounds.py:25-53."""
    delta = max(audio_size - clip_size, 0)
    if clip_idx == -1:
        start = (rng or np.random.default_rng()).uniform(0, delta)
    else:
        start = np.linspace(0, delta, num=num_clips)[clip_idx]
    return start_sample + start, start_sample + start + clip_size - 1


class EpicSoundsDataset:
    """HDF5-backed EPIC-SOUNDS dataset (train/val/test splits)."""

    def __init__(self, annotations_pkl: str, hdf5_path: str,
                 cfg: EpicAudioConfig, split: str = "train"):
        import pandas as pd

        df = pd.read_pickle(annotations_pkl)
        self.records = [EpicSoundsRecord(row, cfg.sampling_rate)
                        for _, row in df.iterrows()]
        self.hdf5_path = hdf5_path
        self.cfg = cfg
        self.split = split
        self._h5 = None  # lazy open per worker (epicsounds.py:99-100)

    def __len__(self):
        n = len(self.records)
        if self.split == "test":
            return n * self.cfg.num_ensemble_views
        return n

    def _audio(self):
        if self._h5 is None:
            import h5py

            self._h5 = h5py.File(self.hdf5_path, "r")
        return self._h5

    def sample(self, index: int, rng: np.random.Generator):
        """-> (wave (clip_samples,), n_frames, one_hot label, record_index)."""
        cfg = self.cfg
        if self.split == "test":
            rec_idx = index // cfg.num_ensemble_views
            clip_idx = index % cfg.num_ensemble_views
        else:
            rec_idx, clip_idx = index, -1
        rec = self.records[rec_idx]
        samples = self._audio()[rec.video_id]
        clip = cfg.clip_samples
        if rec.num_audio_samples < clip:
            wave = np.asarray(
                samples[rec.start_audio_sample:rec.end_audio_sample],
                dtype=np.float32)
        else:
            s, e = get_start_end_idx(
                rec.num_audio_samples, clip, clip_idx,
                cfg.num_ensemble_views, rec.start_audio_sample, rng)
            wave = np.asarray(samples[int(s):int(e)], dtype=np.float32)
        n_frames = 1 + len(wave) // cfg.hop_samples
        n_frames = min(n_frames, cfg.num_frames)
        if len(wave) < clip:
            wave = np.pad(wave, (0, clip - len(wave)))
        else:
            wave = wave[:clip]
        y = np.zeros(cfg.num_classes, np.float32)
        y[rec.label] = 1.0
        return wave, n_frames, y, rec_idx


def make_epic_featurize(cfg: EpicAudioConfig, train: bool):
    """Device frontend: log-mel -> edge-pad/crop -> (train) warp+masks ->
    normalize. Mirrors epicsounds.py:103-133 order."""

    def featurize(key, waves, n_frames, labels):
        fb = stft_log_mel(
            waves, sr=cfg.sampling_rate, n_fft=2048,
            window_ms=cfg.window_length_ms, hop_ms=cfg.hop_length_ms,
            n_mels=cfg.num_frequencies)          # (B, T_full, M)
        fb = fb[:, : cfg.num_frames]
        # edge-pad: frames >= n_frames replicate the last real frame
        t = fb.shape[1]
        pos = jnp.arange(t)[None, :]
        idx = jnp.minimum(pos, n_frames[:, None] - 1)
        fb = jnp.take_along_axis(fb, idx[:, :, None], axis=1)
        if train:
            key, k_aug = jax.random.split(key)
            fb = combined_transforms(k_aug, fb, t_mask=cfg.t_mask,
                                     f_mask=cfg.f_mask, t_warp=cfg.t_warp)
        fb = (fb - cfg.mean) / (2.0 * cfg.std)
        return {"x": fb, "y": labels}

    return jax.jit(featurize)


class EpicBatchPipeline:
    """Epoch iterator of device-ready EPIC batches."""

    def __init__(self, dataset: EpicSoundsDataset, batch_size: int,
                 train: bool = True, seed: int = 0, num_workers: int = 8):
        self.dataset = dataset
        self.batch_size = batch_size
        self.train = train
        self.seed = seed
        self.num_workers = num_workers
        self._featurize = make_epic_featurize(dataset.cfg, train)

    def steps_per_epoch(self) -> int:
        n = len(self.dataset) // jax.process_count()
        if self.train:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def batches(self, epoch: int = 0) -> Iterator[dict]:
        import concurrent.futures as cf

        n = len(self.dataset)
        rng = np.random.default_rng(self.seed + epoch)
        order = rng.permutation(n) if self.train else np.arange(n)
        order = order[jax.process_index()::jax.process_count()]
        key = jax.random.PRNGKey(
            np.random.default_rng([self.seed, epoch]).integers(2 ** 31))
        bs = self.batch_size
        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            for start in range(0, len(order), bs):
                idxs = order[start:start + bs]
                if len(idxs) < bs and self.train:
                    break
                samples = list(pool.map(
                    lambda i: self.dataset.sample(int(i), rng), idxs))
                waves = np.stack([s[0] for s in samples])
                n_frames = np.array([s[1] for s in samples], np.int32)
                labels = np.stack([s[2] for s in samples])
                key, kb = jax.random.split(key)
                batch = self._featurize(kb, waves, n_frames, labels)
                batch["record_index"] = np.array(
                    [s[3] for s in samples], np.int32)
                yield batch


class EpicFlexiBatchPipeline:
    """Variable-length EPIC pipeline (the reference's `_flexi` path:
    pack_audio_flexi + _extract_sound_feature_flexi + construct_loader_flexi,
    audio_loader_epicsounds.py:76-173, loader.py:16-72).

    Each record uses its *entire* segment; the spectrogram length is rounded
    up to a multiple of 16 frames (clamped to [min_audio_length, num_frames])
    and edge-padded/cropped. The reference list-collates variable-length
    clips; here clips are bucketed by their rounded length so each bucket is
    one fixed-shape device batch (one jit specialization per bucket size,
    the XLA-friendly equivalent of a ragged batch). Augmentation uses the
    length-scaled masks/warp of combined_transforms_flexi
    (spec_augment.py:414-424: T_MASK and T_WARP scaled by len/1024).
    """

    def __init__(self, dataset: EpicSoundsDataset, batch_size: int,
                 train: bool = True, seed: int = 0, num_workers: int = 4,
                 min_audio_length: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.train = train
        self.seed = seed
        self.num_workers = num_workers
        self.min_audio_length = min_audio_length
        self._featurizers = {}

    def _target_length(self, n_frames: int) -> int:
        cfg = self.dataset.cfg
        tgt = n_frames + 16 - (n_frames % 16)
        if tgt > cfg.num_frames:
            tgt = cfg.num_frames
        elif self.min_audio_length and tgt < self.min_audio_length:
            tgt = self.min_audio_length
        return tgt

    def _featurize_for(self, tgt: int):
        if tgt not in self._featurizers:
            cfg = self.dataset.cfg

            def featurize(key, waves, n_frames, labels, _tgt=tgt):
                fb = stft_log_mel(
                    waves, sr=cfg.sampling_rate, n_fft=2048,
                    window_ms=cfg.window_length_ms,
                    hop_ms=cfg.hop_length_ms,
                    n_mels=cfg.num_frequencies)[:, :_tgt]
                pos = jnp.arange(_tgt)[None, :]
                idx = jnp.minimum(pos, n_frames[:, None] - 1)
                fb = jnp.take_along_axis(fb, idx[:, :, None], axis=1)
                if self.train:
                    key, k_aug = jax.random.split(key)
                    # length-scaled masks/warp (spec_augment.py:414-424)
                    fb = combined_transforms(
                        k_aug, fb, t_mask=max(cfg.t_mask * _tgt // 1024, 1),
                        f_mask=cfg.f_mask,
                        t_warp=cfg.t_warp * _tgt // 1024)
                fb = (fb - cfg.mean) / (2.0 * cfg.std)
                return {"x": fb, "y": labels}

            self._featurizers[tgt] = jax.jit(featurize)
        return self._featurizers[tgt]

    def batches(self, epoch: int = 0):
        import concurrent.futures as cf

        cfg = self.dataset.cfg
        n = len(self.dataset.records)
        rng = np.random.default_rng(self.seed + epoch)
        order = rng.permutation(n) if self.train else np.arange(n)
        order = order[jax.process_index()::jax.process_count()]
        key = jax.random.PRNGKey(
            np.random.default_rng([self.seed, epoch, 1]).integers(2 ** 31))

        def fetch(i):
            rec = self.dataset.records[int(i)]
            samples = self.dataset._audio()[rec.video_id]
            wave = np.asarray(
                samples[rec.start_audio_sample:rec.end_audio_sample],
                dtype=np.float32)
            max_samples = cfg.clip_samples * 3  # 30s cap like NUM_FRAMES cap
            wave = wave[:max_samples]
            n_frames = min(1 + len(wave) // cfg.hop_samples, cfg.num_frames)
            y = np.zeros(cfg.num_classes, np.float32)
            y[rec.label] = 1.0
            return wave, n_frames, y

        # Bucket indices by rounded target length.
        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            samples = list(pool.map(fetch, order))
        buckets = {}
        for s in samples:
            tgt = self._target_length(s[1])
            buckets.setdefault(tgt, []).append(s)

        for tgt, items in sorted(buckets.items()):
            feat = self._featurize_for(tgt)
            wave_len = (tgt - 1) * cfg.hop_samples + 1
            for start in range(0, len(items), self.batch_size):
                chunk = items[start:start + self.batch_size]
                waves = np.zeros((len(chunk), wave_len), np.float32)
                for j, (w, _, _) in enumerate(chunk):
                    m = min(len(w), wave_len)
                    waves[j, :m] = w[:m]
                n_frames = np.array([min(s[1], tgt) for s in chunk],
                                    np.int32)
                labels = np.stack([s[2] for s in chunk])
                key, kb = jax.random.split(key)
                yield feat(kb, waves, n_frames, labels)
