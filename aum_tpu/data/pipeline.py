"""Host->device batch pipeline with on-device feature extraction.

Replaces the reference's torch DataLoader + per-sample host fbank
(dataloader.py:154-233) with: host threads decode waveforms into pinned
numpy batches; a single jitted `featurize` runs the whole frontend on device
(mixup -> fbank -> frame-pad masking -> SpecAugment -> normalize -> noise,
in the reference's exact order) and double-buffers against the train step.

Also provides the balanced-sampling weights of exps/audioset/
gen_weight_file.py:44-70 (weight = sum over labels of 1000/(count+0.01))
and the WeightedRandomSampler(replacement=True) equivalent (run.py:174-182).
"""

from __future__ import annotations

import concurrent.futures as cf
import dataclasses
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aum_tpu.audio.augment import (
    mixup_waveforms,
    noise_and_roll,
    normalize,
    spec_augment,
)
from aum_tpu.audio.fbank import FbankConfig, fbank
from aum_tpu.data.datasets import AudioConf, AudioJsonDataset


def balanced_sample_weights(dataset: AudioJsonDataset) -> np.ndarray:
    """Per-sample weights for class-balanced sampling
    (gen_weight_file.py:44-70)."""
    counts = np.zeros(dataset.label_num, dtype=np.float64)
    label_idx = []
    for datum in dataset.data:
        idxs = [dataset.index_dict[s] for s in datum["labels"].split(",")]
        label_idx.append(idxs)
        for i in idxs:
            counts[i] += 1
    weights = np.array(
        [sum(1000.0 / (counts[i] + 0.01) for i in idxs)
         for idxs in label_idx])
    return weights


def make_featurize(conf: AudioConf, train: bool):
    """Jitted device frontend: waves (B,S), n_frames (B,), labels (B,C) ->
    {'x': (B, T, M) normalized fbank, 'y': labels}."""
    fb_cfg = FbankConfig(
        sample_frequency=conf.sample_frequency,
        frame_shift_ms=conf.fshift,
        num_mel_bins=conf.num_mel_bins,
    )

    def featurize(key, waves, n_frames, labels, p_waves=None, p_labels=None):
        if train and conf.mixup > 0:
            key, k_mix = jax.random.split(key)
            waves, labels = mixup_waveforms(
                k_mix, waves, labels, conf.mixup,
                partner_wave=p_waves, partner_labels=p_labels)
        fb = fbank(waves, fb_cfg)  # (B, T, M)
        # Zero out frames beyond each clip's true frame count — the
        # reference's ZeroPad2d on the fbank (dataloader.py:137-147).
        t = fb.shape[1]
        mask = (jnp.arange(t)[None, :] < n_frames[:, None])
        fb = jnp.where(mask[:, :, None], fb, 0.0)
        if train and (conf.freqm or conf.timem):
            key, k_aug = jax.random.split(key)
            fb = spec_augment(k_aug, fb, conf.freqm, conf.timem)
        if not conf.skip_norm:
            fb = normalize(fb, conf.mean, conf.std)
        if train and conf.noise:
            key, k_noise = jax.random.split(key)
            fb = noise_and_roll(k_noise, fb)
        return {"x": fb, "y": labels}

    return jax.jit(featurize)


@dataclasses.dataclass
class BatchPipeline:
    """Epoch iterator of device-ready batches.

    Per-host data sharding for multi-host training: each process takes the
    slice data[process_index::process_count] of the (shuffled/weighted)
    index order (SURVEY.md §2.3 TPU-native plan).
    """

    dataset: AudioJsonDataset
    batch_size: int
    train: bool = True
    weights: Optional[np.ndarray] = None  # balanced sampling (with replacement)
    seed: int = 0
    num_workers: int = 8
    drop_last: Optional[bool] = None
    use_native: bool = True

    def __post_init__(self):
        self._featurize = make_featurize(self.dataset.conf, self.train)
        self._drop_last = (self.train if self.drop_last is None
                           else self.drop_last)
        from aum_tpu.data.native import (audio_decoder_available,
                                         native_available)

        # Native batch decode covers the default-decoder no-reverse path:
        # all-WAV batches go through the lean WAV decoder, mixed/compressed
        # batches (flac/m4a/...) through the ffmpeg-backed generic decoder.
        default_path = (self.use_native
                        and getattr(self.dataset, "decoder_is_default",
                                    False)
                        and not self.dataset.rev_audio)
        self._native = default_path and native_available()
        self._native_generic = default_path and audio_decoder_available()

    def steps_per_epoch(self) -> int:
        n = len(self.dataset) // jax.process_count()
        if self._drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_order(self, epoch: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed + epoch)
        n = len(self.dataset)
        if self.train:
            if self.weights is not None:
                p = self.weights / self.weights.sum()
                order = rng.choice(n, size=n, replace=True, p=p)
            else:
                order = rng.permutation(n)
        else:
            order = np.arange(n)
        return order[jax.process_index()::jax.process_count()]

    def batches(self, epoch: int = 0) -> Iterator[dict]:
        conf = self.dataset.conf
        order = self._epoch_order(epoch)
        rng = np.random.default_rng(self.seed * 7919 + epoch)
        key = jax.random.PRNGKey(
            np.random.default_rng([self.seed, epoch]).integers(2**31))

        def fetch(i):
            return self.dataset.sample(int(i), rng)

        def assemble(idxs):
            """One host batch: native C++ batch decode when available
            (csrc/wavloader.cpp for all-WAV batches, csrc/audiodecode.cpp
            for compressed formats), Python thread-pool decode otherwise;
            native failures fall back per-sample (decode-retry semantics
            preserved by dataset.sample)."""
            paths = [self.dataset.data[int(i)]["wav"] for i in idxs]
            all_wav = all(p.lower().endswith(".wav") for p in paths)
            use_native = self._native if all_wav else self._native_generic
            if use_native:
                from aum_tpu.data.native import (decode_audio_batch,
                                                 decode_wav_batch)

                fn = decode_wav_batch if all_wav else decode_audio_batch
                res = fn(paths, conf.target_samples,
                         threads=self.num_workers)
                waves, n_samples, _, statuses = res
                n_frames = np.minimum(
                    np.maximum(
                        1 + (np.minimum(n_samples, conf.target_samples)
                             - conf.frame_length_samples)
                        // conf.frame_shift_samples, 0),
                    conf.target_length).astype(np.int32)
                labels = np.stack(
                    [self.dataset.labels(int(i)) for i in idxs])
                for j, st in enumerate(statuses):
                    if st != 0:
                        w, nf, y = fetch(idxs[j])
                        waves[j], n_frames[j], labels[j] = w, nf, y
                return waves, n_frames, labels
            samples = list(pool.map(fetch, idxs))
            return (np.stack([s[0] for s in samples]),
                    np.array([s[1] for s in samples], np.int32),
                    np.stack([s[2] for s in samples]))

        bs = self.batch_size
        # Previous host batch = extra mixup partner pool (see
        # audio.augment.mixup_waveforms semantics notes): widens partners
        # beyond the current balanced-sampler batch at zero decode cost.
        use_partners = self.train and conf.mixup > 0
        prev = None
        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            for start in range(0, len(order), bs):
                idxs = order[start:start + bs]
                if len(idxs) < bs and self._drop_last:
                    break
                waves, n_frames, labels = assemble(idxs)
                key, kb = jax.random.split(key)
                if (use_partners and prev is not None
                        and prev[0].shape == waves.shape):
                    yield self._featurize(kb, waves, n_frames, labels,
                                          prev[0], prev[1])
                else:
                    yield self._featurize(kb, waves, n_frames, labels)
                if use_partners:
                    prev = (waves, labels)


class Prefetcher:
    """Background-thread batch prefetcher (depth-N double buffering).

    The role torch's DataLoader worker prefetch plays in the reference:
    the next host batch is decoded (native C++ pool) and its device
    featurization dispatched while the train step runs on the current one.
    Wrap any batch iterator: `for b in Prefetcher(pipe.batches(epoch)): ...`
    """

    def __init__(self, iterator, depth: int = 2):
        import queue
        import threading

        self._q = queue.Queue(maxsize=depth)
        self._sentinel = object()
        self._err = None

        def worker():
            try:
                for item in iterator:
                    self._q.put(item)
            except BaseException as e:  # propagate into the consumer
                self._err = e
            finally:
                self._q.put(self._sentinel)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._sentinel:
                if self._err is not None:
                    raise self._err
                return
            yield item
