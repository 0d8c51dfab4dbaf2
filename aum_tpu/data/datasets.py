"""Host-side dataset: JSON datafiles + label CSV + stdlib WAV decode.

Rebuild of the reference `AudiosetDataset` (/root/reference/src/
dataloader.py:49-235) with the TPU division of labor: the host only decodes
waveforms and assembles fixed-shape batches; the fbank, padding/cropping,
mixup, SpecAugment and normalization all run batched on device
(aum_tpu.data.pipeline / aum_tpu.audio).

Semantics preserved:
- datafile format {"data": [{"wav": path, "labels": "mid1,mid2"}]} and label
  CSV (index,mid,display_name) (dataloader.py:13-21, 61-64);
- pad/crop to target_length frames. The reference zero-pads the *fbank*
  (dataloader.py:137-147), not the waveform, which differs from silence
  padding — reproduced exactly by carrying each clip's true frame count and
  masking device-computed frames beyond it to 0 (frames are independent, and
  the fbank's per-frame DC removal makes global mean-subtraction a no-op, so
  the device pipeline is bit-equivalent to the host version);
- failed decode -> retry with a random replacement index (dataloader.py:
  163-174).

Decode coverage (the reference decodes via `torchaudio.load`,
dataloader.py:98, i.e. ffmpeg-backed): WAV decodes through stdlib `wave` +
numpy (PCM 8/16/24/32-bit and float32) or the native batch decoder
(csrc/wavloader.cpp); every other format (flac / m4a / mp3 / ogg — what
real AudioSet/VGGSound archives actually contain) routes through the
ffmpeg-backed native decoder (csrc/audiodecode.cpp) by default. A custom
`decoder` hook still overrides everything.

Semantics note for non-WAV clips *longer* than target_samples: the default
path decodes (and mean-subtracts over) only the first target_samples rather
than the full clip — the crop in `waveform` discards the rest anyway; only
the subtracted mean differs, negligibly, from the reference's full-clip
mean.
"""

from __future__ import annotations

import csv
import dataclasses
import json
import wave as wave_mod
from typing import Callable, Optional

import numpy as np


def make_index_dict(label_csv: str) -> dict:
    """mid -> class index (dataloader.py:13-21)."""
    lookup = {}
    with open(label_csv, "r") as f:
        for row in csv.DictReader(f):
            lookup[row["mid"]] = int(row["index"])
    return lookup


def make_name_dict(label_csv: str) -> dict:
    lookup = {}
    with open(label_csv, "r") as f:
        for row in csv.DictReader(f):
            lookup[int(row["index"])] = row["display_name"]
    return lookup


def load_wav(path: str) -> tuple[np.ndarray, int]:
    """Decode a WAV file -> (float32 mono waveform in [-1,1], sample_rate)."""
    with wave_mod.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
                - 128.0) / 128.0
    elif width == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        val = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
               | (b[:, 2].astype(np.int32) << 16))
        val = np.where(val >= 1 << 23, val - (1 << 24), val)
        data = val.astype(np.float32) / float(1 << 23)
    else:
        raise ValueError(f"unsupported WAV sample width {width} in {path}")
    if ch > 1:
        data = data.reshape(-1, ch)[:, 0]  # first channel (torchaudio layout)
    return data, sr


@dataclasses.dataclass
class AudioConf:
    """Audio pipeline settings (the reference's audio_conf dict, run.py:160)."""

    num_mel_bins: int = 128
    target_length: int = 1024
    freqm: int = 0
    timem: int = 0
    mixup: float = 0.0
    dataset: str = "audioset"
    mean: float = -4.2677393
    std: float = 4.5689974
    noise: bool = False
    skip_norm: bool = False
    fshift: float = 10.0
    sample_frequency: float = 16000.0

    @property
    def frame_length_samples(self) -> int:
        return int(self.sample_frequency * 25.0 / 1000)

    @property
    def frame_shift_samples(self) -> int:
        return int(self.sample_frequency * self.fshift / 1000)

    @property
    def target_samples(self) -> int:
        """Samples that produce exactly target_length snip-edges frames."""
        return ((self.target_length - 1) * self.frame_shift_samples
                + self.frame_length_samples)


class AudioJsonDataset:
    """JSON-datafile dataset returning fixed-length waveforms + labels."""

    def __init__(
        self,
        dataset_json_file: str,
        audio_conf: AudioConf,
        label_csv: str,
        decoder: Optional[Callable[[str], tuple[np.ndarray, int]]] = None,
        rev_audio: bool = False,
    ):
        with open(dataset_json_file, "r") as fp:
            self.data = json.load(fp)["data"]
        self.conf = audio_conf
        self.index_dict = make_index_dict(label_csv)
        self.label_num = len(self.index_dict)
        self.decoder = decoder or self._default_decode
        self.decoder_is_default = decoder is None
        self.rev_audio = rev_audio

    def _default_decode(self, path: str) -> tuple[np.ndarray, int]:
        """WAV via stdlib; anything else via the native generic decoder."""
        if path.lower().endswith(".wav"):
            return load_wav(path)
        from aum_tpu.data.native import decode_audio

        cap = self.conf.target_samples  # `waveform` crops to this anyway
        out, n_samples, sr = decode_audio(path, cap)
        return out[:min(n_samples, cap)], sr

    def __len__(self) -> int:
        return len(self.data)

    def labels(self, index: int) -> np.ndarray:
        y = np.zeros(self.label_num, dtype=np.float32)
        for s in self.data[index]["labels"].split(","):
            y[self.index_dict[s]] = 1.0
        return y

    def waveform(self, index: int) -> tuple[np.ndarray, int]:
        """(wave padded/cropped to target_samples, true frame count)."""
        conf = self.conf
        wave, _sr = self.decoder(self.data[index]["wav"])
        wave = wave - wave.mean()
        if self.rev_audio:
            wave = wave[::-1].copy()
        n_frames = 0
        if len(wave) >= conf.frame_length_samples:
            n_frames = 1 + ((len(wave) - conf.frame_length_samples)
                            // conf.frame_shift_samples)
        n_frames = min(n_frames, conf.target_length)
        tgt = conf.target_samples
        if len(wave) >= tgt:
            wave = wave[:tgt]
        else:
            wave = np.pad(wave, (0, tgt - len(wave)))
        return wave.astype(np.float32), n_frames

    def sample(self, index: int, rng: np.random.Generator):
        """One (wave, n_frames, label) with decode-failure retry
        (dataloader.py:163-174)."""
        for _ in range(20):
            try:
                wave, n_frames = self.waveform(index)
                return wave, n_frames, self.labels(index)
            except Exception:
                index = int(rng.integers(0, len(self.data)))
        raise RuntimeError("too many consecutive decode failures")
