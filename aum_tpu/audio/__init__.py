from aum_tpu.audio.fbank import FbankConfig, fbank, mel_banks
from aum_tpu.audio.augment import (
    spec_augment,
    mixup_waveforms,
    noise_and_roll,
    normalize,
)

__all__ = [
    "FbankConfig",
    "fbank",
    "mel_banks",
    "spec_augment",
    "mixup_waveforms",
    "noise_and_roll",
    "normalize",
]
