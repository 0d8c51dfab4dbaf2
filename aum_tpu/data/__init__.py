from aum_tpu.data.datasets import (
    AudioJsonDataset,
    AudioConf,
    make_index_dict,
    load_wav,
)
from aum_tpu.data.pipeline import BatchPipeline, balanced_sample_weights

__all__ = [
    "AudioJsonDataset",
    "AudioConf",
    "make_index_dict",
    "load_wav",
    "BatchPipeline",
    "balanced_sample_weights",
]
