"""aum_tpu — a TPU-native (JAX/XLA/Pallas) audio-Mamba framework.

A from-scratch rebuild of the capabilities of kaistmm/Audio-Mamba-AuM
(reference mounted at /root/reference) designed for TPU hardware:

- ``aum_tpu.ops``      — selective-scan (Mamba SSM) Pallas kernels + jnp oracles,
                         causal depthwise conv, fused add+norm helpers.
- ``aum_tpu.models``   — AudioMamba classifier, Mamba mixer blocks, patch/pos
                         embedding with flexible resampling, AST baseline.
- ``aum_tpu.audio``    — Kaldi-compatible log-mel filterbank frontend and
                         on-device SpecAugment / mixup / noise augmentation.
- ``aum_tpu.data``     — host-side dataset pipelines (JSON datafiles, EPIC hdf5),
                         weighted sampling, per-host sharding.
- ``aum_tpu.train``    — training/eval loops, optimizer/schedules, metrics,
                         orbax checkpointing.
- ``aum_tpu.parallel`` — jax.sharding mesh utilities (data/model axes, ICI
                         collectives via pjit/shard_map).
- ``aum_tpu.convert``  — PyTorch .pth -> JAX pytree checkpoint porter.
- ``aum_tpu.serving``  — AOT serving bundles via jax.export (StableHLO
                         graphs + params + labels in one artifact).
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: kernel compiles go through a remote
# compile service in some environments and can take minutes; caching them
# across processes makes reruns start in seconds. Opt out by setting
# JAX_COMPILATION_CACHE_DIR yourself (or to "").
import os as _os

_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.expanduser("~"), ".cache", "aum_tpu_jax"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "4")
