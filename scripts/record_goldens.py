"""Record reference-code golden logits as committed, torch-free fixtures.

For each GOLDENS entry this script builds the flax AudioMamba from a fixed
PRNG seed, exports its params to the reference state-dict layout
(aum_tpu/convert/torch_port.py::export_aum_state_dict), strict-loads them
into the ACTUAL reference AudioMamba (/root/reference/src/models/
mamba_models.py:193-692, CUDA/Triton kernels replaced by the independent
torch oracles in aum_tpu/convert/ref_runner.py), and records the reference
logits on a fixed input into tests/goldens/<name>.npz.

tests/test_goldens.py then replays ONLY the flax side — no torch, no
/root/reference checkout needed — and asserts logit equality against the
recorded values. That makes reference-code parity (SURVEY.md §4's golden
strategy; VERDICT r2 item 1) a portable, fast regression test instead of a
live two-framework run: any change to the model math, the init plumbing, or
the export/port layout that breaks parity trips these fixtures immediately,
early in the suite, in a torch-free process.

Determinism contract (documented, not hidden): the fixtures pin the flax
init produced by jax.random.PRNGKey(seed) (threefry — stable within a jax
release) and numpy default_rng inputs. If a jax upgrade ever changes init
streams, re-record with this script against the reference checkout.

Run on CPU:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/record_goldens.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "goldens")

# name -> (constructor kwargs shared verbatim by AudioMambaConfig and the
# reference AudioMamba ctor, flax init seed). Covers the variant map
# (run.py:239-246: none/v1/v2) x the cls-token knobs (mamba_models.py:
# 518-535) x layer-stack modes (:601-638), plus one full-depth stack.
GOLDENS = {
    "none_middle": (dict(
        spectrogram_size=(64, 128), depth=4, embed_dim=96, num_classes=11,
        bimamba_type="none"), 101),
    "v1_middle": (dict(
        spectrogram_size=(64, 128), depth=4, embed_dim=96, num_classes=11,
        bimamba_type="v1"), 102),
    "v2_middle": (dict(
        spectrogram_size=(64, 128), depth=4, embed_dim=96, num_classes=11,
        bimamba_type="v2"), 103),
    "v2_double_cls": (dict(
        spectrogram_size=(64, 128), depth=4, embed_dim=96, num_classes=11,
        bimamba_type="v2", use_double_cls_token=True,
        use_middle_cls_token=False), 104),
    "v1_end_cls": (dict(
        spectrogram_size=(64, 64), depth=4, embed_dim=96, num_classes=5,
        bimamba_type="v1", use_middle_cls_token=False,
        use_end_cls_token=True), 105),
    "none_bidirectional": (dict(
        spectrogram_size=(64, 64), depth=4, embed_dim=96, num_classes=5,
        bimamba_type="none", if_bidirectional=True), 106),
    "v1_transpose": (dict(
        spectrogram_size=(64, 128), depth=4, embed_dim=96, num_classes=5,
        bimamba_type="v1", transpose_token_sequence=True), 107),
    # Full 24-layer stack at the reference "tiny" width (run.py:227-237).
    "v1_depth24_tiny": (dict(
        spectrogram_size=(128, 128), depth=24, embed_dim=192,
        num_classes=35, bimamba_type="v1"), 108),
}


def build_flax(cfg_kwargs):
    from aum_tpu.models import AudioMamba, AudioMambaConfig

    cfg = AudioMambaConfig(**cfg_kwargs)
    return cfg, AudioMamba(cfg, use_kernel=False)


def flax_params(model, cfg, seed):
    import jax
    import jax.numpy as jnp

    return model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, cfg.spectrogram_size[1], cfg.spectrogram_size[0])))


def golden_input(cfg, seed):
    rng = np.random.default_rng(1000 + seed)
    f, t = cfg.spectrogram_size
    return (rng.standard_normal((2, t, f)) * 0.5).astype(np.float32)


def main() -> int:
    import torch

    from aum_tpu.convert.ref_runner import import_reference_models
    from aum_tpu.convert.torch_port import export_aum_state_dict

    ref_mm = import_reference_models()
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, (kwargs, seed) in GOLDENS.items():
        cfg, model = build_flax(kwargs)
        params = flax_params(model, cfg, seed)
        sd = export_aum_state_dict(params, cfg)
        torch.manual_seed(0)
        ref = ref_mm.AudioMamba(**kwargs)
        ref.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in sd.items()}, strict=True)
        ref.eval()
        x = golden_input(cfg, seed)
        with torch.no_grad():
            logits = ref(torch.from_numpy(x)).float().numpy()
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        np.savez(path, logits=logits, seed=np.int64(seed),
                 config=np.str_(json.dumps(kwargs)))
        print(f"recorded {path}: logits {logits.shape} "
              f"|mean|={np.abs(logits).mean():.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
