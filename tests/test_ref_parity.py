"""TRUE reference-code parity: run the ACTUAL reference AudioMamba on CPU.

Unlike tests/test_torch_port.py (which checks the porter against a
builder-written numpy executor), these tests execute the genuine reference
Python — /root/reference/src/models/mamba_models.py:193-692 module
construction, init formulas, checkpoint surgery, and forward_features —
on CPU torch, with the fused CUDA/Triton kernels replaced by independently
written torch oracles (aum_tpu/convert/ref_runner.py). The flax port fed
through the repo's own porter must produce the same logits.

Covered (VERDICT round-2 item 1):
- base-scale (depth 24, embed 768) logit parity for Fo-Fo / Fo-Bi / Bi-Bi
  with the default middle cls token;
- double-cls-token parity at base scale;
- the ImageNet ViM surgery (mamba_models.py:348-395) executed by the
  reference constructor vs port_vim_imagenet_state_dict;
- the AuM-pretrain surgery (mamba_models.py:397-451: module. strip, grid
  inference, pos-embed resample) executed by the reference constructor vs
  port_aum_state_dict.
"""

import numpy as np
import pytest

# Deliberately NOT `torch = pytest.importorskip("torch")` at module level:
# pytest imports this module at COLLECTION time, which would load torch._C
# into the suite process before any test runs. On this host that is enough
# to destabilize XLA's native CPU compile much later in the run — the full
# suite segfaulted twice inside backend_compile_and_load at
# test_runner::test_run_eval_wa_and_ensemble (~100 tests and several big
# pjits AFTER collection), while the same test passes in isolation with
# torch never loaded (logs: /tmp/pytest_full{,2}.log, pytest_runner_alone,
# 2026-08-19). Deferring the import to setup_module keeps the process
# torch-free until this module actually runs (ordered last by conftest).
torch = None


def setup_module():
    global torch
    torch = pytest.importorskip("torch")


import jax
import jax.numpy as jnp

from aum_tpu.convert import port_aum_state_dict, port_vim_imagenet_state_dict
from aum_tpu.convert.ref_runner import (
    import_reference_models,
    reference_available,
    reference_state_dict_numpy,
)
from aum_tpu.convert.torch_port import merge_with_init
from aum_tpu.models import AudioMamba, AudioMambaConfig

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not present")

SPEC = (128, 128)  # (F, T) -> 8x8 grid, 64 patches + cls = 65 tokens


@pytest.fixture(scope="module")
def ref_mm():
    return import_reference_models()


def _ref_logits(model, x):
    model.eval()
    with torch.no_grad():
        return model(x).float().numpy()


def _flax_logits(sd, cfg, x, extra_params=None):
    model = AudioMamba(cfg, use_kernel=False)
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.spectrogram_size[1], cfg.spectrogram_size[0])))
    params = merge_with_init(port_aum_state_dict(sd, cfg), init)
    if extra_params:
        params["params"].update(extra_params)
    return np.asarray(model.apply(params, jnp.asarray(x)))


@pytest.mark.parametrize("bimamba", ["none", "v1", "v2"])
def test_base_scale_variant_logit_parity(ref_mm, bimamba):
    """Fo-Fo / Fo-Bi / Bi-Bi at base scale (depth 24, embed 768), middle cls
    (run.py:227-246 variant map)."""
    torch.manual_seed(1)
    ref = ref_mm.AudioMamba(
        spectrogram_size=SPEC, depth=24, embed_dim=768, num_classes=11,
        bimamba_type=bimamba)
    x = torch.randn(2, SPEC[1], SPEC[0]) * 0.5
    want = _ref_logits(ref, x)

    cfg = AudioMambaConfig(
        spectrogram_size=SPEC, depth=24, embed_dim=768, num_classes=11,
        bimamba_type=bimamba)
    got = _flax_logits(reference_state_dict_numpy(ref), cfg, x.numpy())
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_base_scale_double_cls_logit_parity(ref_mm):
    """Double cls token at base scale: head/tail insertion + (h0+hN)/2
    readout (mamba_models.py:518-524, 661-663)."""
    torch.manual_seed(2)
    ref = ref_mm.AudioMamba(
        spectrogram_size=SPEC, depth=24, embed_dim=768, num_classes=11,
        bimamba_type="v2", use_double_cls_token=True,
        use_middle_cls_token=False)
    x = torch.randn(2, SPEC[1], SPEC[0]) * 0.5
    want = _ref_logits(ref, x)

    cfg = AudioMambaConfig(
        spectrogram_size=SPEC, depth=24, embed_dim=768, num_classes=11,
        bimamba_type="v2", use_double_cls_token=True,
        use_middle_cls_token=False)
    got = _flax_logits(reference_state_dict_numpy(ref), cfg, x.numpy())
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_vim_imagenet_surgery_parity(ref_mm, tmp_path):
    """The reference constructor's ImageNet ViM load (mamba_models.py:
    348-395: pos_embed key move, RGB->1ch kernel mean, middle-cls prefix
    relocation, square-grid resample, head drop) vs the repo porter."""
    # Donor: ViM-style checkpoint — RGB patch kernel, square 4x4 grid, cls
    # pos-embed stored at its natural (middle) sequence position, 1000-class
    # head. Built from a reference model so every layer key exists.
    torch.manual_seed(3)
    donor = ref_mm.AudioMamba(
        spectrogram_size=(64, 64), depth=2, embed_dim=64, channels=3,
        num_classes=1000, bimamba_type="v2")
    vim_sd = {k: v.clone() for k, v in donor.state_dict().items()}
    pos = vim_sd.pop("pos_embed.pos_embed")  # prefix layout [cls, grid(16)]
    n = pos.shape[1] - 1
    vim_sd["pos_embed"] = torch.cat(
        [pos[:, 1:1 + n // 2], pos[:, :1], pos[:, 1 + n // 2:]], dim=1)
    pth = str(tmp_path / "vim.pth")
    torch.save({"model": vim_sd}, pth)

    # Reference constructor performs the surgery (grid 4x4 -> audio 4x8).
    torch.manual_seed(4)
    ref = ref_mm.AudioMamba(
        spectrogram_size=(64, 128), depth=2, embed_dim=64, channels=1,
        num_classes=7, bimamba_type="v2", imagenet_pretrain=True,
        imagenet_pretrain_path=pth)
    x = torch.randn(2, 128, 64) * 0.5
    want = _ref_logits(ref, x)

    cfg = AudioMambaConfig(
        spectrogram_size=(64, 128), depth=2, embed_dim=64, num_classes=7,
        bimamba_type="v2")
    model = AudioMamba(cfg, use_kernel=False)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 64)))
    ported = port_vim_imagenet_state_dict(
        {k: v.numpy() for k, v in vim_sd.items()}, cfg)
    params = merge_with_init(ported, init)
    # The ImageNet head is dropped by the surgery on BOTH sides; the
    # reference keeps its fresh random head — copy it so logits compare.
    ref_sd = ref.state_dict()
    params["params"]["head_weight"] = jnp.asarray(
        ref_sd["head.weight"].numpy().T)
    params["params"]["head_bias"] = jnp.asarray(ref_sd["head.bias"].numpy())
    got = np.asarray(model.apply(params, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_aum_pretrain_surgery_parity(ref_mm, tmp_path):
    """The reference constructor's AuM-pretrain load (mamba_models.py:
    397-451: module. strip, 2^6..2^19 grid inference, pos-embed resample to
    the new audio length, head kept on matching classes) vs
    port_aum_state_dict."""
    torch.manual_seed(5)
    donor = ref_mm.AudioMamba(
        spectrogram_size=(128, 256), depth=2, embed_dim=64, num_classes=35,
        bimamba_type="v1")
    pth = str(tmp_path / "aum.pth")
    torch.save({"module." + k: v for k, v in donor.state_dict().items()}, pth)

    torch.manual_seed(6)
    ref = ref_mm.AudioMamba(
        spectrogram_size=(128, 512), depth=2, embed_dim=64, num_classes=35,
        bimamba_type="v1", aum_pretrain=True, aum_pretrain_path=pth)
    x = torch.randn(2, 512, 128) * 0.5
    want = _ref_logits(ref, x)

    cfg = AudioMambaConfig(
        spectrogram_size=(128, 512), depth=2, embed_dim=64, num_classes=35,
        bimamba_type="v1")
    got = _flax_logits(
        {k: v.numpy() for k, v in donor.state_dict().items()}, cfg,
        x.numpy())
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_end_cls_token_parity(ref_mm):
    """use_end_cls_token positions the cls at N (mamba_models.py:531-532)."""
    torch.manual_seed(7)
    ref = ref_mm.AudioMamba(
        spectrogram_size=(64, 64), depth=2, embed_dim=64, num_classes=5,
        bimamba_type="v1", use_middle_cls_token=False,
        use_end_cls_token=True)
    x = torch.randn(2, 64, 64) * 0.5
    want = _ref_logits(ref, x)
    cfg = AudioMambaConfig(
        spectrogram_size=(64, 64), depth=2, embed_dim=64, num_classes=5,
        bimamba_type="v1", use_middle_cls_token=False,
        use_end_cls_token=True)
    got = _flax_logits(reference_state_dict_numpy(ref), cfg, x.numpy())
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_transpose_token_sequence_parity(ref_mm):
    """transpose_token_sequence (F-major -> T-major, mamba_models.py:
    543-562) against the reference implementation."""
    torch.manual_seed(8)
    ref = ref_mm.AudioMamba(
        spectrogram_size=(64, 128), depth=2, embed_dim=64, num_classes=5,
        bimamba_type="v2", transpose_token_sequence=True)
    x = torch.randn(2, 128, 64) * 0.5
    want = _ref_logits(ref, x)
    cfg = AudioMambaConfig(
        spectrogram_size=(64, 128), depth=2, embed_dim=64, num_classes=5,
        bimamba_type="v2", transpose_token_sequence=True)
    got = _flax_logits(reference_state_dict_numpy(ref), cfg, x.numpy())
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_verify_ckpt_ref_parity_mode(ref_mm, tmp_path):
    """scripts/verify_ckpt.py --ref-parity: the golden is produced by the
    ACTUAL reference code and the flax port must match it (records the
    reference logits as the golden file)."""
    from scripts.verify_ckpt import main as verify_main

    torch.manual_seed(10)
    donor = ref_mm.AudioMamba(
        spectrogram_size=(128, 128), depth=24, embed_dim=192,
        num_classes=35, bimamba_type="v1")
    pth = str(tmp_path / "tiny.pth")
    torch.save(donor.state_dict(), pth)
    rng = np.random.default_rng(20)
    x = (rng.standard_normal((2, 128, 128)) * 0.4).astype(np.float32)
    npz = str(tmp_path / "fb.npz")
    np.savez(npz, x=x)
    golden = str(tmp_path / "golden.npz")
    args = ["--ckpt", pth, "--model-type", "tiny", "--aum-type", "Fo-Bi",
            "--n-class", "35", "--audio-length", "128", "--melbins", "128",
            "--fbank-npz", npz]
    assert verify_main(args + ["--ref-parity", "--record-to", golden]) == 0
    assert verify_main(args + ["--golden", golden]) == 0


def test_if_bidirectional_paired_layers_parity(ref_mm):
    """if_bidirectional pairs layers 2i/2i+1 on the sequence/reversed
    sequence and sums (mamba_models.py:624-638)."""
    torch.manual_seed(9)
    ref = ref_mm.AudioMamba(
        spectrogram_size=(64, 64), depth=4, embed_dim=64, num_classes=5,
        bimamba_type="none", if_bidirectional=True)
    x = torch.randn(2, 64, 64) * 0.5
    want = _ref_logits(ref, x)
    cfg = AudioMambaConfig(
        spectrogram_size=(64, 64), depth=4, embed_dim=64, num_classes=5,
        bimamba_type="none", if_bidirectional=True)
    got = _flax_logits(reference_state_dict_numpy(ref), cfg, x.numpy())
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_export_to_reference_strict_load_and_logit_parity(ref_mm, tmp_path):
    """Reverse interop: a flax-trained model exported with
    export_aum_state_dict strict-loads into the reference AudioMamba and
    produces the same logits; the saved .pth is also consumed by the
    reference constructor's own aum_pretrain path (mamba_models.py:397-451)
    unchanged."""
    from aum_tpu.convert import export_aum_state_dict
    from aum_tpu.convert.torch_port import save_reference_checkpoint

    cfg = AudioMambaConfig(
        spectrogram_size=(128, 256), depth=2, embed_dim=64, num_classes=7,
        bimamba_type="v1")
    model = AudioMamba(cfg, use_kernel=False)
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 256, 128)))
    x = torch.randn(2, 256, 128) * 0.5
    want = np.asarray(model.apply(params, jnp.asarray(x.numpy())))

    # 1) strict load: the exported key set IS the reference state_dict set.
    torch.manual_seed(11)
    ref = ref_mm.AudioMamba(
        spectrogram_size=(128, 256), depth=2, embed_dim=64, num_classes=7,
        bimamba_type="v1")
    sd = export_aum_state_dict(params, cfg)
    ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}, strict=True)
    np.testing.assert_allclose(_ref_logits(ref, x), want, rtol=2e-3,
                               atol=2e-3)

    # 2) the reference's own checkpoint-load path consumes the saved .pth.
    pth = str(tmp_path / "export.pth")
    save_reference_checkpoint(params, cfg, pth)
    torch.manual_seed(12)
    ref2 = ref_mm.AudioMamba(
        spectrogram_size=(128, 256), depth=2, embed_dim=64, num_classes=7,
        bimamba_type="v1", aum_pretrain=True, aum_pretrain_path=pth)
    np.testing.assert_allclose(_ref_logits(ref2, x), want, rtol=2e-3,
                               atol=2e-3)
