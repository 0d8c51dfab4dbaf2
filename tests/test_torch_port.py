"""Checkpoint porter: torch-layout state dict -> flax params equivalence.

An independent numpy "reference executor" consumes a synthetic torch-layout
AuM state dict and computes the forward pass exactly per the reference
equations (mamba_models.py forward_features + mamba_simple.py slow path +
selective_scan_ref). The ported flax model must produce the same logits.
This is the activation-level golden test SURVEY.md §4 calls for, without
needing the reference's CUDA stack.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aum_tpu.convert import port_aum_state_dict
from aum_tpu.convert.torch_port import merge_with_init
from aum_tpu.models import AudioMamba, AudioMambaConfig

D_MODEL = 64
D_STATE = 16
D_INNER = 2 * D_MODEL
DT_RANK = 4  # ceil(64/16)
DEPTH = 2
N_CLASS = 7
PATCH = 16
SPEC = (128, 128)  # F, T -> grid (8, 8) -> 64 patches


def make_torch_style_sd(rng, bimamba_type="v1"):
    def r(*shape, scale=0.1):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    sd = {
        "cls_token": r(1, 1, D_MODEL),
        "pos_embed.pos_embed": r(1, 65, D_MODEL),
        "patch_embed.proj.weight": r(D_MODEL, 1, PATCH, PATCH),
        "patch_embed.proj.bias": r(D_MODEL),
        "norm_f.weight": 1.0 + r(D_MODEL),
        "head.weight": r(N_CLASS, D_MODEL),
        "head.bias": r(N_CLASS),
    }
    for i in range(DEPTH):
        p = f"layers.{i}.mixer."
        sd[f"layers.{i}.norm.weight"] = 1.0 + r(D_MODEL)
        sd[p + "in_proj.weight"] = r(2 * D_INNER, D_MODEL)
        sd[p + "conv1d.weight"] = r(D_INNER, 1, 4)
        sd[p + "conv1d.bias"] = r(D_INNER)
        sd[p + "x_proj.weight"] = r(DT_RANK + 2 * D_STATE, D_INNER)
        sd[p + "dt_proj.weight"] = r(D_INNER, DT_RANK)
        sd[p + "dt_proj.bias"] = r(D_INNER) - 4.0
        sd[p + "A_log"] = np.log(np.tile(
            np.arange(1, D_STATE + 1, dtype=np.float32), (D_INNER, 1)))
        sd[p + "D"] = 1.0 + r(D_INNER)
        sd[p + "out_proj.weight"] = r(D_MODEL, D_INNER)
        if bimamba_type in ("v1", "v2"):
            sd[p + "A_b_log"] = sd[p + "A_log"] + 0.1
        if bimamba_type == "v2":
            sd[p + "conv1d_b.weight"] = r(D_INNER, 1, 4)
            sd[p + "conv1d_b.bias"] = r(D_INNER)
            sd[p + "x_proj_b.weight"] = r(DT_RANK + 2 * D_STATE, D_INNER)
            sd[p + "dt_proj_b.weight"] = r(D_INNER, DT_RANK)
            sd[p + "dt_proj_b.bias"] = r(D_INNER) - 4.0
            sd[p + "D_b"] = 1.0 + r(D_INNER)
    return sd


# --- Independent numpy executor of the reference forward -------------------


def np_softplus(x):
    return np.logaddexp(0.0, x)


def np_silu(x):
    return x / (1.0 + np.exp(-x))


def np_rmsnorm(x, w, eps=1e-5):
    var = np.mean(x.astype(np.float64) ** 2, axis=-1, keepdims=True)
    return (x / np.sqrt(var + eps)) * w


def np_causal_conv_silu(x, w, b):
    """x: (L, D); w: (D, K); left pad K-1 (mamba slow path)."""
    l, d = x.shape
    k = w.shape[1]
    xp = np.concatenate([np.zeros((k - 1, d), x.dtype), x], axis=0)
    out = np.zeros_like(x)
    for t in range(l):
        out[t] = (xp[t:t + k] * w.T).sum(axis=0) + b
    return np_silu(out)


def np_selective_scan(u, dt, A, B, C, Dv, z):
    """u,dt,z: (L, D); A: (D,N); B,C: (L,N). selective_scan_ref equations."""
    l, d = u.shape
    n = A.shape[1]
    x = np.zeros((d, n))
    ys = np.zeros((l, d))
    for t in range(l):
        da = np.exp(dt[t][:, None] * A)
        x = da * x + (dt[t] * u[t])[:, None] * B[t][None, :]
        ys[t] = x @ C[t]
    out = ys + u * Dv[None, :]
    return out * np_silu(z)


def np_mixer(x, sd, p, bimamba_type):
    """x: (L, D_MODEL) -> (L, D_MODEL), reference slow path + bimamba."""
    xz = x @ sd[p + "in_proj.weight"].T
    xs, z = xz[:, :D_INNER], xz[:, D_INNER:]

    def branch(xs_b, z_b, suffix, a_key, reverse):
        if reverse:
            xs_b, z_b = xs_b[::-1], z_b[::-1]
        xc = np_causal_conv_silu(
            xs_b, sd[p + f"conv1d{suffix}.weight"][:, 0, :],
            sd[p + f"conv1d{suffix}.bias"])
        x_dbl = xc @ sd[p + f"x_proj{suffix}.weight"].T
        dt = x_dbl[:, :DT_RANK] @ sd[p + f"dt_proj{suffix}.weight"].T
        dt = np_softplus(dt + sd[p + f"dt_proj{suffix}.bias"])
        B = x_dbl[:, DT_RANK:DT_RANK + D_STATE]
        C = x_dbl[:, DT_RANK + D_STATE:]
        A = -np.exp(sd[p + a_key])
        y = np_selective_scan(xc, dt, A, B, C,
                              sd[p + ("D" if suffix == "" else "D_b")], z_b)
        return y[::-1] if reverse else y

    if bimamba_type == "none":
        y = branch(xs, z, "", "A_log", False)
    elif bimamba_type == "v1":
        # v1: same conv/proj activations, second scan on flipped seq with A_b
        xc = np_causal_conv_silu(xs, sd[p + "conv1d.weight"][:, 0, :],
                                 sd[p + "conv1d.bias"])
        x_dbl = xc @ sd[p + "x_proj.weight"].T
        dt = np_softplus(x_dbl[:, :DT_RANK] @ sd[p + "dt_proj.weight"].T
                         + sd[p + "dt_proj.bias"])
        B = x_dbl[:, DT_RANK:DT_RANK + D_STATE]
        C = x_dbl[:, DT_RANK + D_STATE:]
        A = -np.exp(sd[p + "A_log"])
        A_b = -np.exp(sd[p + "A_b_log"])
        y_f = np_selective_scan(xc, dt, A, B, C, sd[p + "D"], z)
        y_b = np_selective_scan(xc[::-1], dt[::-1], A_b, B[::-1], C[::-1],
                                sd[p + "D"], z[::-1])[::-1]
        y = y_f + y_b
    elif bimamba_type == "v2":
        y_f = branch(xs, z, "", "A_log", False)
        y_b = branch(xs, z, "_b", "A_b_log", True)
        y = (y_f + y_b) / 2.0  # if_devide_out
    return y @ sd[p + "out_proj.weight"].T


def np_reference_forward(spec, sd, bimamba_type):
    """spec: (T, F) -> logits (N_CLASS,). mamba_models.forward_features."""
    x = spec.T  # (F, T)
    f, t = x.shape
    gh, gw = f // PATCH, t // PATCH
    w = sd["patch_embed.proj.weight"]  # (D,1,ph,pw)
    tokens = np.zeros((gh * gw, D_MODEL))
    for i in range(gh):
        for j in range(gw):
            patch = x[i * PATCH:(i + 1) * PATCH, j * PATCH:(j + 1) * PATCH]
            tokens[i * gw + j] = (w[:, 0] * patch[None]).sum(
                axis=(1, 2)) + sd["patch_embed.proj.bias"]
    n = tokens.shape[0]
    tp = n // 2
    seq = np.concatenate(
        [tokens[:tp], sd["cls_token"][0], tokens[tp:]], axis=0)
    pos = sd["pos_embed.pos_embed"][0]
    # prefix layout: cls pos at index 0, grid after.
    seq[tp] += pos[0]
    seq[:tp] += pos[1:tp + 1]
    seq[tp + 1:] += pos[tp + 1:]

    hidden, residual = seq, None
    for i in range(DEPTH):
        residual = hidden if residual is None else residual + hidden
        normed = np_rmsnorm(residual, sd[f"layers.{i}.norm.weight"])
        hidden = np_mixer(normed, sd, f"layers.{i}.mixer.", bimamba_type)
    final = np_rmsnorm(residual + hidden, sd["norm_f.weight"])
    cls = final[tp]
    return cls @ sd["head.weight"].T + sd["head.bias"]


@pytest.mark.parametrize("bimamba_type", ["none", "v1", "v2"])
def test_ported_checkpoint_matches_reference_math(bimamba_type):
    rng = np.random.default_rng(42)
    sd = make_torch_style_sd(rng, bimamba_type)
    spec = (rng.standard_normal((SPEC[1], SPEC[0])) * 0.5).astype(np.float32)

    ref_logits = np_reference_forward(spec.astype(np.float64), sd,
                                      bimamba_type)

    cfg = AudioMambaConfig(
        spectrogram_size=SPEC, patch_size=(PATCH, PATCH),
        strides=(PATCH, PATCH), depth=DEPTH, embed_dim=D_MODEL,
        num_classes=N_CLASS, bimamba_type=bimamba_type)
    model = AudioMamba(cfg, use_kernel=False)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1,) + SPEC[::-1]))
    ported = port_aum_state_dict(sd, cfg)
    params = merge_with_init(ported, init)
    out = np.asarray(model.apply(params, jnp.asarray(spec)[None]))[0]

    np.testing.assert_allclose(out, ref_logits, rtol=2e-4, atol=2e-4)


def test_port_resamples_pos_embed_and_head_drop():
    rng = np.random.default_rng(0)
    sd = make_torch_style_sd(rng, "v1")
    # Target config with a longer time axis (8x16 grid) and different classes.
    cfg = AudioMambaConfig(
        spectrogram_size=(128, 256), patch_size=(PATCH, PATCH),
        strides=(PATCH, PATCH), depth=DEPTH, embed_dim=D_MODEL,
        num_classes=13, bimamba_type="v1")
    ported = port_aum_state_dict(sd, cfg)
    pos = ported["params"]["pos_embed"]["pos_embed"]
    assert pos.shape == (1, 1 + 8 * 16, D_MODEL)
    assert "head_weight" not in ported["params"]  # class mismatch -> dropped
    model = AudioMamba(cfg, use_kernel=False)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 256, 128), jnp.float32))
    params = merge_with_init(ported, init)
    out = model.apply(params, jnp.zeros((1, 256, 128)))
    assert out.shape == (1, 13)


def make_sd_dims(rng, depth, d_model, n_patches, n_class,
                 bimamba_type="v1", d_state=16, patch=16):
    """Synthetic torch-layout state dict at arbitrary dimensions."""
    d_inner = 2 * d_model
    dt_rank = -(-d_model // 16)

    def r(*shape, scale=0.02):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    sd = {
        "cls_token": r(1, 1, d_model),
        "pos_embed.pos_embed": r(1, n_patches + 1, d_model),
        "patch_embed.proj.weight": r(d_model, 1, patch, patch),
        "patch_embed.proj.bias": r(d_model),
        "norm_f.weight": 1.0 + r(d_model),
        "head.weight": r(n_class, d_model),
        "head.bias": r(n_class),
    }
    for i in range(depth):
        p = f"layers.{i}.mixer."
        sd[f"layers.{i}.norm.weight"] = 1.0 + r(d_model)
        sd[p + "in_proj.weight"] = r(2 * d_inner, d_model)
        sd[p + "conv1d.weight"] = r(d_inner, 1, 4)
        # layer-identifying constant so stacking order is checkable
        sd[p + "conv1d.bias"] = np.full(d_inner, float(i), np.float32)
        sd[p + "x_proj.weight"] = r(dt_rank + 2 * d_state, d_inner)
        sd[p + "dt_proj.weight"] = r(d_inner, dt_rank)
        sd[p + "dt_proj.bias"] = r(d_inner) - 4.0
        sd[p + "A_log"] = np.log(np.tile(
            np.arange(1, d_state + 1, dtype=np.float32), (d_inner, 1)))
        sd[p + "D"] = 1.0 + r(d_inner)
        sd[p + "out_proj.weight"] = r(d_model, d_inner)
        if bimamba_type in ("v1", "v2"):
            sd[p + "A_b_log"] = sd[p + "A_log"] + 0.1
        if bimamba_type == "v2":
            sd[p + "conv1d_b.weight"] = r(d_inner, 1, 4)
            sd[p + "conv1d_b.bias"] = r(d_inner)
            sd[p + "x_proj_b.weight"] = r(dt_rank + 2 * d_state, d_inner)
            sd[p + "dt_proj_b.weight"] = r(d_inner, dt_rank)
            sd[p + "dt_proj_b.bias"] = r(d_inner) - 4.0
            sd[p + "D_b"] = 1.0 + r(d_inner)
    return sd


def test_port_base_scale_structure_and_forward():
    """Porter at REAL base dimensions (depth 24, embed 768; VERDICT r1 #6):
    full AS-grid (8x64) structural port + layer-stacking order + a forward
    at base width."""
    rng = np.random.default_rng(3)
    # Structural port at the full AudioSet grid (128x1024 -> 8*64 patches).
    sd = make_sd_dims(rng, depth=24, d_model=768, n_patches=512, n_class=527)
    cfg = AudioMambaConfig(
        spectrogram_size=(128, 1024), depth=24, embed_dim=768,
        num_classes=527, bimamba_type="v1")
    ported = port_aum_state_dict(sd, cfg)
    p = ported["params"]
    assert p["pos_embed"]["pos_embed"].shape == (1, 513, 768)
    mixer = p["layers"]["block"]["mixer"]
    assert mixer["in_proj_x_weight"].shape == (24, 768, 1536)
    assert mixer["A_b_log"].shape == (24, 1536, 16)
    # Stacked layer order: conv1d bias was filled with the layer index.
    np.testing.assert_allclose(np.asarray(mixer["conv1d_bias"])[:, 0],
                               np.arange(24.0))
    # in_proj rows split torch's (2*d_inner, d) into x/z halves.
    np.testing.assert_allclose(
        np.asarray(mixer["in_proj_x_weight"][3]),
        sd["layers.3.mixer.in_proj.weight"][:1536].T)
    np.testing.assert_allclose(
        np.asarray(mixer["in_proj_z_weight"][3]),
        sd["layers.3.mixer.in_proj.weight"][1536:].T)

    # Forward at base width (smaller grid to keep CPU time sane).
    sd_s = make_sd_dims(rng, depth=24, d_model=768, n_patches=64,
                        n_class=527)
    cfg_s = AudioMambaConfig(
        spectrogram_size=(128, 128), depth=24, embed_dim=768,
        num_classes=527, bimamba_type="v1")
    model = AudioMamba(cfg_s, use_kernel=False)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 128, 128), jnp.float32))
    params = merge_with_init(port_aum_state_dict(sd_s, cfg_s), init)
    out = model.apply(params, jnp.zeros((1, 128, 128)))
    assert out.shape == (1, 527)
    assert np.isfinite(np.asarray(out)).all()


# --- ImageNet ViM porter (mamba_models.py:348-395) -------------------------


def make_vim_style_sd(rng, n_patches=16, bimamba_type="v2", double=False):
    """Synthetic ImageNet ViM checkpoint: RGB patch kernel, `pos_embed` key
    with the cls pos stored at its natural sequence position (middle, or
    0/last for double), 1000-class head."""

    def r(*shape, scale=0.1):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    sd = make_torch_style_sd(rng, bimamba_type)
    del sd["pos_embed.pos_embed"]
    n_prefix = 2 if double else 1
    sd["pos_embed"] = r(1, n_patches + n_prefix, D_MODEL)
    sd["patch_embed.proj.weight"] = r(D_MODEL, 3, PATCH, PATCH)
    sd["head.weight"] = r(1000, D_MODEL)
    sd["head.bias"] = r(1000)
    return sd


def _vim_cfg(**kw):
    base = dict(spectrogram_size=(64, 64), patch_size=(PATCH, PATCH),
                strides=(PATCH, PATCH), depth=DEPTH, embed_dim=D_MODEL,
                num_classes=N_CLASS, bimamba_type="v2")
    base.update(kw)
    return AudioMambaConfig(**base)


def test_port_vim_structure_rgb_mean_prefix_and_head_drop():
    """RGB kernel -> channel mean (mamba_models.py:354-355); middle cls pos
    relocated to the prefix slot (:367-372); ImageNet head dropped (:357)."""
    from aum_tpu.convert import port_vim_imagenet_state_dict

    rng = np.random.default_rng(11)
    sd = make_vim_style_sd(rng)  # 4x4 grid, cls pos at index 8
    cfg = _vim_cfg()  # audio grid (4,4) -> same token count, no resample
    ported = port_vim_imagenet_state_dict(sd, cfg)
    p = ported["params"]

    # Patch kernel: mean over the 3 input channels, OIHW -> HWIO.
    expect_kernel = np.transpose(
        sd["patch_embed.proj.weight"].mean(axis=1, keepdims=True),
        (2, 3, 1, 0))
    np.testing.assert_allclose(p["patch_embed"]["proj_weight"],
                               expect_kernel, rtol=1e-6)

    # Prefix relocation: ported pos = [pos[8], pos[:8], pos[9:]].
    pos = sd["pos_embed"][0]
    got = p["pos_embed"]["pos_embed"][0]
    np.testing.assert_allclose(got[0], pos[8])
    np.testing.assert_allclose(got[1:9], pos[:8])
    np.testing.assert_allclose(got[9:], pos[9:])

    # ImageNet head dropped.
    assert "head_weight" not in p and "head_bias" not in p


def test_port_vim_double_cls_prefix_relocation():
    """Double-cls ViM: pos tokens at 0 and last both move to the prefix
    (insert_to_prefix([0, n-1]), mamba_models.py:367-370)."""
    from aum_tpu.convert import port_vim_imagenet_state_dict

    rng = np.random.default_rng(12)
    sd = make_vim_style_sd(rng, double=True)  # 18 tokens: cls, 16, cls
    cfg = _vim_cfg(use_double_cls_token=True, use_middle_cls_token=False)
    ported = port_vim_imagenet_state_dict(
        sd, cfg, load_middle_cls_token=False, load_double_cls_token=True)
    pos = sd["pos_embed"][0]
    got = ported["params"]["pos_embed"]["pos_embed"][0]
    assert got.shape[0] == 18
    np.testing.assert_allclose(got[0], pos[0])
    np.testing.assert_allclose(got[1], pos[-1])
    np.testing.assert_allclose(got[2:], pos[1:-1])


def test_port_vim_logit_parity_same_grid():
    """Ported ViM params reproduce the reference math end to end: the numpy
    executor runs an AuM-style state dict built by applying the reference's
    ViM surgery (RGB mean + prefix relocation) independently in the test."""
    from aum_tpu.convert import port_vim_imagenet_state_dict

    rng = np.random.default_rng(13)
    sd = make_vim_style_sd(rng, bimamba_type="v2")
    cfg = _vim_cfg()
    model = AudioMamba(cfg, use_kernel=False)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64), jnp.float32))
    params = merge_with_init(port_vim_imagenet_state_dict(sd, cfg), init)

    # Independently-constructed equivalent AuM-style sd for the executor.
    pos = sd["pos_embed"]
    np_sd = {k: v for k, v in sd.items()
             if k not in ("pos_embed", "head.weight", "head.bias")}
    np_sd["pos_embed.pos_embed"] = np.concatenate(
        [pos[:, 8:9], pos[:, :8], pos[:, 9:]], axis=1)
    np_sd["patch_embed.proj.weight"] = sd[
        "patch_embed.proj.weight"].mean(axis=1, keepdims=True)
    # Head is freshly initialized (dropped on port) — read it back from init.
    np_sd["head.weight"] = np.asarray(init["params"]["head_weight"]).T
    np_sd["head.bias"] = np.asarray(init["params"]["head_bias"])

    spec = (rng.standard_normal((64, 64)) * 0.5).astype(np.float32)
    ref_logits = np_reference_forward(spec.astype(np.float64), np_sd, "v2")
    out = np.asarray(model.apply(params, jnp.asarray(spec)[None]))[0]
    np.testing.assert_allclose(out, ref_logits, rtol=2e-4, atol=2e-4)


def test_port_vim_resamples_square_grid_to_audio_grid():
    """ViM 4x4 image grid resampled to an (8,16) audio grid
    (mamba_models.py:375 square-grid assumption + FlexiPosEmbed resample)."""
    from aum_tpu.convert import port_vim_imagenet_state_dict

    rng = np.random.default_rng(14)
    sd = make_vim_style_sd(rng)
    cfg = _vim_cfg(spectrogram_size=(128, 256))  # grid (8,16) -> 128 patches
    ported = port_vim_imagenet_state_dict(sd, cfg)
    assert ported["params"]["pos_embed"]["pos_embed"].shape == (
        1, 1 + 8 * 16, D_MODEL)
    model = AudioMamba(cfg, use_kernel=False)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 256, 128), jnp.float32))
    params = merge_with_init(ported, init)
    out = np.asarray(model.apply(params, jnp.zeros((1, 256, 128))))
    assert out.shape == (1, N_CLASS) and np.isfinite(out).all()


def test_verify_ckpt_script_record_then_verify(tmp_path):
    """scripts/verify_ckpt.py end-to-end: synthetic .pth -> record golden ->
    verify golden (PARITY OK path)."""
    import torch

    from scripts.verify_ckpt import main as verify_main

    rng = np.random.default_rng(9)
    sd = make_sd_dims(rng, depth=24, d_model=192, n_patches=64, n_class=35)
    pth = str(tmp_path / "synthetic.pth")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               pth)
    x = (rng.standard_normal((2, 128, 128)) * 0.4).astype(np.float32)
    npz = str(tmp_path / "fb.npz")
    np.savez(npz, x=x)
    golden = str(tmp_path / "golden.npz")
    args = ["--ckpt", pth, "--model-type", "tiny", "--n-class", "35",
            "--audio-length", "128", "--melbins", "128",
            "--fbank-npz", npz]
    assert verify_main(args + ["--record-to", golden]) == 0
    assert verify_main(args + ["--golden", golden]) == 0


@pytest.mark.parametrize("bimamba_type,if_bidirectional,double_cls", [
    ("none", False, False),
    ("v1", False, False),
    ("v2", False, False),
    ("none", True, False),
    ("v2", False, True),
])
def test_export_port_roundtrip_identity(bimamba_type, if_bidirectional,
                                        double_cls):
    """export_aum_state_dict is the exact inverse of port_aum_state_dict:
    flax init -> torch-layout export -> re-port reproduces every leaf."""
    from aum_tpu.convert import export_aum_state_dict

    cfg = AudioMambaConfig(
        spectrogram_size=SPEC, depth=DEPTH, embed_dim=D_MODEL,
        num_classes=N_CLASS, bimamba_type=bimamba_type,
        if_bidirectional=if_bidirectional,
        use_double_cls_token=double_cls,
        use_middle_cls_token=not double_cls)
    model = AudioMamba(cfg, use_kernel=False)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, SPEC[1], SPEC[0])))
    back = port_aum_state_dict(export_aum_state_dict(params, cfg), cfg)
    flat_a = jax.tree_util.tree_flatten_with_path(params["params"])[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back["params"])[0]
    assert [k for k, _ in flat_a] == [k for k, _ in flat_b]
    for (path, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                                   atol=0, err_msg=str(path))


def test_export_torch_ckpt_script(tmp_path):
    """scripts/export_torch_ckpt.py: orbax dir -> reference-format .pth whose
    re-port reproduces the trained params exactly."""
    import orbax.checkpoint as ocp

    from aum_tpu.convert import load_torch_checkpoint
    from scripts.export_torch_ckpt import main as export_main

    cfg = AudioMambaConfig.from_variant(
        "tiny", "Fo-Bi", num_classes=35, spectrogram_size=(128, 128))
    model = AudioMamba(cfg, use_kernel=False)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 128, 128)))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(tmp_path / "models" / "best"),
               {"step": 0, "params": params}, force=True)
    ckptr.wait_until_finished()

    pth = str(tmp_path / "export.pth")
    assert export_main([
        "--orbax", str(tmp_path / "models"), "--name", "best",
        "--model-type", "tiny", "--aum-type", "Fo-Bi", "--n-class", "35",
        "--audio-length", "128", "--melbins", "128", "--out", pth]) == 0

    back = port_aum_state_dict(load_torch_checkpoint(pth), cfg)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(params["params"])[0],
            jax.tree_util.tree_flatten_with_path(back["params"])[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))
