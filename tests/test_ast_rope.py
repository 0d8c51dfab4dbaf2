"""AST baseline model and RoPE feature tests."""

import jax
import jax.numpy as jnp
import numpy as np

from aum_tpu.models.ast import ASTConfig, ASTModel, retarget_pos_embed
from aum_tpu.models.rope import apply_rope, rope_freqs_2d, rotate_half
from aum_tpu.models import AudioMamba, AudioMambaConfig


def n_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


def test_ast_forward_and_param_scale():
    cfg = ASTConfig(label_dim=10, input_fdim=128, input_tdim=128,
                    fstride=16, tstride=16, depth=2, embed_dim=192,
                    num_heads=3)
    model = ASTModel(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 128))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    assert out.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_ast_base_param_count():
    """deit_base encoder ~86M + head; AST@527 classes reported ~87-88M."""
    cfg = ASTConfig(label_dim=527, input_fdim=128, input_tdim=1024,
                    fstride=10, tstride=10)
    shapes = jax.eval_shape(
        ASTModel(cfg).init, jax.random.PRNGKey(0),
        jnp.zeros((1, 1024, 128)))
    total = n_params(shapes)
    assert 85e6 < total < 92e6, total


def test_ast_distilled_readout():
    cfg = ASTConfig(label_dim=5, input_fdim=128, input_tdim=128,
                    fstride=16, tstride=16, depth=1, embed_dim=192,
                    num_heads=3, distilled=True)
    model = ASTModel(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 128))
    params = model.init(jax.random.PRNGKey(1), x)
    assert "dist_token" in params["params"]
    assert model.apply(params, x).shape == (1, 5)


def test_retarget_pos_embed_crop_and_interp():
    rng = np.random.default_rng(0)
    pos = rng.standard_normal((1, 1 + 24 * 24, 32)).astype(np.float32)
    # crop time, crop freq (AST 128x1024@10 stride -> (12, 101) from (24,24)
    # would interp time; test both directions)
    out = retarget_pos_embed(pos, (24, 24), (12, 8), 1)
    assert out.shape == (1, 1 + 12 * 8, 32)
    # the cropped region is taken from the center
    grid = pos[0, 1:].reshape(24, 24, 32)
    np.testing.assert_allclose(
        out[0, 1:].reshape(12, 8, 32),
        grid[6:18, 8:16], atol=1e-6)
    out2 = retarget_pos_embed(pos, (24, 24), (12, 101), 1)
    assert out2.shape == (1, 1 + 12 * 101, 32)


def test_rotate_half_involution():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 5, 8)),
                    jnp.float32)
    y = rotate_half(rotate_half(x))
    np.testing.assert_allclose(np.asarray(y), -np.asarray(x), atol=1e-6)


def test_rope_preserves_norm_and_prefix():
    cos, sin = rope_freqs_2d(32, (4, 8), (4, 8))
    assert cos.shape == (32, 64)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 33, 64)),
                    jnp.float32)
    out = apply_rope(x, jnp.asarray(cos), jnp.asarray(sin), 1)
    # prefix token untouched
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(x[:, 0]))
    # rotation preserves per-pair norms
    def pair_norms(a):
        return np.asarray(a).reshape(2, 32, 32, 2)
    np.testing.assert_allclose(
        np.linalg.norm(pair_norms(out[:, 1:, :]), axis=-1),
        np.linalg.norm(pair_norms(x[:, 1:, :]), axis=-1), atol=1e-4)


def test_audio_mamba_with_rope():
    cfg = AudioMambaConfig(
        depth=2, embed_dim=192, spectrogram_size=(128, 128), num_classes=5,
        if_rope=True)
    model = AudioMamba(cfg, use_kernel=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 128))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    assert out.shape == (1, 5)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_deit_port_matches_numpy_transformer():
    """Port a synthetic timm-style DeiT dict and check the flax forward
    against an independent numpy transformer executor."""
    from aum_tpu.convert.ast_port import port_deit_state_dict
    from aum_tpu.convert.torch_port import merge_with_init

    D, H, DEPTH, P = 64, 4, 2, 16
    rng = np.random.default_rng(0)

    def r(*s, scale=0.1):
        return (rng.standard_normal(s) * scale).astype(np.float32)

    side = 8  # pretrain grid 8x8 (e.g. 128-image/16)
    sd = {
        "cls_token": r(1, 1, D),
        "pos_embed": r(1, 1 + side * side, D),
        "patch_embed.proj.weight": r(D, 3, P, P),
        "patch_embed.proj.bias": r(D),
        "norm.weight": 1.0 + r(D), "norm.bias": r(D),
    }
    for i in range(DEPTH):
        p = f"blocks.{i}."
        sd[p + "attn.qkv.weight"] = r(3 * D, D)
        sd[p + "attn.qkv.bias"] = r(3 * D)
        sd[p + "attn.proj.weight"] = r(D, D)
        sd[p + "attn.proj.bias"] = r(D)
        sd[p + "norm1.weight"] = 1.0 + r(D); sd[p + "norm1.bias"] = r(D)
        sd[p + "norm2.weight"] = 1.0 + r(D); sd[p + "norm2.bias"] = r(D)
        sd[p + "mlp.fc1.weight"] = r(4 * D, D); sd[p + "mlp.fc1.bias"] = r(4 * D)
        sd[p + "mlp.fc2.weight"] = r(D, 4 * D); sd[p + "mlp.fc2.bias"] = r(4 * D)[:D]

    cfg = ASTConfig(label_dim=5, input_fdim=128, input_tdim=128,
                    fstride=16, tstride=16, depth=DEPTH, embed_dim=D,
                    num_heads=H)
    assert cfg.patch_grid == (8, 8)  # same grid: no retarget needed here
    model = ASTModel(cfg)
    x = (rng.standard_normal((1, 128, 128)) * 0.5).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ported = port_deit_state_dict(sd, cfg)
    params = merge_with_init(ported, init)
    out_feats = np.asarray(
        model.apply(params, jnp.asarray(x)))

    # ---- independent numpy executor ----
    def layernorm(v, w, b):
        m = v.mean(-1, keepdims=True)
        s = v.var(-1, keepdims=True)
        return (v - m) / np.sqrt(s + 1e-6) * w + b

    spec = x[0].T  # (F, T)
    tokens = []
    kern = sd["patch_embed.proj.weight"].sum(1)  # (D, P, P)
    for i in range(8):
        for j in range(8):
            patch = spec[i * P:(i + 1) * P, j * P:(j + 1) * P]
            tokens.append((kern * patch[None]).sum((1, 2))
                          + sd["patch_embed.proj.bias"])
    seq = np.stack([sd["cls_token"][0, 0]] + tokens)
    seq = seq + sd["pos_embed"][0]
    for i in range(DEPTH):
        p = f"blocks.{i}."
        hN = layernorm(seq, sd[p + "norm1.weight"], sd[p + "norm1.bias"])
        qkv = hN @ sd[p + "attn.qkv.weight"].T + sd[p + "attn.qkv.bias"]
        q, k, v = np.split(qkv, 3, axis=-1)
        n = seq.shape[0]
        dh = D // H
        q = q.reshape(n, H, dh).transpose(1, 0, 2)
        k = k.reshape(n, H, dh).transpose(1, 0, 2)
        v = v.reshape(n, H, dh).transpose(1, 0, 2)
        att = q @ k.transpose(0, 2, 1) / np.sqrt(dh)
        att = np.exp(att - att.max(-1, keepdims=True))
        att = att / att.sum(-1, keepdims=True)
        o = (att @ v).transpose(1, 0, 2).reshape(n, D)
        o = o @ sd[p + "attn.proj.weight"].T + sd[p + "attn.proj.bias"]
        seq = seq + o
        hN = layernorm(seq, sd[p + "norm2.weight"], sd[p + "norm2.bias"])
        hN = hN @ sd[p + "mlp.fc1.weight"].T + sd[p + "mlp.fc1.bias"]
        # flax nn.gelu default is approximate (tanh)
        hN = 0.5 * hN * (1 + np.tanh(np.sqrt(2 / np.pi)
                                     * (hN + 0.044715 * hN ** 3)))
        hN = hN @ sd[p + "mlp.fc2.weight"].T + sd[p + "mlp.fc2.bias"]
        seq = seq + hN
    seq = layernorm(seq, sd["norm.weight"], sd["norm.bias"])
    cls_feat = seq[0]

    # Compare backbone features: run the flax model with return of features
    # by reusing its head params on both sides instead — simpler: apply the
    # ported head-free comparison via logits with identical head.
    head_norm_w = np.asarray(params["params"]["head_norm"]["scale"])
    head_norm_b = np.asarray(params["params"]["head_norm"]["bias"])
    head_k = np.asarray(params["params"]["head"]["kernel"])
    head_b = np.asarray(params["params"]["head"]["bias"])
    ref_logits = layernorm(cls_feat, head_norm_w, head_norm_b) @ head_k + head_b
    np.testing.assert_allclose(out_feats[0], ref_logits, rtol=2e-3, atol=2e-3)


def test_ast_pretrain_port_unwraps_and_retargets():
    from aum_tpu.convert.ast_port import (
        port_ast_pretrain_state_dict, port_deit_state_dict)
    from aum_tpu.convert.torch_port import merge_with_init

    D, H, DEPTH, P = 64, 4, 1, 16
    rng = np.random.default_rng(1)

    def r(*s):
        return (rng.standard_normal(s) * 0.1).astype(np.float32)

    # pretrain grid (4, 10); target (8, 8) -> freq interp + time crop
    deit = {
        "cls_token": r(1, 1, D),
        "pos_embed": r(1, 1 + 4 * 10, D),
        "patch_embed.proj.weight": r(D, 1, P, P),
        "patch_embed.proj.bias": r(D),
        "norm.weight": 1 + r(D), "norm.bias": r(D),
    }
    p = "blocks.0."
    deit.update({
        p + "attn.qkv.weight": r(3 * D, D), p + "attn.qkv.bias": r(3 * D),
        p + "attn.proj.weight": r(D, D), p + "attn.proj.bias": r(D),
        p + "norm1.weight": 1 + r(D), p + "norm1.bias": r(D),
        p + "norm2.weight": 1 + r(D), p + "norm2.bias": r(D),
        p + "mlp.fc1.weight": r(4 * D, D), p + "mlp.fc1.bias": r(4 * D),
        p + "mlp.fc2.weight": r(D, 4 * D), p + "mlp.fc2.bias": r(D),
    })
    sd = {"module.v." + k: v for k, v in deit.items()}
    sd["module.mlp_head.0.weight"] = 1 + r(D)
    sd["module.mlp_head.0.bias"] = r(D)
    sd["module.mlp_head.1.weight"] = r(7, D)
    sd["module.mlp_head.1.bias"] = r(7)

    cfg = ASTConfig(label_dim=7, input_fdim=128, input_tdim=128,
                    fstride=16, tstride=16, depth=DEPTH, embed_dim=D,
                    num_heads=H)
    ported = port_ast_pretrain_state_dict(sd, cfg, pretrain_grid=(4, 10))
    assert ported["params"]["pos_embed"].shape == (1, 65, D)
    assert "head" in ported["params"]  # class count matches -> head kept
    model = ASTModel(cfg)
    x = jnp.zeros((1, 128, 128))
    params = merge_with_init(ported, model.init(jax.random.PRNGKey(0), x))
    out = model.apply(params, x)
    assert out.shape == (1, 7)


def test_ast_export_port_roundtrip_identity():
    """export_ast_state_dict is the exact inverse of
    port_ast_pretrain_state_dict: flax init -> nested AST checkpoint layout
    (v. + mlp_head.) -> re-port reproduces every leaf incl. the head."""
    from aum_tpu.convert.ast_port import (export_ast_state_dict,
                                          port_ast_pretrain_state_dict)

    cfg = ASTConfig(label_dim=7, input_fdim=128, input_tdim=128,
                    fstride=16, tstride=16, depth=2, embed_dim=192,
                    num_heads=3)
    model = ASTModel(cfg)
    params = model.init(jax.random.PRNGKey(2),
                        jnp.zeros((1, 128, 128)))
    sd = export_ast_state_dict(params, cfg)
    assert all(k.startswith(("v.", "mlp_head.")) for k in sd)
    back = port_ast_pretrain_state_dict(sd, cfg)
    flat_a = jax.tree_util.tree_flatten_with_path(params["params"])[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back["params"])[0]
    assert [k for k, _ in flat_a] == [k for k, _ in flat_b]
    for (path, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(path))
