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
