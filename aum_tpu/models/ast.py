"""AST (Audio Spectrogram Transformer) baseline model, TPU-native flax.

Rebuild of the reference's AST wrapper (/root/reference/src/models/
ast_models.py:36-229), which wraps a timm DeiT: a standard pre-LN ViT
encoder over spectrogram patches with a 1-channel patch conv, cls
(+optional distillation) token, and an LN+Linear `mlp_head`. Since timm is
not part of this framework, the DeiT encoder itself is implemented here
(MHSA + MLP blocks, GELU, LayerNorm) — bf16 matmuls on the MXU.

Preserved reference behaviors:
- decoupled fstride/tstride patch conv over (F=input_fdim, T=input_tdim)
  spectrograms (ast_models.py:47-66; grid math identical to
  tokenization.patch_grid_shape);
- pos-embed retargeting from a (24, 24)-grid 224-image pretrain layout by
  center-crop / bilinear interpolation per axis (ast_models.py:89-105,
  163-181) — `retarget_pos_embed`;
- cls(+dist) token readout averaged (ast_models.py:223-226), then
  mlp_head = LayerNorm + Linear (ast_models.py:68).

Sizes (run.py:196-210): deit_base = 12 layers, 768 dim, 12 heads;
deit_small = 12 layers, 384 dim, 6 heads; '_distilled' adds the dist token.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from aum_tpu.models.tokenization import (
    patch_grid_shape,
    resize_matrix,
    trunc_normal_02,
)


@dataclasses.dataclass(frozen=True)
class ASTConfig:
    label_dim: int = 527
    fstride: int = 10
    tstride: int = 10
    input_fdim: int = 128
    input_tdim: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    distilled: bool = False
    dtype: str = "float32"

    @property
    def patch_grid(self) -> Tuple[int, int]:
        return patch_grid_shape((self.fstride, self.tstride),
                                (self.patch_size, self.patch_size),
                                self.input_fdim, self.input_tdim)

    @property
    def num_prefix(self) -> int:
        return 2 if self.distilled else 1

    @staticmethod
    def from_model_name(model_name: str, **kw) -> "ASTConfig":
        """run.py:196-210 name mapping (deit_{base,small}[_distilled]_patch16_N)."""
        if "small" in model_name:
            kw.setdefault("embed_dim", 384)
            kw.setdefault("num_heads", 6)
        kw.setdefault("distilled", "distilled" in model_name)
        return ASTConfig(**kw)


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn")(h, h)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return x + h


class ASTModel(nn.Module):
    config: ASTConfig

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # `train` is accepted for train-step interface parity with
        # AudioMamba (drop_path/pos_drop plumbing); this encoder is
        # deterministic (the reference AST's timm drop rates all default 0).
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        b = x.shape[0]
        # (B, T, F) -> (B, F, T, 1) like AST's unsqueeze/transpose
        # (ast_models.py:205-208).
        x = jnp.swapaxes(x, 1, 2).astype(dtype)[..., None]
        kernel = self.param(
            "patch_proj_weight", trunc_normal_02,
            (cfg.patch_size, cfg.patch_size, 1, cfg.embed_dim))
        bias = self.param("patch_proj_bias", nn.initializers.zeros,
                          (cfg.embed_dim,))
        out = jax.lax.conv_general_dilated(
            x, kernel.astype(dtype), (cfg.fstride, cfg.tstride), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        bsz, f, t, d = out.shape
        tokens = out.reshape(bsz, f * t, d) + bias.astype(dtype)

        cls = self.param("cls_token", trunc_normal_02, (1, 1, cfg.embed_dim))
        prefix = [jnp.tile(cls.astype(dtype), (b, 1, 1))]
        if cfg.distilled:
            dist = self.param("dist_token", trunc_normal_02,
                              (1, 1, cfg.embed_dim))
            prefix.append(jnp.tile(dist.astype(dtype), (b, 1, 1)))
        seq = jnp.concatenate(prefix + [tokens], axis=1)

        n_pos = cfg.num_prefix + f * t
        pos = self.param("pos_embed", trunc_normal_02,
                         (1, n_pos, cfg.embed_dim))
        seq = seq + pos.astype(dtype)

        for i in range(cfg.depth):
            seq = TransformerBlock(cfg.embed_dim, cfg.num_heads,
                                   cfg.mlp_ratio, dtype,
                                   name=f"block_{i}")(seq)
        seq = nn.LayerNorm(dtype=dtype, name="norm")(seq)

        if cfg.distilled:
            feats = (seq[:, 0] + seq[:, 1]) / 2
        else:
            feats = seq[:, 0]

        h = nn.LayerNorm(dtype=dtype, name="head_norm")(feats)
        return nn.Dense(cfg.label_dim, dtype=dtype,
                        kernel_init=trunc_normal_02, name="head")(h)


def retarget_pos_embed(
    pos: np.ndarray,
    old_grid: Tuple[int, int],
    new_grid: Tuple[int, int],
    num_prefix: int,
) -> np.ndarray:
    """AST pos-embed retargeting (ast_models.py:89-105, 163-181).

    Per axis: center-crop when the new grid is smaller, bilinear
    interpolate when larger. pos: (1, prefix + oh*ow, D).
    """
    prefix, grid = pos[:, :num_prefix], pos[:, num_prefix:]
    d = grid.shape[-1]
    g = grid.reshape(old_grid[0], old_grid[1], d)

    # time axis (dim 1)
    if new_grid[1] <= old_grid[1]:
        start = old_grid[1] // 2 - new_grid[1] // 2
        g = g[:, start:start + new_grid[1]]
    else:
        m = resize_matrix((1, old_grid[1]), (1, new_grid[1]))
        g = np.einsum("to,fod->ftd", m.reshape(new_grid[1], old_grid[1]), g)
    # freq axis (dim 0)
    if new_grid[0] <= old_grid[0]:
        start = old_grid[0] // 2 - new_grid[0] // 2
        g = g[start:start + new_grid[0]]
    else:
        m = resize_matrix((old_grid[0], 1), (new_grid[0], 1))
        g = np.einsum("fo,otd->ftd", m.reshape(new_grid[0], old_grid[0]), g)

    out = g.reshape(1, new_grid[0] * new_grid[1], d)
    return np.concatenate([prefix, out], axis=1)
