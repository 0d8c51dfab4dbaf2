"""Spectrogram patch embedding + learnable positional embedding with
flexible-resolution resampling, in JAX.

Re-design of the reference FlexiAST tokenization utilities
(/root/reference/src/utilities/tokenization.py):

- `patch_grid_shape`: the conv output-grid arithmetic the reference probes
  with a throwaway Conv2d (tokenization.py:378-386) — here it's just the
  closed-form valid-conv formula.
- `resize_matrix` / `resize_matrix_pinv` / `resample_patch_embed`: the
  big_vision pseudo-inverse patch-kernel resize (tokenization.py:68-150).
  The bilinear resize matrix is built in closed form (align_corners=False
  bilinear, matching torch.nn.functional.interpolate) instead of probing
  torch with basis vectors; `resample_patch_embed` then applies pinv(R).
- `resample_abs_pos_embed`: bilinear pos-embedding grid resampling with
  prefix-token bookkeeping (tokenization.py:26-66).
- `PatchEmbed`: conv patch projection with decoupled patch size / strides
  (tokenization.py:197-310), (B, F, T, 1) NHWC in, (B, N, D) out with the
  reference's (F-major, T-minor) patch ordering.
- `PosEmbed`: learnable absolute pos-embedding `(1, prefix + F'*T', D)` whose
  forward handles the cls-token-at-arbitrary-position insertion the reference
  implements with insert_to/from_prefix shuffles (tokenization.py:389-451);
  with a *static* token position this reduces to two adds, which is what we
  do (no gathers on TPU).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def to_2tuple(x) -> Tuple[int, int]:
    if isinstance(x, (tuple, list)):
        return (int(x[0]), int(x[1]))
    return (int(x), int(x))


def patch_grid_shape(
    strides: Tuple[int, int],
    patch_size: Tuple[int, int],
    input_fdim: int,
    input_tdim: int,
) -> Tuple[int, int]:
    """Valid-conv output grid (f_dim, t_dim).

    Closed form of the reference's Conv2d probe (tokenization.py:378-386):
    out = floor((in - kernel) / stride) + 1.
    """
    patch_size = to_2tuple(patch_size)
    f = (input_fdim - patch_size[0]) // strides[0] + 1
    t = (input_tdim - patch_size[1]) // strides[1] + 1
    return f, t


# ---------------------------------------------------------------------------
# Bilinear resize matrices (torch.F.interpolate-compatible, align_corners=False)
# ---------------------------------------------------------------------------


def _bilinear_resize_matrix_1d(old: int, new: int) -> np.ndarray:
    """(new, old) matrix M with (M @ x) == bilinear resize of x.

    Matches torch.nn.functional.interpolate(mode='bilinear',
    align_corners=False, antialias=False): source coordinate
    s = (d + 0.5) * old/new - 0.5, clamped, linear blend of floor/ceil.
    """
    m = np.zeros((new, old), dtype=np.float64)
    scale = old / new
    for d in range(new):
        s = (d + 0.5) * scale - 0.5
        s = min(max(s, 0.0), old - 1.0)
        lo = int(math.floor(s))
        hi = min(lo + 1, old - 1)
        w = s - lo
        m[d, lo] += 1.0 - w
        m[d, hi] += w
    return m


def resize_matrix(old_size: Sequence[int], new_size: Sequence[int]) -> np.ndarray:
    """(new_h*new_w, old_h*old_w) separable bilinear resize matrix."""
    mh = _bilinear_resize_matrix_1d(old_size[0], new_size[0])
    mw = _bilinear_resize_matrix_1d(old_size[1], new_size[1])
    return np.kron(mh, mw)


def resize_matrix_pinv(old_size: Sequence[int], new_size: Sequence[int]) -> np.ndarray:
    """Pseudo-inverse of the resize matrix (big_vision PI-resize,
    tokenization.py:68-103). Returns (new_h*new_w, old_h*old_w)."""
    if tuple(old_size) == tuple(new_size):
        return np.eye(int(np.prod(old_size)))
    r = resize_matrix(old_size, new_size)  # (new, old)
    return np.linalg.pinv(r.T)             # (new, old)


def resample_patch_embed(
    kernel: jax.Array, new_size: Sequence[int], pinv: Optional[np.ndarray] = None
) -> jax.Array:
    """PI-resize a patch-projection kernel.

    kernel: (kh, kw, in_ch, D) [JAX HWIO layout]. Returns (nh, nw, in_ch, D).
    Equivalent to the reference `resample_patch_embed` (tokenization.py:
    105-150) which operates on torch OIHW kernels.
    """
    kh, kw, cin, d = kernel.shape
    if (kh, kw) == tuple(new_size):
        return kernel
    if pinv is None:
        pinv = resize_matrix_pinv((kh, kw), new_size)
    mat = jnp.asarray(pinv, dtype=jnp.float32)  # (new, old)
    flat = kernel.reshape(kh * kw, cin * d).astype(jnp.float32)
    out = mat @ flat
    return out.reshape(new_size[0], new_size[1], cin, d).astype(kernel.dtype)


def vanilla_resample_patch_embed(
    kernel: jax.Array, new_size: Sequence[int]
) -> jax.Array:
    """Plain bilinear kernel resize (tokenization.py:152-169)."""
    kh, kw, cin, d = kernel.shape
    if (kh, kw) == tuple(new_size):
        return kernel
    mat = jnp.asarray(resize_matrix((kh, kw), new_size), jnp.float32)
    flat = kernel.reshape(kh * kw, cin * d).astype(jnp.float32)
    out = mat @ flat
    return out.reshape(new_size[0], new_size[1], cin, d).astype(kernel.dtype)


def resample_abs_pos_embed(
    posemb: jax.Array,
    new_size: Tuple[int, int],
    old_size: Tuple[int, int],
    num_prefix_tokens: int = 1,
) -> jax.Array:
    """Bilinear-resample a (1, prefix + oh*ow, D) pos-embedding to a new grid.

    Mirrors tokenization.py:26-66 (interpolation='bilinear'; the reference
    passes antialias=True but bilinear *up*-sampling is unaffected by
    antialias, and AuM checkpoint retargeting only ever upsamples the
    time axis; exactness for downsampling is revisited in the porter tests).
    """
    if tuple(new_size) == tuple(old_size):
        return posemb
    prefix, grid = posemb[:, :num_prefix_tokens], posemb[:, num_prefix_tokens:]
    d = grid.shape[-1]
    mat = jnp.asarray(resize_matrix(old_size, new_size), jnp.float32)
    out = mat @ grid.reshape(old_size[0] * old_size[1], d).astype(jnp.float32)
    out = out.reshape(1, new_size[0] * new_size[1], d).astype(posemb.dtype)
    return jnp.concatenate([prefix, out], axis=1)


def lecun_normal_truncated(key, shape, dtype=jnp.float32):
    """timm lecun_normal_: truncated normal (±2σ) with variance-corrected std,
    fan_in scaling — matches the patch-conv init (tokenization.py:227)."""
    fan_in = int(np.prod(shape[:-1]))
    std = math.sqrt(1.0 / fan_in) / 0.87962566103423978
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std


def trunc_normal_02(key, shape, dtype=jnp.float32):
    """timm trunc_normal_(std=.02): N(0, .02) truncated to ±2 (abs)."""
    return jax.random.truncated_normal(key, -100.0, 100.0, shape, dtype) * 0.02


class PatchEmbed(nn.Module):
    """Conv patch projection with decoupled patch size / strides.

    Input (B, F, T) spectrogram -> (B, N, D) tokens ordered F-major then T
    (the reference's Conv2d(...).flatten(2) ordering, tokenization.py:306-309,
    after the (B,T,F)->(B,1,F,T) transpose at mamba_models.py:510-511).

    Runtime flexible patch sizes (the FlexiPatchEmbed feature,
    tokenization.py:278-302) are supported by passing `patch_size=`/`strides=`
    to __call__; the stored kernel is PI-resized on the fly. Each distinct
    size is a different static shape under jit (one compile per size), same
    as the reference's per-size precomputed pinv matrices.
    """

    patch_size: Tuple[int, int] = (16, 16)
    strides: Tuple[int, int] = (16, 16)
    embed_dim: int = 768
    use_bias: bool = True
    use_pi_resize: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, patch_size=None, strides=None) -> jax.Array:
        ph, pw = to_2tuple(self.patch_size)
        kernel = self.param("proj_weight", lecun_normal_truncated,
                            (ph, pw, 1, self.embed_dim))
        bias = (self.param("proj_bias", nn.initializers.zeros,
                           (self.embed_dim,)) if self.use_bias else None)

        run_patch = to_2tuple(patch_size) if patch_size is not None else (ph, pw)
        run_strides = (to_2tuple(strides) if strides is not None
                       else to_2tuple(self.strides))
        if run_patch != (ph, pw):
            resize = (resample_patch_embed if self.use_pi_resize
                      else vanilla_resample_patch_embed)
            kernel = resize(kernel, run_patch)

        x = x[..., None]  # (B, F, T, 1) NHWC
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=run_strides, padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        b, f, t, d = out.shape
        out = out.reshape(b, f * t, d)
        if bias is not None:
            out = out + bias.astype(self.dtype)
        return out


class PosEmbed(nn.Module):
    """Learnable absolute positional embedding with prefix-token layout.

    Stored as (1, n_prefix + F'*T', D) with the cls token(s) at the *front*
    (the reference's pos_embed_prefix layout, tokenization.py:347-375).
    The forward adds pos_embed to a token sequence whose cls token sits at
    `token_position` — equivalent to the reference's insert_to_prefix /
    add / insert_from_prefix dance (tokenization.py:414-451) but with the
    position static it is two slice-adds, no gathers.

    Runtime grid resampling (flexible patch size, tokenization.py:425-447)
    bilinearly resamples the stored grid to the runtime grid.
    """

    pos_grid_size: Tuple[int, int]
    embed_dim: int = 768
    n_prefix_tokens: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, token_position=None,
                 run_grid_size=None) -> jax.Array:
        gh, gw = self.pos_grid_size
        n_pos = self.n_prefix_tokens + gh * gw
        pos = self.param("pos_embed", trunc_normal_02,
                         (1, n_pos, self.embed_dim))
        if run_grid_size is not None and tuple(run_grid_size) != (gh, gw):
            pos = resample_abs_pos_embed(
                pos, tuple(run_grid_size), (gh, gw), self.n_prefix_tokens)
        pos = pos.astype(x.dtype)

        if token_position is None or self.n_prefix_tokens == 0:
            return x + pos

        npre = self.n_prefix_tokens
        prefix_pos, grid_pos = pos[:, :npre], pos[:, npre:]
        if isinstance(token_position, (list, tuple)):
            # double cls token: positions [0, N+1] — prefix pos embeds go to
            # those sequence slots in order.
            parts = []
            cursor = 0
            seq_positions = list(token_position)
            grid_cursor = 0
            for i, tp in enumerate(seq_positions):
                if tp > cursor:
                    parts.append(x[:, cursor:tp]
                                 + grid_pos[:, grid_cursor:grid_cursor + tp - cursor])
                    grid_cursor += tp - cursor
                parts.append(x[:, tp:tp + 1] + prefix_pos[:, i:i + 1])
                cursor = tp + 1
            if cursor < x.shape[1]:
                parts.append(x[:, cursor:] + grid_pos[:, grid_cursor:])
            return jnp.concatenate(parts, axis=1)

        tp = int(token_position)
        return jnp.concatenate([
            x[:, :tp] + grid_pos[:, :tp],
            x[:, tp:tp + 1] + prefix_pos,
            x[:, tp + 1:] + grid_pos[:, tp:],
        ], axis=1)
