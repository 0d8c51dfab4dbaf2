"""2D axial rotary position embedding (optional AuM feature, off by default).

JAX rebuild of the reference EVA-02-derived `VisionRotaryEmbedding`
(/root/reference/src/utilities/rope.py:46-97): per-axis rotary frequencies
over the (F', T') patch grid, concatenated to cover the full embedding dim,
applied as x*cos + rotate_half(x)*sin to the non-prefix tokens.

Note: the reference applies RoPE assuming the cls token is the *first*
token (rope.py:95-98) even though AuM defaults to a middle cls token; the
feature is disabled in all published configs (if_rope=False,
mamba_models.py:218). The same semantics are reproduced here.

`interp_to_grid` covers the reference's bilinear rope-buffer interpolation
on checkpoint load (mamba_models.py:479-484).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=8)
def rope_freqs_2d(
    dim: int,
    pt_seq_len: Tuple[int, int],
    ft_seq_len: Tuple[int, int],
    theta: float = 10000.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) buffers of shape (F'*T', 2*2*(dim//2)) = (N, 2*dim_rounded).

    dim here is the per-axis rotary dim (the reference passes embed_dim//2,
    mamba_models.py:487-497); each axis contributes dim rounded down to even.
    """
    half = dim // 2
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2)[:half] / dim))
    th = np.arange(ft_seq_len[0]) / ft_seq_len[0] * pt_seq_len[0]
    tw = np.arange(ft_seq_len[1]) / ft_seq_len[1] * pt_seq_len[1]
    fh = np.repeat(th[:, None] * freqs[None, :], 2, axis=-1)  # (F', dim)
    fw = np.repeat(tw[:, None] * freqs[None, :], 2, axis=-1)  # (T', dim)
    full = np.concatenate([
        np.broadcast_to(fh[:, None, :], (len(th), len(tw), fh.shape[-1])),
        np.broadcast_to(fw[None, :, :], (len(th), len(tw), fw.shape[-1])),
    ], axis=-1).reshape(len(th) * len(tw), -1)
    return np.cos(full).astype(np.float32), np.sin(full).astype(np.float32)


def rotate_half(x: jax.Array) -> jax.Array:
    """(..., 2k) -> interleaved (-x2, x1) pairs (rope.py:38-42)."""
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(*x.shape[:-2], -1)


def apply_rope(
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    num_prefix_tokens: int = 1,
) -> jax.Array:
    """x: (B, P + N, D); rotates the last N tokens (rope.py:95-98)."""
    p = num_prefix_tokens
    spatial = x[:, p:, :]
    d = cos.shape[-1]
    rotated = spatial[..., :d] * cos + rotate_half(spatial[..., :d]) * sin
    if d < spatial.shape[-1]:
        rotated = jnp.concatenate([rotated, spatial[..., d:]], axis=-1)
    return jnp.concatenate([x[:, :p, :], rotated], axis=1)


def interp_to_grid(buf: np.ndarray, old_grid: Tuple[int, int],
                   new_grid: Tuple[int, int]) -> np.ndarray:
    """Bilinear-resample a (old_f*old_t, D) rope buffer to a new grid
    (mamba_models.py:479-484)."""
    from aum_tpu.models.tokenization import resize_matrix

    mat = resize_matrix(old_grid, new_grid)
    return (mat @ buf.reshape(old_grid[0] * old_grid[1], -1)).astype(
        buf.dtype)
