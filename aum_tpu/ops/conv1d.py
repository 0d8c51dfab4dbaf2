"""Depthwise causal 1D convolution (the Mamba "short conv"), TPU-style.

The reference uses a dedicated CUDA op (`causal_conv1d_cuda`, wrapped at
/root/reference/vim-mamba_ssm/mamba_ssm/ops/selective_scan_interface.py:177 and
mamba_simple.py:271-280): a depthwise conv with kernel k (default 4), left
padding k-1, optionally fused with SiLU.

On TPU, a k-tap depthwise conv is just k shifted multiply-adds — pure VPU work
that XLA fuses with the surrounding elementwise ops, so no custom kernel is
needed (this is a deliberate design decision, see SURVEY.md §2.2). We express
it as k equal-size slices of ONE zero-padded copy: device profiling showed
the earlier per-tap slice+concat form materialized three ~100MB shifted
copies per call (3.1 ms at eval shapes); the pad-once form fuses into a
single pass (0.7 ms). Math runs in x.dtype — in bf16 model runs the 4-tap
sum rounds within ~1 ulp of fp32 accumulation, and fp32 runs are exact.

``reverse=True`` computes flip(seq) -> causal conv -> flip(seq), i.e. an
anti-causal conv, used by the backward branch of bidirectional Mamba v2
(mamba_simple.py:229-241 runs the full branch on the flipped sequence) without
materializing flipped copies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def causal_conv1d(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    activation: str | None = "silu",
    reverse: bool = False,
) -> jax.Array:
    """Depthwise causal conv along the sequence axis.

    Args:
      x: (B, L, D) input.
      weight: (D, K) per-channel filter taps, tap k multiplies x[t - (K-1) + k]
        (same orientation as the reference's Conv1d weight squeezed to (d, w)).
      bias: (D,) or None.
      activation: None | "silu".
      reverse: anti-causal (right-padded, taps reversed) — equivalent to
        flipping the sequence before and after a causal conv.

    Returns:
      (B, L, D), same dtype as x.
    """
    k = weight.shape[1]
    b_, l_, d_ = x.shape
    w = weight.astype(x.dtype)
    # One zero-padded copy; every tap is an equal-size slice of it (all
    # fusible into a single elementwise pass — see module docstring).
    if not reverse:
        xp = jnp.pad(x, [(0, 0), (k - 1, 0), (0, 0)])
    else:
        xp = jnp.pad(x, [(0, 0), (0, k - 1), (0, 0)])
    out = None
    for i in range(k):
        # Causal: slice offset i holds x shifted right by (k-1-i) steps and
        # multiplies tap i; anti-causal mirrors the taps.
        tap = i if not reverse else (k - 1 - i)
        xi = jax.lax.slice(xp, (0, i, 0), (b_, i + l_, d_))
        term = xi * w[None, None, :, tap]
        out = term if out is None else out + term
    if bias is not None:
        out = out + bias[None, None, :].astype(x.dtype)
    if activation == "silu":
        out = out * jax.nn.sigmoid(out)
    elif activation is not None:
        raise ValueError(f"unsupported activation: {activation}")
    return out


def causal_conv1d_update(
    x: jax.Array,
    conv_state: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    activation: str | None = "silu",
) -> tuple[jax.Array, jax.Array]:
    """Single-token decode step of the causal conv.

    Mirrors `causal_conv1d_update` (reference mamba_simple.py:328-334): rolls
    the (B, D, K) state left by one, appends x, and applies the filter.

    Args:
      x: (B, D) new token.
      conv_state: (B, D, K) previous inputs (oldest first).
      weight: (D, K).

    Returns:
      (y (B, D), new_conv_state (B, D, K)).
    """
    conv_state = jnp.concatenate([conv_state[:, :, 1:], x[:, :, None]], axis=2)
    y = jnp.einsum("bdk,dk->bd", conv_state, weight)
    if bias is not None:
        y = y + bias[None, :]
    if activation == "silu":
        y = y * jax.nn.sigmoid(y)
    return y, conv_state
