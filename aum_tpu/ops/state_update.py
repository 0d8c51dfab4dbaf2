"""Single-token selective-state update (decode step).

jnp equivalent of the reference Triton kernel `selective_state_update`
(/root/reference/vim-mamba_ssm/mamba_ssm/ops/triton/selective_state_update.py:99,
oracle at :157-192), used by `Mamba.step` for autoregressive decoding. The
decode path is not performance-critical for audio classification, so a plain
fused-by-XLA jnp implementation is the right TPU design (one token of work is
far below kernel-launch granularity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def selective_state_update(
    state: jax.Array,
    x: jax.Array,
    dt: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: jax.Array | None = None,
    z: jax.Array | None = None,
    dt_bias: jax.Array | None = None,
    dt_softplus: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """One step of the selective SSM.

    Args:
      state: (B, D, N) fp32 SSM state.
      x: (B, D) conv output for this token.
      dt: (B, D) timestep (pre-softplus if dt_softplus).
      A: (D, N); B, C: (B, N); D: (D,); z: (B, D); dt_bias: (D,).

    Returns:
      (y (B, D) in x.dtype, new_state (B, D, N) fp32).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    dt = dt.astype(jnp.float32)
    if dt_bias is not None:
        dt = dt + dt_bias.astype(jnp.float32)[None, :]
    if dt_softplus:
        dt = jax.nn.softplus(dt)
    dA = jnp.exp(dt[:, :, None] * A.astype(jnp.float32)[None, :, :])
    dB = dt[:, :, None] * B.astype(jnp.float32)[:, None, :]
    new_state = state.astype(jnp.float32) * dA + xf[:, :, None] * dB
    y = jnp.einsum("bdn,bn->bd", new_state, C.astype(jnp.float32))
    if D is not None:
        y = y + D.astype(jnp.float32)[None, :] * xf
    if z is not None:
        zf = z.astype(jnp.float32)
        y = y * (zf * jax.nn.sigmoid(zf))
    return y.astype(dtype), new_state
