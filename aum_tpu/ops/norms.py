"""Fused residual-add + RMSNorm/LayerNorm, TPU-style.

The reference ships Triton kernels for fused add+norm with an fp32 residual
stream (/root/reference/vim-mamba_ssm/mamba_ssm/ops/triton/layernorm.py,
used by Block at /root/reference/src/models/mamba_models.py:77-99, 648-657).

On TPU no custom kernel is needed: XLA fuses the elementwise add, the variance
reduction and the scale into one loop over VMEM-resident tiles. What *does*
need to be preserved is the numerics contract of the Triton op:

- the residual accumulates in fp32 (`residual_in_fp32`),
- the normalization itself is computed in fp32,
- the normalized output is cast back to the compute dtype of the weights.

`fused_add_norm(..., prenorm=True)` returns (normed, new_residual) like the
reference's `rms_norm_fn(..., prenorm=True)`; `prenorm=False` returns only the
normed output (used for the final norm).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """RMSNorm in fp32, output cast to weight dtype. x: (..., D), weight: (D,)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(weight.dtype)


def layer_norm(
    x: jax.Array, weight: jax.Array, bias: jax.Array | None, eps: float = 1e-5
) -> jax.Array:
    """LayerNorm in fp32, output cast to weight dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(weight.dtype)


def fused_add_norm(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    residual: jax.Array | None = None,
    prenorm: bool = True,
    residual_in_fp32: bool = True,
    eps: float = 1e-5,
    norm_type: str = "rms",
):
    """residual' = residual + x (fp32); y = Norm(residual').

    Matches the contract of the reference Triton `rms_norm_fn`/`layer_norm_fn`
    (layernorm.py:464-502). Returns (y, residual') if prenorm else y.
    """
    res = x if residual is None else residual + x
    if residual_in_fp32:
        res = res.astype(jnp.float32)
    if norm_type == "rms":
        y = rms_norm(res, weight, eps)
    elif norm_type == "layer":
        y = layer_norm(res, weight, bias, eps)
    else:
        raise ValueError(f"unknown norm_type: {norm_type}")
    if prenorm:
        return y, res
    return y
