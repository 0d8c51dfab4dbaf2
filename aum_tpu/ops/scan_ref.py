"""Sequential jnp oracle for the selective (input-dependent) SSM scan.

This is the ground-truth implementation the Pallas kernels in
``aum_tpu.ops.selective_scan`` are tested against. It mirrors the semantics of
the reference CUDA op's pure-PyTorch oracle (`selective_scan_ref`,
/root/reference/vim-mamba_ssm/mamba_ssm/ops/selective_scan_interface.py:86-152)
but in the TPU-natural (batch, length, channel) layout and written with
`jax.lax.scan` so it is jittable and differentiable by plain autodiff.

Recurrence (per batch b, channel d, state n; all math in fp32):

    dt_t  = softplus(delta_t + delta_bias)            (if delta_softplus)
    x_t   = exp(dt_t * A[d,n]) * x_{t-1} + dt_t * B_t[n] * u_t
    y_t   = sum_n C_t[n] * x_t[n]  (+ D[d] * u_t)
    out_t = y_t * silu(z_t)                           (if z given)

With ``reverse=True`` the recurrence runs right-to-left, which is exactly
``flip(seq) -> scan -> flip(seq)`` — the formulation the reference uses for the
backward direction of bidirectional Mamba (mamba_simple.py:229-246) — but
without materializing any flipped copies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def selective_scan_ref(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: jax.Array | None = None,
    z: jax.Array | None = None,
    delta_bias: jax.Array | None = None,
    delta_softplus: bool = False,
    reverse: bool = False,
    return_last_state: bool = False,
    initial_state: jax.Array | None = None,
):
    """Sequential selective-scan oracle.

    Args:
      u:     (B, L, D) input sequence.
      delta: (B, L, D) timestep sequence (pre-softplus if delta_softplus).
      A:     (D, N) state matrix (real, typically negative).
      B:     (B, L, N) input-dependent input matrix.
      C:     (B, L, N) input-dependent output matrix.
      D:     (D,) skip parameter or None.
      z:     (B, L, D) gate sequence or None.
      delta_bias: (D,) bias added to delta before softplus, or None.
      delta_softplus: apply softplus to delta (+bias).
      reverse: scan right-to-left instead of left-to-right.
      return_last_state: also return final state (B, D, N).
      initial_state: (B, D, N) state to start the scan from (default zeros).

    Returns:
      out (B, L, D) in u.dtype, and optionally the last fp32 state (B, D, N).
    """
    in_dtype = u.dtype
    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    Bv = B.astype(jnp.float32)
    Cv = C.astype(jnp.float32)
    A = A.astype(jnp.float32)

    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)[None, None, :]
    if delta_softplus:
        delta = jax.nn.softplus(delta)

    bsz, _, d = u.shape
    n = A.shape[1]

    def step(x, inp):
        u_t, dt_t, b_t, c_t = inp
        # (B, D, N) decays / inputs for this timestep.
        da = jnp.exp(dt_t[:, :, None] * A[None, :, :])
        dbu = (dt_t * u_t)[:, :, None] * b_t[:, None, :]
        x = da * x + dbu
        y = jnp.einsum("bdn,bn->bd", x, c_t)
        return x, y

    x0 = (jnp.zeros((bsz, d, n), dtype=jnp.float32)
          if initial_state is None else initial_state.astype(jnp.float32))
    xs = (
        jnp.swapaxes(u, 0, 1),
        jnp.swapaxes(delta, 0, 1),
        jnp.swapaxes(Bv, 0, 1),
        jnp.swapaxes(Cv, 0, 1),
    )
    last, ys = jax.lax.scan(step, x0, xs, reverse=reverse)
    y = jnp.swapaxes(ys, 0, 1)  # (B, L, D)

    if D is not None:
        y = y + u * D.astype(jnp.float32)[None, None, :]
    if z is not None:
        zf = z.astype(jnp.float32)
        y = y * (zf * jax.nn.sigmoid(zf))

    out = y.astype(in_dtype)
    if return_last_state:
        return out, last
    return out
