"""Sequence-parallel selective scan over a mesh axis.

The selective scan is a linear recurrence x_t = a_t x_{t-1} + b_t, so a
length-sharded sequence can be scanned in parallel with one tiny carry
exchange: each shard scans its local segment from zero, shards exchange
(decay-product, end-state) summaries, every shard combines the summaries of
the shards before it into its true start state, and a second local scan from
that start state produces exact outputs. The decay product over a segment
collapses to a single exp — ``prod_t exp(dt_t A) = exp((sum_t dt_t) A)`` — so
the summary costs one (B, D) reduction plus one (B, D, N) exp, and the
exchange moves only (B, D, N) per shard over ICI.

This is the long-context extension sketched in docs/DESIGN.md §3; the
reference has no equivalent (it is DDP-only — SURVEY.md §5). Compute cost is
two local scans (the classic state-passing trade), so wall-clock scales as
S/2 versus one device; the exchange is an all_gather of S·(B, D, N) fp32,
bytes that round to nothing against the scan's chunk traffic.

Everything here is plain jnp + the custom-VJP ``selective_scan`` with its
initial/final-state ports, so the whole construction is differentiable —
gradients flow through both passes and the carry combination automatically —
and it runs under ``shard_map`` (wrapper provided) or inside any caller-owned
SPMD region.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from aum_tpu.ops.selective_scan import _softplus, selective_scan


def _segment_summary(delta, A, delta_bias, delta_softplus):
    """(B, D, N) decay product over the local segment, via exp(sum(dt)·A)."""
    dt = delta.astype(jnp.float32)
    if delta_bias is not None:
        dt = dt + delta_bias.astype(jnp.float32)[None, None, :]
    if delta_softplus:
        dt = _softplus(dt)
    sum_dt = jnp.sum(dt, axis=1)                      # (B, D)
    return jnp.exp(sum_dt[:, :, None] * A.astype(jnp.float32)[None])


def seq_parallel_scan(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: jax.Array | None = None,
    z: jax.Array | None = None,
    delta_bias: jax.Array | None = None,
    delta_softplus: bool = True,
    reverse: bool = False,
    axis: str = "seq",
    initial_state: jax.Array | None = None,
    return_final_state: bool = False,
    **scan_kwargs,
):
    """Selective scan whose LENGTH dimension is sharded over mesh axis
    ``axis``. Must be called inside an SPMD region (shard_map) where every
    (B, L, ...) operand holds this shard's contiguous L-segment, in order
    along ``axis``. A/D/delta_bias are replicated.

    Returns the local segment of outputs (and, with return_final_state, the
    replicated global final state).
    """
    idx = jax.lax.axis_index(axis)
    size = jax.lax.axis_size(axis)

    # Pass 1: local scan from zero -> segment summary (P, s).
    _, s_loc = selective_scan(
        u, delta, A, B, C, D, z, delta_bias, delta_softplus, reverse=reverse,
        return_final_state=True, **scan_kwargs)
    p_loc = _segment_summary(delta, A, delta_bias, delta_softplus)

    # Exchange summaries and combine the segments BEFORE this shard in scan
    # order ((P1,s1) then (P2,s2) composes to (P1 P2, P2 s1 + s2)). A
    # reverse scan consumes segments right-to-left, so flip the gathered
    # order instead of special-casing the combine.
    ps = jax.lax.all_gather(p_loc, axis)              # (S, B, D, N)
    ss = jax.lax.all_gather(s_loc, axis)
    if reverse:
        ps = jnp.flip(ps, axis=0)
        ss = jnp.flip(ss, axis=0)
    x0_global = (jnp.zeros_like(s_loc) if initial_state is None
                 else initial_state.astype(jnp.float32))

    def combine(carry, pair):
        p, s = pair
        return p * carry + s, carry  # new running state, exclusive prefix

    x_fin, x_starts = jax.lax.scan(combine, x0_global, (ps, ss))
    order = (size - 1 - idx) if reverse else idx
    x_start = x_starts[order]

    # Pass 2: exact local outputs from the true start state.
    out = selective_scan(
        u, delta, A, B, C, D, z, delta_bias, delta_softplus, reverse=reverse,
        initial_state=x_start, return_final_state=False, **scan_kwargs)
    if return_final_state:
        return out, x_fin
    return out


def sharded_scan_in_jit(
    u, delta, A, B, C, D=None, z=None, delta_bias=None, *,
    axis: str = "seq", delta_softplus: bool = True, reverse: bool = False,
    use_kernel=None, **scan_kwargs,
):
    """``seq_parallel_scan`` for use INSIDE a GSPMD-jitted model (the
    framework wiring — VERDICT r3 #5).

    Wraps the scan in a ``jax.shard_map`` that is manual over ``axis`` ONLY
    (``axis_names={axis}``): the batch/'data' and d_inner/'model' placements
    of the operands stay under GSPMD, so sequence parallelism composes with
    DP and TP in the same jit (verified exact on a data×seq×model CPU mesh,
    tests/test_seq_parallel.py). Requires the mesh to be ambient at trace
    time — ``jax.set_mesh(mesh)`` (run.py does this when --n-seq > 1).

    The token length is padded to a multiple of the axis size with dt→0
    tokens (decay 1, contribution 0 — exact for forward AND reverse scans;
    AuM's L = n_patches + cls is rarely divisible) and sliced back.
    """
    from jax.sharding import PartitionSpec as P

    assert D is not None and z is not None and delta_bias is not None, (
        "sharded_scan_in_jit expects the full AuM operand set")
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or axis not in (mesh.axis_names or ()):
        raise ValueError(
            f"sequence-parallel scan needs an ambient mesh with a "
            f"'{axis}' axis — wrap the jitted call in jax.set_mesh(mesh)")
    size = mesh.shape[axis]
    L = u.shape[1]
    pad = (-L) % size
    if pad:
        padL = lambda t: jnp.pad(t, ((0, 0), (0, pad), (0, 0)))
        u, B, C = padL(u), padL(B), padL(C)
        z = None if z is None else padL(z)
        # softplus(-1e4 + dt_bias) == 0 exactly -> padded steps are no-ops.
        delta = jnp.pad(delta, ((0, 0), (0, pad), (0, 0)),
                        constant_values=(-1e4 if delta_softplus else 0.0))
    seq = P(None, axis, None)
    rep = P()

    @functools.partial(
        jax.shard_map,
        in_specs=(seq, seq, rep, seq, seq, rep, seq, rep),
        out_specs=seq, axis_names={axis}, check_vma=False)
    def f(u, delta, A, B, C, D, z, delta_bias):
        return seq_parallel_scan(
            u, delta, A, B, C, D, z, delta_bias,
            delta_softplus=delta_softplus, reverse=reverse, axis=axis,
            use_kernel=use_kernel, **scan_kwargs)

    out = f(u, delta, A, B, C, D, z, delta_bias)
    return out[:, :L] if pad else out


def make_sharded_scan(mesh, axis: str = "seq", **defaults):
    """shard_map-wrapped ``seq_parallel_scan`` over ``mesh``'s ``axis``.

    Returns f(u, delta, A, B, C, D, z, delta_bias) operating on GLOBAL
    (B, L, ...) arrays with L sharded over ``axis`` by GSPMD; all other
    dims replicated. L must divide evenly by the axis size.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    seq = P(None, axis, None)
    rep = P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(seq, seq, rep, P(None, axis, None), P(None, axis, None),
                  rep, seq, rep),
        out_specs=seq,
        check_vma=False)
    def f(u, delta, A, B, C, D, z, delta_bias):
        return seq_parallel_scan(u, delta, A, B, C, D, z, delta_bias,
                                 axis=axis, **defaults)

    return f
