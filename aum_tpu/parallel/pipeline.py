"""GPipe-style pipeline parallelism over the Mamba block stack.

The reference has no model parallelism of any kind (HF-Accelerate DDP only,
SURVEY.md §2.3); this op shards the DEPTH dimension of the 24-block stack
over a 'pipe' mesh axis and streams microbatches through the stages with
``ppermute`` activation handoffs — the classic GPipe schedule, expressed as
a single ``shard_map`` + ``lax.scan`` so XLA sees static control flow and
the backward (bubbles included) falls out of autodiff: the transpose of the
forward ppermute ring is the reverse ring, so the gradient pipeline runs
automatically in the opposite direction.

Positioning (CLAUDE.md round-4 notes): for THIS model shape, d_inner tensor
parallelism is communication-cheaper — TP moves two (B, L, dt_rank+2N) and
(B, L, d_model) psums per mixer, while PP hands off the full
(B_micro, L, d_model) hidden+residual pair every tick — so PP is provided
as a composable scale-out op (+ exactness/grad tests on the real block
cell), not wired into run.py; it becomes the right tool when the limiting
resource is per-chip HBM for *depth* (param + activation residency), e.g.
much deeper stacks than AuM's 24 blocks.

Schedule: S stages (axis size), M microbatches, T = M + S - 1 ticks. At
tick t, stage 0 feeds microbatch t (while t < M), every stage applies its
local depth/S sub-stack, and the result ppermutes one stage up the open
chain; stage S-1 lands microbatch t-(S-1). Devices compute garbage during
fill/drain bubbles; the masked output write keeps it out of results and
gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P


def pipeline_apply(stage_fn, stacked_params, carry, *, axis: str = "pipe",
                   microbatches: int = 4):
    """Run ``carry`` through a depth-stacked parameter tree pipelined over
    mesh axis ``axis``.

    stage_fn(local_params, carry) -> carry applies ONE STAGE's sub-stack:
    ``local_params`` is ``stacked_params`` with its leading depth axis
    sliced to depth/S (shard_map does the slicing via the P(axis, ...)
    in_specs). ``carry`` is a pytree of (B, ...) arrays (e.g. the block
    stack's (hidden, residual)); B must divide by ``microbatches``.

    Needs the mesh ambient (``jax.set_mesh``) and a jit context, like
    ops/seq_parallel.py::sharded_scan_in_jit; manual over ``axis`` only,
    so batch ('data') and d_inner ('model') shardings compose via GSPMD.
    """
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or axis not in (mesh.axis_names or ()):
        raise ValueError(
            f"pipeline_apply needs an ambient mesh with a '{axis}' axis — "
            f"wrap the jitted call in jax.set_mesh(mesh)")
    n_stages = mesh.shape[axis]
    depth = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if depth % n_stages:
        raise ValueError(f"depth {depth} not divisible by {n_stages} stages")
    batch = jax.tree_util.tree_leaves(carry)[0].shape[0]
    # `microbatches` is an upper bound: fall back to the largest divisor of
    # the actual batch (static at trace time). Eval pipelines keep their
    # partial final batch, and a tail batch must still pipeline correctly —
    # worst case m=1, which is plain sequential and exact.
    m = max(v for v in range(1, min(microbatches, batch) + 1)
            if batch % v == 0)

    p_specs = jax.tree.map(
        lambda a: P(axis, *([None] * (a.ndim - 1))), stacked_params)
    c_specs = jax.tree.map(lambda a: P(), carry)

    @functools.partial(
        jax.shard_map, in_specs=(p_specs, c_specs), out_specs=c_specs,
        axis_names={axis}, check_vma=False)
    def run(local_params, carry):
        idx = lax.axis_index(axis)
        mb = jax.tree.map(
            lambda a: a.reshape(m, batch // m, *a.shape[1:]), carry)
        state = jax.tree.map(lambda a: jnp.zeros_like(a[0]), mb)
        outs = jax.tree.map(jnp.zeros_like, mb)
        perm = [(i, i + 1) for i in range(n_stages - 1)]

        def tick(val, t):
            state, outs = val
            feed = jax.tree.map(lambda a: a[jnp.minimum(t, m - 1)], mb)
            x = jax.tree.map(
                lambda f, s: jnp.where(idx == 0, f, s), feed, state)
            y = stage_fn(local_params, x)
            out_i = t - (n_stages - 1)
            valid = jnp.logical_and(idx == n_stages - 1, out_i >= 0)
            outs = jax.tree.map(
                lambda o, yy: jnp.where(
                    valid,
                    lax.dynamic_update_index_in_dim(
                        o, yy.astype(o.dtype), jnp.maximum(out_i, 0), 0),
                    o),
                outs, y)
            # open-chain handoff: stage s's result becomes stage s+1's next
            # input; stage 0 receives zeros (overwritten by the feed).
            state = (jax.tree.map(
                lambda yy: lax.ppermute(yy, axis, perm), y)
                if n_stages > 1 else y)
            return (state, outs), None

        (state, outs), _ = lax.scan(
            tick, (state, outs), jnp.arange(m + n_stages - 1))
        # Results live on the last stage only; broadcast so every device
        # returns the full batch (a masked psum == broadcast-from-last).
        outs = jax.tree.map(
            lambda o: lax.psum(
                jnp.where(idx == n_stages - 1, o, jnp.zeros_like(o)), axis),
            outs)
        return jax.tree.map(
            lambda o: o.reshape(batch, *o.shape[2:]), outs)

    return run(stacked_params, carry)


def block_stage_fn_dp(cell, axis: str = "pipe"):
    """Stage function with stochastic depth (VERDICT r4 #5).

    The rng problem with drop_path under the shard_map pipeline is solved by
    moving the randomness OUT of the pipeline: the caller draws one
    per-(layer, sample) keep/scale array up front (models/audio_mamba.py
    computes ``mask/keep`` from its own ``make_rng('dropout')``) and appends
    it to the pipeline carry, so the scales travel WITH each microbatch
    through the ``(m, B/m, ...)`` reshape and the bubble masking, exactly
    like the activations. Each stage slices its own depth range by
    ``axis_index`` and feeds the per-layer per-sample scale to the cell as
    the scan xs (rank >= 1 selects the precomputed-scale branch in
    ``_BlockCell``/``_BlockPair``; a scalar/(2,) xs means "rate, draw rng
    inside", which is the sequential nn.scan path).

    Carry layout: ``(*state, scales)`` where ``scales`` is
    (B, depth[, 2]) — batch-leading so pipeline_apply's microbatching slices
    it consistently with the activations.
    """

    def f(local_params, carry):
        *state, scales = carry
        state = tuple(state)
        n_local = jax.tree_util.tree_leaves(local_params)[0].shape[0]
        idx = lax.axis_index(axis)
        local = lax.dynamic_slice_in_dim(
            scales, idx * n_local, n_local, axis=1)
        xs = jnp.moveaxis(local, 1, 0)  # (n_local, B_micro[, 2])

        def body(c, inp):
            layer_params, s = inp
            c, _ = cell.apply({"params": layer_params}, c, s)
            return c, None

        state, _ = lax.scan(body, state, (local_params, xs))
        return (*state, scales)

    return f


def block_stage_fn(cell):
    """Stage function for a flax scan-cell module (e.g.
    models/audio_mamba.py::_BlockCell): sequentially applies the stage's
    local layers — ``local_params`` keeps the nn.scan leading depth axis."""

    def f(local_params, carry):
        def body(c, layer_params):
            c, _ = cell.apply({"params": layer_params}, c, None)
            return c, None

        carry, _ = lax.scan(body, carry, local_params)
        return carry

    return f
