"""Pipeline parallelism over the Mamba block stack (VERDICT r3 #9 stretch).

pipeline_apply (aum_tpu/parallel/pipeline.py) runs the REAL block cell
(models/audio_mamba.py::_BlockCell — MambaBlock + fused add-norm, the
production stack body) depth-sharded over a 'pipe' mesh axis with GPipe
microbatching, and must be bit-equal (up to fp reassociation) to the
sequential nn.scan stack for outputs AND gradients — including composed
with a 'data' axis in the same jit. The reference is DDP-only (SURVEY.md
§2.3): no analogue exists.
"""

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aum_tpu.models.audio_mamba import _BlockCell
from aum_tpu.parallel.pipeline import block_stage_fn, pipeline_apply

DEPTH, D, L, B = 8, 32, 24, 8
BLOCK_KW = dict(d_model=D, d_state=8, bimamba_type="v2", n_layer=DEPTH,
                use_kernel=False, rms_norm=True)


def _stack_and_inputs():
    cell = _BlockCell(block_kwargs=BLOCK_KW)
    scanned = nn.scan(
        _BlockCell, variable_axes={"params": 0},
        split_rngs={"params": True}, length=DEPTH)(block_kwargs=BLOCK_KW)
    h = jax.random.normal(jax.random.PRNGKey(0), (B, L, D)) * 0.3
    r = jnp.zeros((B, L, D), jnp.float32)
    params = scanned.init(jax.random.PRNGKey(1), (h, r), None)
    return cell, scanned, params, (h, r)


def _pipe_mesh(n_pipe, n_data=1):
    devs = jax.devices()
    if len(devs) < n_pipe * n_data:
        pytest.skip("needs 8 virtual devices")
    arr = np.array(devs[: n_pipe * n_data])
    if n_data > 1:
        return Mesh(arr.reshape(n_data, n_pipe), ("data", "pipe"))
    return Mesh(arr.reshape(n_pipe), ("pipe",))


@pytest.mark.parametrize("n_stages,microbatches", [(4, 4), (2, 8), (8, 2)])
def test_pipeline_matches_sequential(n_stages, microbatches):
    cell, scanned, params, carry = _stack_and_inputs()
    (h_ref, r_ref), _ = scanned.apply(params, carry, None)
    mesh = _pipe_mesh(n_stages)
    fn = functools.partial(pipeline_apply, block_stage_fn(cell),
                           axis="pipe", microbatches=microbatches)
    with jax.set_mesh(mesh):
        h, r = jax.jit(fn)(params["params"], carry)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_grads_match_sequential():
    """The backward pipeline (autodiff of scan + ppermute: the transposed
    ring runs stage S-1 -> 0) must reproduce the sequential gradients for
    params AND inputs."""
    cell, scanned, params, carry = _stack_and_inputs()

    def loss_seq(p, c):
        (h, r), _ = scanned.apply(p, c, None)
        return jnp.sum(jnp.sin(h)) + jnp.sum(jnp.cos(r))

    g_ref = jax.grad(loss_seq, argnums=(0, 1))(params, carry)

    mesh = _pipe_mesh(4)

    def loss_pipe(p, c):
        h, r = pipeline_apply(block_stage_fn(cell), p["params"], c,
                              axis="pipe", microbatches=4)
        return jnp.sum(jnp.sin(h)) + jnp.sum(jnp.cos(r))

    with jax.set_mesh(mesh):
        g = jax.jit(jax.grad(loss_pipe, argnums=(0, 1)))(params, carry)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_ref)[0],
            jax.tree_util.tree_flatten_with_path(g)[0]):
        s = np.abs(np.asarray(a)).max() + 1e-30
        np.testing.assert_allclose(np.asarray(b) / s, np.asarray(a) / s,
                                   atol=4e-6, err_msg=str(pa))


def test_pipeline_composes_with_data_axis():
    """('data','pipe') mesh: batch sharded over 'data' by GSPMD while the
    stack pipelines over 'pipe' (manual over 'pipe' only)."""
    cell, scanned, params, carry = _stack_and_inputs()
    (h_ref, _), _ = scanned.apply(params, carry, None)
    mesh = _pipe_mesh(4, n_data=2)
    h0, r0 = carry
    with jax.set_mesh(mesh):
        hs = jax.device_put(h0, NamedSharding(mesh, P("data")))
        rs = jax.device_put(r0, NamedSharding(mesh, P("data")))
        fn = functools.partial(pipeline_apply, block_stage_fn(cell),
                               axis="pipe", microbatches=4)
        h, _ = jax.jit(fn)(params["params"], (hs, rs))
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_validates_divisibility():
    cell, _, params, carry = _stack_and_inputs()
    mesh = _pipe_mesh(4)
    with jax.set_mesh(mesh):
        with pytest.raises(ValueError, match="not divisible"):
            pipeline_apply(block_stage_fn(cell), params["params"], carry,
                           axis="pipe", microbatches=3)
        bad = jax.tree.map(lambda a: a[:6], params["params"])
        with pytest.raises(ValueError, match="not divisible"):
            pipeline_apply(block_stage_fn(cell), bad, carry,
                           axis="pipe", microbatches=4)
