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


def test_pipeline_validates_depth_and_adjusts_microbatches():
    cell, scanned, params, carry = _stack_and_inputs()
    mesh = _pipe_mesh(4)
    (h_ref, _), _ = scanned.apply(params, carry, None)
    with jax.set_mesh(mesh):
        # depth must divide the stage count — hard error
        bad = jax.tree.map(lambda a: a[:6], params["params"])
        with pytest.raises(ValueError, match="not divisible"):
            pipeline_apply(block_stage_fn(cell), bad, carry,
                           axis="pipe", microbatches=4)
        # microbatches is an UPPER BOUND: B=8 with microbatches=3 falls
        # back to the largest divisor (2) and stays exact — eval pipelines
        # keep partial tail batches, which must still pipeline.
        h, _ = jax.jit(lambda p, c: pipeline_apply(
            block_stage_fn(cell), p, c, axis="pipe", microbatches=3))(
                params["params"], carry)
        np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                                   rtol=2e-5, atol=2e-5)
        # odd tail batch (B=5 -> m=1, plain sequential through the stages)
        tail = jax.tree.map(lambda a: a[:5], carry)
        (h_ref5, _), _ = scanned.apply(params, tail, None)
        h5, _ = jax.jit(lambda p, c: pipeline_apply(
            block_stage_fn(cell), p, c, axis="pipe", microbatches=4))(
                params["params"], tail)
        np.testing.assert_allclose(np.asarray(h5), np.asarray(h_ref5),
                                   rtol=2e-5, atol=2e-5)


def test_model_pipeline_matches_unsharded():
    """AudioMamba(pipe_axis='pipe') — the framework wiring: apply mode
    reads the nn.scan stacked params and pipelines them; logits must equal
    the plain model's, on a ('data','pipe') mesh, including TP composition
    on ('data','pipe','model')."""
    from aum_tpu.models import AudioMamba, AudioMambaConfig
    from aum_tpu.parallel import make_mesh, shard_params

    cfg = AudioMambaConfig(
        depth=4, embed_dim=128, spectrogram_size=(128, 64), num_classes=5,
        d_state=8, bimamba_type="v2", remat=False)
    plain = AudioMamba(cfg, use_kernel=True)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 64, 128))
    params = plain.init(jax.random.PRNGKey(3), x[:1])
    ref = np.asarray(jax.jit(plain.apply)(params, x))

    for n_data, n_pipe, n_model in [(2, 4, 1), (2, 2, 2)]:
        mesh = make_mesh(n_data=n_data, n_model=n_model, n_pipe=n_pipe)
        pp = AudioMamba(cfg, use_kernel=True, pipe_axis="pipe",
                        pipe_microbatches=4)
        sharded = shard_params(params, mesh)
        # PP layout: stacked depth axis on 'pipe'
        blk = sharded["params"]["layers"]["block"]["mixer"]["A_log"]
        assert "pipe" in tuple(blk.sharding.spec), blk.sharding
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        with jax.set_mesh(mesh):
            out = np.asarray(jax.jit(pp.apply)(sharded, xs))
        np.testing.assert_allclose(out, ref, rtol=3e-5, atol=3e-5,
                                   err_msg=f"{n_data}x{n_pipe}x{n_model}")


def test_train_step_loss_equality_pipeline():
    """ONE full train step with the stack pipelined over 'pipe' equals the
    unsharded step's loss and updated params (autodiff'd GPipe backward +
    Adam on the pipe-sharded stacked params)."""
    from aum_tpu.models import AudioMamba, AudioMambaConfig
    from aum_tpu.parallel import make_mesh
    from aum_tpu.train import TrainHyperParams, make_optimizer
    from aum_tpu.train.loop import (
        AugmentConfig,
        init_train_state,
        make_train_step,
    )

    cfg = AudioMambaConfig(
        depth=4, embed_dim=128, spectrogram_size=(128, 64), num_classes=5,
        d_state=8, bimamba_type="v2", remat=False)
    tx = make_optimizer(TrainHyperParams(lr=1e-3, n_epochs=2),
                        steps_per_epoch=4)
    x = jax.random.normal(jax.random.PRNGKey(4), (8, 64, 128))
    y = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(5), (8,), 0, 5), 5)
    batch = {"x": x, "y": y}
    rng = jax.random.PRNGKey(6)

    plain = AudioMamba(cfg, use_kernel=True)
    state0 = init_train_state(plain, tx, jax.random.PRNGKey(7), x[:1])
    step0 = make_train_step(plain, tx, None, loss_type="CE",
                            augment=AugmentConfig(), donate=False)
    s_ref, loss_ref = step0(state0, batch, rng)

    mesh = make_mesh(n_data=2, n_model=1, n_pipe=4)
    pp = AudioMamba(cfg, use_kernel=True, pipe_axis="pipe",
                    pipe_microbatches=4)
    with jax.set_mesh(mesh):
        state1 = init_train_state(plain, tx, jax.random.PRNGKey(7), x[:1],
                                  mesh=mesh)
        step1 = make_train_step(pp, tx, mesh, loss_type="CE",
                                augment=AugmentConfig(), donate=False)
        s_pp, loss_pp = step1(state1, batch, rng)
        np.testing.assert_allclose(float(loss_pp), float(loss_ref),
                                   rtol=2e-6)
        for (pa, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(s_ref.params)[0],
                jax.tree_util.tree_flatten_with_path(s_pp.params)[0]):
            s = np.abs(np.asarray(a)).max() + 1e-30
            np.testing.assert_allclose(
                np.asarray(b) / s, np.asarray(a) / s, atol=3e-6,
                err_msg=str(pa))


def test_model_rejects_pipe_plus_seq():
    from aum_tpu.models import AudioMamba, AudioMambaConfig

    cfg = AudioMambaConfig(depth=2, embed_dim=64,
                           spectrogram_size=(128, 32), num_classes=3,
                           d_state=8, remat=False)
    m = AudioMamba(cfg, pipe_axis="pipe", seq_axis="seq")
    with pytest.raises(ValueError, match="cannot be combined"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 128)))


def test_model_pipeline_bidirectional_pairs():
    """if_bidirectional=True pipelines the _BlockPair cells (depth//2
    stacked pairs) — the second wired branch in audio_mamba.py."""
    from aum_tpu.models import AudioMamba, AudioMambaConfig
    from aum_tpu.parallel import make_mesh, shard_params

    cfg = AudioMambaConfig(
        depth=4, embed_dim=128, spectrogram_size=(128, 64), num_classes=5,
        d_state=8, bimamba_type="none", if_bidirectional=True, remat=False)
    plain = AudioMamba(cfg, use_kernel=True)
    x = jax.random.normal(jax.random.PRNGKey(8), (8, 64, 128))
    params = plain.init(jax.random.PRNGKey(9), x[:1])
    ref = np.asarray(jax.jit(plain.apply)(params, x))
    mesh = make_mesh(n_data=4, n_model=1, n_pipe=2)  # 2 stages x 1 pair
    pp = AudioMamba(cfg, use_kernel=True, pipe_axis="pipe",
                    pipe_microbatches=4)
    sharded = shard_params(params, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    with jax.set_mesh(mesh):
        out = np.asarray(jax.jit(pp.apply)(sharded, xs))
    np.testing.assert_allclose(out, ref, rtol=3e-5, atol=3e-5)
