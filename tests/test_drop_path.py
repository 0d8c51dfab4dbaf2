"""Stochastic depth (drop_path) and pos-embed dropout.

Reference semantics (/root/reference/src/models/mamba_models.py):
- --aum_drop_path -> drop_path_rate (run.py:85, :264); per-layer rates
  follow `inter_dpr = [0.0] + linspace(0, rate, depth)[:-1]` (:290-296).
- Block i drops its incoming hidden before the fused add+norm
  (:51, :88-97); the final add+norm drops at the full rate (:293, :644-657).
- DropPath = per-sample Bernoulli branch drop, kept samples scaled 1/keep.
- drop_rate -> pos_drop, dropout after the pos-embed add (:477, :541).

All published recipes use rate 0; these tests pin that rate 0 is an exact
no-op (train or eval), that eval is always deterministic, that rate > 0
actually randomizes per-layer/per-sample at train time, and that the
feature is threaded through config -> model -> train step -> CLI --set.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aum_tpu.models.audio_mamba import (
    AudioMamba,
    AudioMambaConfig,
    _drop_path,
)

CFG = AudioMambaConfig(
    spectrogram_size=(32, 64), patch_size=(8, 8), strides=(8, 8),
    depth=4, embed_dim=64, num_classes=7, bimamba_type="v1", remat=False)


def _x(b=3, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (b, 64, 32))


def test_drop_path_unit_rate0_identity():
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 5, 6))
    y = _drop_path(jax.random.PRNGKey(2), x, 0.0)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_drop_path_unit_mask_semantics():
    # Per-sample mask: each sample is either fully zero or scaled by 1/keep.
    rate = 0.4
    x = jnp.ones((2000, 3, 4))
    y = np.asarray(_drop_path(jax.random.PRNGKey(3), x, rate))
    per_sample = y.reshape(y.shape[0], -1)
    zero = np.all(per_sample == 0.0, axis=1)
    kept = np.all(np.isclose(per_sample, 1.0 / (1 - rate)), axis=1)
    assert np.all(zero | kept)
    # Kept fraction ~ keep, and E[y] ~ x (unbiased scaling).
    assert abs(kept.mean() - (1 - rate)) < 0.05
    assert abs(y.mean() - 1.0) < 0.05


def test_rate0_train_equals_eval_exactly():
    model = AudioMamba(CFG)
    params = model.init(jax.random.PRNGKey(0), _x())
    a = model.apply(params, _x(), train=False)
    b = model.apply(params, _x(), train=True,
                    rngs={"dropout": jax.random.PRNGKey(9)})
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("bidir", [False, True])
def test_eval_ignores_rate_and_params_unchanged(bidir):
    cfg0 = dataclasses.replace(CFG, if_bidirectional=bidir)
    cfgd = dataclasses.replace(cfg0, drop_path_rate=0.3, drop_rate=0.1)
    m0, md = AudioMamba(cfg0), AudioMamba(cfgd)
    p0 = m0.init(jax.random.PRNGKey(0), _x())
    pd = md.init(jax.random.PRNGKey(0), _x())
    # drop_path introduces no params and doesn't shift initializer streams.
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), p0, pd)
    # Eval forward is byte-identical regardless of the configured rates.
    np.testing.assert_array_equal(
        np.asarray(m0.apply(p0, _x(), train=False)),
        np.asarray(md.apply(p0, _x(), train=False)))


@pytest.mark.parametrize("bidir", [False, True])
def test_train_randomizes_and_is_reproducible(bidir):
    cfg = dataclasses.replace(CFG, if_bidirectional=bidir,
                              drop_path_rate=0.8)
    model = AudioMamba(cfg)
    params = model.init(jax.random.PRNGKey(0), _x())
    y1 = model.apply(params, _x(), train=True,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    y1b = model.apply(params, _x(), train=True,
                      rngs={"dropout": jax.random.PRNGKey(1)})
    y2 = model.apply(params, _x(), train=True,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y1b))
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    # And differs from the deterministic eval forward.
    y_eval = model.apply(params, _x(), train=False)
    assert not np.allclose(np.asarray(y1), np.asarray(y_eval))


def test_pos_drop_randomizes_independently():
    cfg = dataclasses.replace(CFG, drop_rate=0.5)  # drop_path_rate stays 0
    model = AudioMamba(cfg)
    params = model.init(jax.random.PRNGKey(0), _x())
    y1 = model.apply(params, _x(), train=True,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    y2 = model.apply(params, _x(), train=True,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    np.testing.assert_array_equal(
        np.asarray(model.apply(params, _x(), train=False)),
        np.asarray(AudioMamba(CFG).apply(params, _x(), train=False)))


def test_grads_flow_with_drop_path():
    cfg = dataclasses.replace(CFG, drop_path_rate=0.3)
    model = AudioMamba(cfg)
    params = model.init(jax.random.PRNGKey(0), _x())

    def loss(p):
        y = model.apply(p, _x(), train=True,
                        rngs={"dropout": jax.random.PRNGKey(5)})
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def _pipe_mesh(n):
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < n:
        pytest.skip("needs virtual devices")
    return Mesh(np.array(devs[:n]), ("pipe",))


@pytest.mark.parametrize("bidir", [False, True])
def test_drop_path_pipeline_matches_single_stage(bidir):
    """drop_path under PP (VERDICT r4 #5): the per-(layer, sample) keep
    scales are drawn in module scope and shipped through the pipeline carry
    (parallel/pipeline.py::block_stage_fn_dp). The SAME dropout rng must
    give the SAME output whether the stack runs on 1 stage or pipelined
    over 2 — the strong check of the schedule's scale bookkeeping."""
    cfg = dataclasses.replace(CFG, if_bidirectional=bidir,
                              drop_path_rate=0.5)
    model = AudioMamba(cfg, pipe_axis="pipe", pipe_microbatches=2)
    params = AudioMamba(cfg).init(jax.random.PRNGKey(0), _x(4))
    outs = {}
    for n in (1, 2):
        mesh = _pipe_mesh(n)
        with jax.set_mesh(mesh):
            f = jax.jit(lambda p, x, k: model.apply(
                p, x, train=True, rngs={"dropout": k}))
            outs[n] = np.asarray(f(params, _x(4), jax.random.PRNGKey(7)))
    np.testing.assert_allclose(outs[1], outs[2], rtol=2e-5, atol=2e-5)


def test_drop_path_pipeline_is_live_reproducible_and_eval_exact():
    cfg = dataclasses.replace(CFG, drop_path_rate=0.8)
    model = AudioMamba(cfg, pipe_axis="pipe", pipe_microbatches=2)
    base = AudioMamba(cfg)
    params = base.init(jax.random.PRNGKey(0), _x(4))
    mesh = _pipe_mesh(2)
    with jax.set_mesh(mesh):
        f = jax.jit(lambda p, x, k: model.apply(
            p, x, train=True, rngs={"dropout": k}))
        y1 = np.asarray(f(params, _x(4), jax.random.PRNGKey(1)))
        y1b = np.asarray(f(params, _x(4), jax.random.PRNGKey(1)))
        y2 = np.asarray(f(params, _x(4), jax.random.PRNGKey(2)))
        # Eval under PP ignores the rate and equals the non-pipe eval.
        y_eval = np.asarray(jax.jit(
            lambda p, x: model.apply(p, x, train=False))(params, _x(4)))
    np.testing.assert_array_equal(y1, y1b)
    assert not np.allclose(y1, y2)
    y_eval_ref = np.asarray(base.apply(params, _x(4), train=False))
    np.testing.assert_allclose(y_eval, y_eval_ref, rtol=2e-5, atol=2e-5)


def test_drop_path_pipeline_grads_finite():
    cfg = dataclasses.replace(CFG, drop_path_rate=0.3)
    model = AudioMamba(cfg, pipe_axis="pipe", pipe_microbatches=2)
    params = AudioMamba(cfg).init(jax.random.PRNGKey(0), _x(4))
    mesh = _pipe_mesh(2)

    def loss(p, x, k):
        y = model.apply(p, x, train=True, rngs={"dropout": k})
        return jnp.sum(y ** 2)

    with jax.set_mesh(mesh):
        g = jax.jit(jax.grad(loss))(params, _x(4), jax.random.PRNGKey(5))
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_train_step_with_drop_path():
    import optax

    from aum_tpu.train.loop import TrainState, make_train_step

    cfg = dataclasses.replace(CFG, drop_path_rate=0.2)
    model = AudioMamba(cfg)
    params = model.init(jax.random.PRNGKey(0), _x())
    tx = optax.adam(1e-3)
    state = TrainState(step=0, params=params, opt_state=tx.init(params))
    step = make_train_step(model, tx, mesh=None, loss_type="BCE",
                           donate=False)
    batch = {"x": np.asarray(_x(4)),
             "y": np.zeros((4, 7), np.float32)}
    state, loss = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    # Same state + same rng reproduces; same state + different rng gives a
    # different loss (the train step's stochastic-depth path is live).
    _, loss2 = step(state, batch, jax.random.PRNGKey(4))
    _, loss2b = step(state, batch, jax.random.PRNGKey(4))
    _, loss3 = step(state, batch, jax.random.PRNGKey(5))
    assert float(loss2) == float(loss2b)
    assert float(loss2) != float(loss3)


def test_config_threading_and_cli_set():
    from aum_tpu.configs import RECIPES
    from aum_tpu.run import apply_overrides

    cfg = apply_overrides(RECIPES["speechcommands/aum-base_scratch"],
                          ["aum_drop_path=0.1", "fshift=12.5",
                           "flexible_patch_sizes=8,10,12"])
    assert cfg.model_config().drop_path_rate == pytest.approx(0.1)
    assert cfg.audio_conf(train=True).fshift == pytest.approx(12.5)
    assert cfg.flexible_patch_sizes == (8, 10, 12)


def test_init_layer_scale_threading_and_port_roundtrip():
    """init_layer_scale (mamba_simple.py:70-72) threads config -> mixer
    gamma params, scales the output at init, and round-trips through the
    torch porters."""
    from aum_tpu.convert import export_aum_state_dict, port_aum_state_dict

    cfg = dataclasses.replace(CFG, init_layer_scale=1e-2)
    model = AudioMamba(cfg, use_kernel=False)
    params = model.init(jax.random.PRNGKey(0), _x())
    gamma = params["params"]["layers"]["block"]["mixer"]["gamma"]
    assert gamma.shape == (cfg.depth, cfg.embed_dim)
    np.testing.assert_allclose(np.asarray(gamma), 1e-2)
    # Round trip: flax -> torch layout (layers.i.mixer.gamma) -> flax.
    sd = export_aum_state_dict(params, cfg)
    assert "layers.0.mixer.gamma" in sd
    back = port_aum_state_dict(sd, cfg)
    np.testing.assert_array_equal(
        np.asarray(back["params"]["layers"]["block"]["mixer"]["gamma"]),
        np.asarray(gamma))
    # gamma=init_layer_scale * ones at init -> logits = no-scale logits
    # with every mixer output scaled; at least assert the knob changes the
    # forward (vs the gamma-free model on the shared non-gamma params).
    plain = AudioMamba(CFG, use_kernel=False)
    pp = plain.init(jax.random.PRNGKey(0), _x())
    y_scaled = model.apply(params, _x())
    y_plain = plain.apply(pp, _x())
    assert not np.allclose(np.asarray(y_scaled), np.asarray(y_plain))


def test_ast_pretrain_path_threading(tmp_path):
    """Recipe ast_pretrain_path (reference --ast_pretrain*, run.py:100-107)
    loads a nested AST audio checkpoint through the runner's model builder,
    retargeting the pos embed from the configured pretrain geometry."""
    torch = pytest.importorskip("torch")

    from aum_tpu.configs import ExperimentConfig
    from aum_tpu.convert.ast_port import export_ast_state_dict
    from aum_tpu.models.ast import ASTConfig, ASTModel
    from aum_tpu.run import build_model_and_params

    # Pretrain AST at a different time length (grid (2,4) vs target (2,6)).
    pre_cfg = ASTConfig(label_dim=5, fstride=16, tstride=16, input_fdim=32,
                        input_tdim=64, embed_dim=384, num_heads=6, depth=2)
    pre = ASTModel(pre_cfg)
    pre_params = pre.init(jax.random.PRNGKey(0),
                          np.zeros((1, 64, 32), np.float32))
    sd = export_ast_state_dict(pre_params, pre_cfg)
    pth = tmp_path / "ast_audio.pth"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               str(pth))

    cfg = ExperimentConfig(
        name="t", dataset="speechcommands", model="ast", model_type="small",
        n_class=5, melbins=32, audio_length=96, fstride=16, tstride=16,
        depth=2, ast_pretrain_path=str(pth), ast_pretrain_fstride=16,
        ast_pretrain_tstride=16, ast_pretrain_input_fdim=32,
        ast_pretrain_input_tdim=64)
    model, params = build_model_and_params(
        cfg, jax.random.PRNGKey(1),
        np.zeros((1, 96, 32), np.float32))
    # Patch kernel and head came from the checkpoint (exact round-trip);
    # pos embed was retargeted to the (2, 6) grid.
    np.testing.assert_allclose(
        np.asarray(params["params"]["patch_proj_weight"]),
        np.asarray(pre_params["params"]["patch_proj_weight"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["params"]["head"]["kernel"]),
        np.asarray(pre_params["params"]["head"]["kernel"]), atol=1e-6)
    assert params["params"]["pos_embed"].shape[1] == 2 * 6 + 1
    y = model.apply(params, np.zeros((2, 96, 32), np.float32))
    assert y.shape == (2, 5)


def test_layer_scale_scales_out_proj_bias_too():
    """gamma multiplies the FULL out_proj output including its bias
    (mamba_simple.py:308-310: out = self.out_proj(y); out = out * gamma),
    i.e. out == gamma * (y @ W + b) — not (y @ W) * gamma + b."""
    from aum_tpu.models.mamba import MambaMixer

    kw = dict(d_model=32, d_state=4, bimamba_type="none", proj_bias=True,
              use_kernel=False, n_layer=2)
    scaled = MambaMixer(init_layer_scale=0.5, **kw)
    plain = MambaMixer(**kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 32))
    p = scaled.init(jax.random.PRNGKey(1), x)
    # Nonzero bias so the orderings actually differ.
    p = jax.tree_util.tree_map_with_path(
        lambda path, v: (jnp.ones_like(v)
                         if "out_proj_bias" in str(path) else v), p)
    p0 = {"params": {k: v for k, v in p["params"].items() if k != "gamma"}}
    y_scaled = scaled.apply(p, x)
    y_plain = plain.apply(p0, x)
    np.testing.assert_allclose(np.asarray(y_scaled),
                               0.5 * np.asarray(y_plain), rtol=1e-6)


def test_port_deit_rejects_ambiguous_nonsquare():
    """port_deit_state_dict must not guess a grid for a non-square pos
    embed (token-count coincidences are unrecoverable); explicit
    source_grid ports it exactly."""
    from aum_tpu.convert.ast_port import port_deit_state_dict
    from aum_tpu.models.ast import ASTConfig, ASTModel
    from aum_tpu.convert.ast_port import export_ast_state_dict

    cfg = ASTConfig(label_dim=3, fstride=16, tstride=16, input_fdim=32,
                    input_tdim=96, embed_dim=384, num_heads=6, depth=1)
    params = ASTModel(cfg).init(jax.random.PRNGKey(0),
                                np.zeros((1, 96, 32), np.float32))
    sd = export_ast_state_dict(params, cfg)
    deit = {k[len("v."):]: np.asarray(v) for k, v in sd.items()
            if k.startswith("v.")}
    # (2, 6) grid = 12 tokens: not square -> must raise without source_grid.
    with pytest.raises(ValueError, match="not a square grid"):
        port_deit_state_dict(deit, cfg)
    ported = port_deit_state_dict(deit, cfg, source_grid=(2, 6))
    np.testing.assert_array_equal(
        np.asarray(ported["params"]["pos_embed"]),
        np.asarray(params["params"]["pos_embed"]))
