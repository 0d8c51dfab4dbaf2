"""Mamba LM + decoding: parallel-vs-step consistency and generation."""

import jax
import jax.numpy as jnp
import numpy as np

from aum_tpu.models.lm import (
    MambaLM,
    MambaLMConfig,
    decode_step,
    generate,
    init_decode_state,
)

CFG = MambaLMConfig(d_model=64, n_layer=2, vocab_size=100, d_state=8)


def test_forward_shapes_and_vocab_padding():
    model = MambaLM(CFG)
    ids = jnp.asarray([[1, 2, 3, 4, 5]])
    params = model.init(jax.random.PRNGKey(0), ids)
    logits = model.apply(params, ids)
    assert logits.shape == (1, 5, CFG.padded_vocab)
    assert CFG.padded_vocab == 104  # padded to multiple of 8


def test_decode_matches_parallel_forward():
    """Stepwise decoding must reproduce the parallel scan's logits — the
    invariant behind Mamba.step (mamba_simple.py:313-358)."""
    model = MambaLM(CFG)
    ids = jnp.asarray([[5, 17, 3, 42, 8, 13]])
    params = model.init(jax.random.PRNGKey(0), ids)
    full = model.apply(params, ids)  # (1, L, V)

    state = init_decode_state(CFG, 1)
    step_logits = []
    for t in range(ids.shape[1]):
        logits, state = decode_step(params, CFG, ids[:, t], state)
        step_logits.append(logits)
    stepwise = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(stepwise), np.asarray(full),
                               rtol=2e-4, atol=2e-4)


def test_prefill_matches_stepwise():
    """Parallel prefill (fused scan final-state port + conv-tail cache) must
    hand decode exactly the caches that stepping through the prompt would —
    checked by comparing the NEXT decoded token's logits."""
    from aum_tpu.models.lm import prefill

    model = MambaLM(CFG)
    ids = jnp.asarray([[5, 17, 3, 42, 8, 13], [2, 9, 31, 7, 1, 64]])
    params = model.init(jax.random.PRNGKey(0), ids)

    state_sw = init_decode_state(CFG, 2)
    for t in range(ids.shape[1]):
        logits_sw, state_sw = decode_step(params, CFG, ids[:, t], state_sw)

    logits_pf, state_pf = prefill(params, CFG, ids)
    np.testing.assert_allclose(np.asarray(logits_pf), np.asarray(logits_sw),
                               rtol=2e-4, atol=2e-4)
    nxt = jnp.argmax(logits_pf, axis=-1)
    l2_sw, _ = decode_step(params, CFG, nxt, state_sw)
    l2_pf, _ = decode_step(params, CFG, nxt, state_pf)
    np.testing.assert_allclose(np.asarray(l2_pf), np.asarray(l2_sw),
                               rtol=2e-4, atol=2e-4)


def test_generate_greedy_deterministic():
    model = MambaLM(CFG)
    ids = jnp.asarray([[1, 2, 3]])
    params = model.init(jax.random.PRNGKey(0), ids)
    out1 = generate(params, CFG, ids, max_new_tokens=5, temperature=0.0)
    out2 = generate(params, CFG, ids, max_new_tokens=5, temperature=0.0)
    assert out1.shape == (1, 8)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # generated ids stay within the real vocab (padding masked)
    assert int(np.asarray(out1).max()) < CFG.vocab_size


def test_generate_topk_topp_sampling():
    model = MambaLM(CFG)
    ids = jnp.asarray([[1, 2]])
    params = model.init(jax.random.PRNGKey(0), ids)
    out = generate(params, CFG, ids, max_new_tokens=4,
                   key=jax.random.PRNGKey(7), temperature=1.0, top_k=10,
                   top_p=0.9, repetition_penalty=1.2)
    assert out.shape == (1, 6)
    assert int(np.asarray(out).max()) < CFG.vocab_size


def test_save_load_pretrained_roundtrip(tmp_path):
    from aum_tpu.models.lm import load_pretrained, save_pretrained

    model = MambaLM(CFG)
    ids = jnp.asarray([[1, 2, 3]])
    params = model.init(jax.random.PRNGKey(0), ids)
    save_pretrained(params, CFG, str(tmp_path / "ckpt"))
    params2, cfg2 = load_pretrained(str(tmp_path / "ckpt"))
    assert cfg2 == CFG
    out1 = model.apply(params, ids)
    out2 = MambaLM(cfg2).apply(params2, ids)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_from_pretrained_hf_local_dir(tmp_path):
    """from_pretrained_hf: HF-format directory (config.json +
    pytorch_model.bin, the files utils/hf.py:10-23 fetches from the hub) ->
    ported flax params with the exact init tree structure, transposed
    matmul weights, split in_proj halves, and a finite forward. The hub
    leg uses transformers.utils.hub.cached_file with the same two
    filenames; offline here (no egress), the local-directory path proves
    the port."""
    import json

    import torch

    from aum_tpu.models.lm import MambaLM, from_pretrained_hf

    cfg = MambaLMConfig(d_model=64, n_layer=2, vocab_size=50, d_state=8)
    rng = np.random.default_rng(11)
    d_in, r, n = cfg.d_inner, cfg.dt_rank, cfg.d_state
    sd = {"backbone.embedding.weight":
          rng.standard_normal((cfg.padded_vocab, cfg.d_model)),
          "backbone.norm_f.weight": 1.0 + rng.standard_normal(cfg.d_model) * 0.02,
          "lm_head.weight": np.zeros((cfg.padded_vocab, cfg.d_model))}
    for i in range(cfg.n_layer):
        p = f"backbone.layers.{i}."
        sd[p + "norm.weight"] = 1.0 + rng.standard_normal(cfg.d_model) * 0.02
        sd[p + "mixer.in_proj.weight"] = rng.standard_normal(
            (2 * d_in, cfg.d_model)) * 0.05
        sd[p + "mixer.conv1d.weight"] = rng.standard_normal((d_in, 1, 4)) * 0.1
        sd[p + "mixer.conv1d.bias"] = rng.standard_normal(d_in) * 0.1
        sd[p + "mixer.x_proj.weight"] = rng.standard_normal(
            (r + 2 * n, d_in)) * 0.05
        sd[p + "mixer.dt_proj.weight"] = rng.standard_normal((d_in, r)) * 0.1
        sd[p + "mixer.dt_proj.bias"] = rng.standard_normal(d_in) - 4.0
        sd[p + "mixer.A_log"] = np.log(np.tile(
            np.arange(1, n + 1, dtype=np.float64), (d_in, 1)))
        sd[p + "mixer.D"] = 1.0 + rng.standard_normal(d_in) * 0.02
        sd[p + "mixer.out_proj.weight"] = rng.standard_normal(
            (cfg.d_model, d_in)) * 0.05
    hf_dir = tmp_path / "hub_model"
    hf_dir.mkdir()
    (hf_dir / "config.json").write_text(json.dumps({
        "d_model": cfg.d_model, "n_layer": cfg.n_layer,
        "vocab_size": cfg.vocab_size, "d_state": cfg.d_state,
        "ssm_cfg": {}, "rms_norm": True, "fused_add_norm": True,
        "pad_vocab_size_multiple": 8}))
    torch.save({k: torch.from_numpy(np.asarray(v, np.float32))
                for k, v in sd.items()}, str(hf_dir / "pytorch_model.bin"))

    params, got_cfg = from_pretrained_hf(str(hf_dir))
    assert got_cfg.d_model == 64 and got_cfg.n_layer == 2
    assert got_cfg.d_state == 8 and got_cfg.padded_vocab == 56

    model = MambaLM(got_cfg)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    fa = jax.tree_util.tree_flatten_with_path(init)
    fb = jax.tree_util.tree_flatten_with_path(params)
    assert [k for k, _ in fa[0]] == [k for k, _ in fb[0]]
    for (path, a), (_, b) in zip(fa[0], fb[0]):
        assert a.shape == b.shape, (path, a.shape, b.shape)
    # transposes + in_proj split: row d of torch in_proj == column d of x half
    w0 = sd["backbone.layers.0.mixer.in_proj.weight"].astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(params["params"]["in_proj_x"][0])[:, 3], w0[3], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["params"]["in_proj_z"][0])[:, 5],
        w0[cfg.d_inner + 5], rtol=1e-6)

    logits = jax.jit(model.apply)(
        params, jnp.asarray([[1, 4, 9, 2]], jnp.int32))
    assert logits.shape == (1, 4, 56) and np.isfinite(np.asarray(logits)).all()
