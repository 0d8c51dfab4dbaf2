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
