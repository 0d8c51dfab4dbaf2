"""Mamba language model + autoregressive generation (the reference's "LM
extras": /root/reference/vim-mamba_ssm/mamba_ssm/models/mixer_seq_simple.py
and utils/generation.py).

- `MambaLM`: embedding -> n_layer x (add+RMSNorm -> causal Mamba mixer) ->
  final norm -> tied lm head (mixer_seq_simple.py:86-264; tie_embeddings and
  the vocab pad-to-multiple behavior preserved).
- `init_decode_state` / `decode_step`: O(1)-per-token decoding with per-layer
  conv and SSM state caches (the reference's InferenceParams +
  Mamba.step/allocate_inference_cache, mamba_simple.py:313-399), built on
  aum_tpu.ops.{causal_conv1d_update, selective_state_update}. The layer loop
  is a lax.scan over the stacked layer params, so one decode step is a
  single compiled program.
- `generate`: greedy / temperature / top-k / top-p sampling with repetition
  penalty (generation.py:107-227). The reference accelerates decode with
  CUDA graphs (generation.py:252-371); the TPU-native equivalent is exactly
  this jitted step + lax control flow — the program is compiled once and
  replayed, which is what a CUDA graph emulates.

The parallel forward / prefill uses the fused Pallas selective scan in its
single-direction ("none") configuration — the same fused op stack the
reference LM shares with the classifier (mixer_seq_simple.py:86-264) —
controlled by MambaLMConfig.use_kernel (None = auto, like the classifier).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from aum_tpu.models.mamba import (
    a_log_init,
    dt_bias_init,
    scaled_uniform_fan_in,
    uniform_fan_in,
)
from aum_tpu.ops import (
    causal_conv1d,
    causal_conv1d_update,
    fused_add_norm,
    selective_scan,
    selective_state_update,
)


@dataclasses.dataclass(frozen=True)
class MambaLMConfig:
    """config_mamba.py:1-14 equivalent."""

    d_model: int = 768
    n_layer: int = 24
    vocab_size: int = 50277
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    pad_vocab_size_multiple: int = 8
    norm_epsilon: float = 1e-5
    dtype: str = "float32"
    # Pallas kernel for the parallel forward / prefill scan (None = auto,
    # same convention as the classifier's AudioMamba.use_kernel).
    use_kernel: Optional[bool] = None

    @property
    def padded_vocab(self) -> int:
        m = self.pad_vocab_size_multiple
        return ((self.vocab_size + m - 1) // m) * m

    @property
    def d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def dt_rank(self) -> int:
        return math.ceil(self.d_model / 16)


class MambaLM(nn.Module):
    config: MambaLMConfig

    def _layer_params(self):
        cfg = self.config
        d_in, r, n = cfg.d_inner, cfg.dt_rank, cfg.d_state

        def stack(name, init, shape):
            return self.param(name, _stacked(init, cfg.n_layer), shape)

        return {
            "norm_weight": stack("norm_weight", nn.initializers.ones,
                                 (cfg.n_layer, cfg.d_model)),
            "in_proj_x": stack("in_proj_x", uniform_fan_in(cfg.d_model),
                               (cfg.n_layer, cfg.d_model, d_in)),
            "in_proj_z": stack("in_proj_z", uniform_fan_in(cfg.d_model),
                               (cfg.n_layer, cfg.d_model, d_in)),
            "conv_w": stack("conv_w", uniform_fan_in(cfg.d_conv),
                            (cfg.n_layer, d_in, cfg.d_conv)),
            "conv_b": stack("conv_b", uniform_fan_in(cfg.d_conv),
                            (cfg.n_layer, d_in)),
            "x_proj": stack("x_proj", uniform_fan_in(d_in),
                            (cfg.n_layer, d_in, r + 2 * n)),
            "dt_w": stack("dt_w", uniform_fan_in(r), (cfg.n_layer, r, d_in)),
            "dt_b": stack("dt_b", dt_bias_init(0.001, 0.1, 1e-4),
                          (cfg.n_layer, d_in)),
            "A_log": stack("A_log", a_log_init(n), (cfg.n_layer, d_in, n)),
            "D": stack("D", nn.initializers.ones, (cfg.n_layer, d_in)),
            "out_proj": stack(
                "out_proj",
                scaled_uniform_fan_in(d_in, 1.0 / math.sqrt(cfg.n_layer)),
                (cfg.n_layer, d_in, cfg.d_model)),
        }

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        """input_ids (B, L) -> logits (B, L, padded_vocab)."""
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        emb = self.param("embedding", nn.initializers.normal(0.02),
                         (cfg.padded_vocab, cfg.d_model))
        lp = self._layer_params()
        norm_f = self.param("norm_f_weight", nn.initializers.ones,
                            (cfg.d_model,))

        hidden = emb[input_ids].astype(dtype)
        residual = jnp.zeros(hidden.shape, jnp.float32)

        def body(carry, layer):
            h, res = carry
            normed, res = fused_add_norm(h, layer["norm_weight"].astype(dtype),
                                         residual=res,
                                         eps=cfg.norm_epsilon)
            h = _mixer_forward(layer, normed, cfg, dtype)
            return (h, res), None

        (hidden, residual), _ = jax.lax.scan(body, (hidden, residual), lp)
        out = fused_add_norm(hidden, norm_f.astype(dtype), residual=residual,
                             prenorm=False, eps=cfg.norm_epsilon)
        # tied lm head (mixer_seq_simple.py:219-224)
        return out.astype(dtype) @ emb.T.astype(dtype)


def _stacked(init, n_layer):
    def f(key, shape, dtype=jnp.float32):
        keys = jax.random.split(key, n_layer)
        return jnp.stack([init(k, shape[1:], dtype) for k in keys])
    return f


def _mixer_forward(layer, x, cfg, dtype):
    """Causal (bimamba "none") mixer over (B, L, D)."""
    xs = x @ layer["in_proj_x"].astype(dtype)
    z = x @ layer["in_proj_z"].astype(dtype)
    xc = causal_conv1d(xs, layer["conv_w"].astype(dtype),
                       layer["conv_b"].astype(dtype))
    x_dbl = xc @ layer["x_proj"].astype(dtype)
    r, n = cfg.dt_rank, cfg.d_state
    dt = x_dbl[..., :r] @ layer["dt_w"].astype(dtype)
    bm, cm = x_dbl[..., r:r + n], x_dbl[..., r + n:]
    a = -jnp.exp(layer["A_log"].astype(jnp.float32))
    y = selective_scan(xc, dt, a, bm, cm, layer["D"], z=z,
                       delta_bias=layer["dt_b"], delta_softplus=True,
                       use_kernel=cfg.use_kernel)
    return y.astype(dtype) @ layer["out_proj"].astype(dtype)


# ---------------------------------------------------------------------------
# Decoding
# ---------------------------------------------------------------------------


def init_decode_state(cfg: MambaLMConfig, batch: int):
    """Per-layer conv + SSM caches (mamba_simple.py:360-372)."""
    return {
        "conv": jnp.zeros((cfg.n_layer, batch, cfg.d_inner, cfg.d_conv),
                          jnp.float32),
        "ssm": jnp.zeros((cfg.n_layer, batch, cfg.d_inner, cfg.d_state),
                         jnp.float32),
    }


def prefill(params, cfg: MambaLMConfig, input_ids: jax.Array):
    """Parallel prompt processing: one fused-scan forward per layer builds
    the decode caches (SSM state via the scan's final-state port, conv
    cache from the last d_conv pre-conv activations) and returns the
    last-position logits. Replaces O(L) sequential decode_step calls with
    one parallel pass — the reference allocates inference caches and decodes
    the prompt stepwise (generation.py:107-227, mamba_simple.py:360-372);
    the state-carrying Pallas scan makes the parallel form exact.

    Returns (logits (B, V), decode state as in init_decode_state).
    """
    p = params["params"]
    dtype = jnp.dtype(cfg.dtype)
    emb = p["embedding"]
    lp = {k: p[k] for k in (
        "norm_weight", "in_proj_x", "in_proj_z", "conv_w", "conv_b",
        "x_proj", "dt_w", "dt_b", "A_log", "D", "out_proj")}

    bsz, l = input_ids.shape
    kpad = max(cfg.d_conv - l, 0)
    hidden = emb[input_ids].astype(dtype)
    residual = jnp.zeros(hidden.shape, jnp.float32)

    def body(carry, layer):
        h, res = carry
        normed, res = fused_add_norm(h, layer["norm_weight"].astype(dtype),
                                     residual=res, eps=cfg.norm_epsilon)
        xs = normed @ layer["in_proj_x"].astype(dtype)
        z = normed @ layer["in_proj_z"].astype(dtype)
        xc = causal_conv1d(xs, layer["conv_w"].astype(dtype),
                           layer["conv_b"].astype(dtype))
        x_dbl = xc @ layer["x_proj"].astype(dtype)
        r, n = cfg.dt_rank, cfg.d_state
        dt = x_dbl[..., :r] @ layer["dt_w"].astype(dtype)
        bm, cm = x_dbl[..., r:r + n], x_dbl[..., r + n:]
        a = -jnp.exp(layer["A_log"].astype(jnp.float32))
        y, ssm_state = selective_scan(
            xc, dt, a, bm, cm, layer["D"], z=z, delta_bias=layer["dt_b"],
            delta_softplus=True, use_kernel=cfg.use_kernel,
            return_final_state=True)
        # Conv cache = last d_conv pre-conv inputs, oldest first
        # (causal_conv1d_update's rolling-window layout).
        tail = xs[:, l - (cfg.d_conv - kpad):].astype(jnp.float32)
        if kpad:
            tail = jnp.pad(tail, [(0, 0), (kpad, 0), (0, 0)])
        conv_state = jnp.swapaxes(tail, 1, 2)          # (B, D, K)
        h = y.astype(dtype) @ layer["out_proj"].astype(dtype)
        return (h, res), (conv_state, ssm_state)

    (hidden, residual), (conv, ssm) = jax.lax.scan(
        body, (hidden, residual), lp)
    out = fused_add_norm(hidden, p["norm_f_weight"].astype(dtype),
                         residual=residual, prenorm=False,
                         eps=cfg.norm_epsilon)
    logits = out[:, -1].astype(dtype) @ emb.T.astype(dtype)
    return logits, {"conv": conv, "ssm": ssm}


def decode_step(params, cfg: MambaLMConfig, token: jax.Array, state):
    """One-token step: (B,) int tokens + caches -> (logits (B, V), caches)."""
    p = params["params"]
    dtype = jnp.dtype(cfg.dtype)
    emb = p["embedding"]
    lp = {k: p[k] for k in (
        "norm_weight", "in_proj_x", "in_proj_z", "conv_w", "conv_b",
        "x_proj", "dt_w", "dt_b", "A_log", "D", "out_proj")}

    hidden = emb[token].astype(dtype)  # (B, D)
    residual = jnp.zeros(hidden.shape, jnp.float32)

    def body(carry, inp):
        h, res = carry
        layer, conv_state, ssm_state = inp
        normed, res = fused_add_norm(h, layer["norm_weight"].astype(dtype),
                                     residual=res, eps=cfg.norm_epsilon)
        xs = normed @ layer["in_proj_x"].astype(dtype)
        z = normed @ layer["in_proj_z"].astype(dtype)
        xc, conv_state = causal_conv1d_update(
            xs.astype(jnp.float32), conv_state, layer["conv_w"],
            layer["conv_b"])
        x_dbl = xc @ layer["x_proj"]
        r, n = cfg.dt_rank, cfg.d_state
        dt = x_dbl[..., :r] @ layer["dt_w"]
        bm, cm = x_dbl[..., r:r + n], x_dbl[..., r + n:]
        a = -jnp.exp(layer["A_log"].astype(jnp.float32))
        y, ssm_state = selective_state_update(
            ssm_state, xc, dt, a, bm, cm, layer["D"], z=z,
            dt_bias=layer["dt_b"], dt_softplus=True)
        h = y.astype(dtype) @ layer["out_proj"].astype(dtype)
        return (h, res), (conv_state, ssm_state)

    (hidden, residual), (conv, ssm) = jax.lax.scan(
        body, (hidden, residual), (lp, state["conv"], state["ssm"]))
    out = fused_add_norm(hidden, p["norm_f_weight"].astype(dtype),
                         residual=residual, prenorm=False,
                         eps=cfg.norm_epsilon)
    logits = out.astype(dtype) @ emb.T.astype(dtype)
    return logits, {"conv": conv, "ssm": ssm}


def _sample_token(key, logits, prev_tokens, temperature, top_k, top_p,
                  repetition_penalty, vocab_size):
    """generation.py sampling: repetition penalty, top-k, top-p, temp."""
    logits = logits.astype(jnp.float32)
    # mask the vocab padding
    pad = logits.shape[-1] - vocab_size
    if pad > 0:
        mask = jnp.arange(logits.shape[-1]) >= vocab_size
        logits = jnp.where(mask[None, :], -jnp.inf, logits)
    if repetition_penalty != 1.0 and prev_tokens is not None:
        counts = jax.vmap(
            lambda t: jnp.zeros(logits.shape[-1]).at[t].add(1.0))(prev_tokens)
        seen = counts > 0
        logits = jnp.where(
            seen,
            jnp.where(logits > 0, logits / repetition_penalty,
                      logits * repetition_penalty),
            logits)
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / temperature
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None],
                                     axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1)


def generate(
    params,
    cfg: MambaLMConfig,
    input_ids: jax.Array,
    max_new_tokens: int,
    key: Optional[jax.Array] = None,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    repetition_penalty: float = 1.0,
):
    """Prefill + sequential decode (generation.py:107-227). Returns
    (B, L + max_new_tokens) token ids."""
    if key is None:
        key = jax.random.PRNGKey(0)
    bsz, l = input_ids.shape

    # Parallel prefill: one fused-scan forward builds the decode caches and
    # the last-position logits (vs the reference's stepwise prompt decode).
    logits, state = jax.jit(partial(prefill, params, cfg))(input_ids)
    step = jax.jit(partial(decode_step, params, cfg))

    tokens = [input_ids]
    prev = input_ids
    for _ in range(max_new_tokens):
        key, k = jax.random.split(key)
        nxt = _sample_token(k, logits, prev, temperature, top_k, top_p,
                            repetition_penalty, cfg.vocab_size)
        tokens.append(nxt[:, None])
        prev = jnp.concatenate([prev, nxt[:, None]], axis=1)
        logits, state = step(nxt, state)
    return jnp.concatenate(tokens, axis=1)


def save_pretrained(params, cfg: MambaLMConfig, directory: str) -> None:
    """Save config.json + weights (mixer_seq_simple.py:246-264 equivalent,
    local-directory flavor of the HF save_pretrained contract)."""
    import json
    import os
    import pickle

    import numpy as np

    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)
    flat = jax.tree.map(lambda x: np.asarray(x), params)
    with open(os.path.join(directory, "weights.pkl"), "wb") as f:
        pickle.dump(flat, f)


def load_pretrained(directory: str):
    """-> (params, MambaLMConfig). Counterpart of MambaLMHeadModel
    .from_pretrained for local checkpoints (utils/hf.py:10-23)."""
    import json
    import os
    import pickle

    with open(os.path.join(directory, "config.json")) as f:
        cfg = MambaLMConfig(**json.load(f))
    with open(os.path.join(directory, "weights.pkl"), "rb") as f:
        params = pickle.load(f)
    return jax.tree.map(jnp.asarray, params), cfg


def port_lm_state_dict(sd, cfg: MambaLMConfig):
    """Torch MambaLMHeadModel state dict -> this module's flax params.

    Layout source: mixer_seq_simple.py (backbone.embedding / layers.N.mixer
    / norm_f, tied lm_head:219-224) + mamba_simple.py's per-mixer params.
    Matmul weights transpose (torch stores (out, in)); the fused in_proj's
    rows split into the x / z halves; conv1d drops its singleton channel
    axis; per-layer leaves stack on a leading n_layer axis (nn.scan
    layout). `sd` is {name: np.ndarray} (aum_tpu.convert
    .load_torch_checkpoint output)."""
    import numpy as np

    d_in = cfg.d_inner

    def layer(i, name):
        return np.asarray(sd[f"backbone.layers.{i}.{name}"])

    def stack(name, f):
        return jnp.asarray(np.stack([f(layer(i, name))
                                     for i in range(cfg.n_layer)]))

    t = np.transpose
    params = {
        "embedding": jnp.asarray(np.asarray(
            sd["backbone.embedding.weight"])),
        "norm_f_weight": jnp.asarray(np.asarray(
            sd["backbone.norm_f.weight"])),
        "norm_weight": stack("norm.weight", lambda w: w),
        "in_proj_x": stack("mixer.in_proj.weight",
                           lambda w: t(w[:d_in])),
        "in_proj_z": stack("mixer.in_proj.weight",
                           lambda w: t(w[d_in:])),
        "conv_w": stack("mixer.conv1d.weight", lambda w: w[:, 0, :]),
        "conv_b": stack("mixer.conv1d.bias", lambda w: w),
        "x_proj": stack("mixer.x_proj.weight", t),
        "dt_w": stack("mixer.dt_proj.weight", t),
        "dt_b": stack("mixer.dt_proj.bias", lambda w: w),
        "A_log": stack("mixer.A_log", lambda w: w),
        "D": stack("mixer.D", lambda w: w),
        "out_proj": stack("mixer.out_proj.weight", t),
    }
    emb = params["embedding"]
    assert emb.shape == (cfg.padded_vocab, cfg.d_model), emb.shape
    return {"params": params}


def from_pretrained_hf(model_name: str):
    """-> (params, MambaLMConfig) from a HuggingFace-hub model id (e.g.
    "state-spaces/mamba-130m") or a local HF-format directory.

    Mirrors utils/hf.py:10-23 (load_config_hf/load_state_dict_hf via
    transformers' cached_file): downloads/caches config.json +
    pytorch_model.bin, then ports the torch layout. Works offline against
    a local directory containing the two files (the test path — this
    build environment has no egress)."""
    import json
    import os

    from aum_tpu.convert import load_torch_checkpoint

    if os.path.isdir(model_name):
        config_file = os.path.join(model_name, "config.json")
        weights_file = os.path.join(model_name, "pytorch_model.bin")
    else:
        from transformers.utils import CONFIG_NAME, WEIGHTS_NAME
        from transformers.utils.hub import cached_file

        config_file = cached_file(
            model_name, CONFIG_NAME, _raise_exceptions_for_missing_entries=False)
        weights_file = cached_file(
            model_name, WEIGHTS_NAME, _raise_exceptions_for_missing_entries=False)
    with open(config_file) as f:
        raw = json.load(f)
    cfg = MambaLMConfig(
        d_model=raw["d_model"], n_layer=raw["n_layer"],
        vocab_size=raw["vocab_size"],
        pad_vocab_size_multiple=raw.get("pad_vocab_size_multiple", 8),
        **{k: raw[k] for k in ("d_state", "d_conv", "expand")
           if k in raw})
    sd = load_torch_checkpoint(weights_file)
    return port_lm_state_dict(sd, cfg), cfg
