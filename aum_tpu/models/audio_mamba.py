"""AudioMamba (AuM): bidirectional-Mamba audio classifier, TPU-native.

Re-design of the reference model (/root/reference/src/models/mamba_models.py,
`AudioMamba`, :193-692) in flax for JAX/TPU:

- Input (B, T, F) log-mel spectrogram; internally (B, F, T) like the
  reference's unsqueeze+transpose (mamba_models.py:510-511).
- Conv patch embedding -> (B, N, D) tokens (F-major order), class token
  inserted at a static position (middle by default, mamba_models.py:525-535),
  learnable absolute pos-embedding added with prefix bookkeeping
  (tokenization.py:414-451 — reduced to slice-adds here).
- depth x [add -> RMSNorm -> bidirectional Mamba mixer] blocks with an fp32
  residual stream. The layer stack is an `nn.scan` over a single block
  definition (stacked params): one trace/compile of the block instead of 24,
  and a layout that shards naturally over a device mesh.
- `if_bidirectional` pairs consecutive layers, running the odd layer on the
  reversed sequence and summing (mamba_models.py:624-638). Independent from
  per-mixer bidirectionality (bimamba_type).
- Final fused add+norm, cls-token readout (or mean/max/last pooling,
  mamba_models.py:660-675), linear head.

Variants (run.py:227-246): base/small/tiny = embed_dim 768/384/192, depth 24;
aum_type Fo-Fo/Fo-Bi/Bi-Bi = bimamba_type none/v1/v2.

Parameter-count parity targets (README.md:113/125): AuM-Base Fo-Bi 92.1M,
AuM-Small Bi-Bi 25.5M (checked in tests/test_model.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from aum_tpu.models.mamba import MambaBlock
from aum_tpu.models.tokenization import (
    PatchEmbed,
    PosEmbed,
    patch_grid_shape,
    to_2tuple,
    trunc_normal_02,
)
from aum_tpu.ops import fused_add_norm


@dataclasses.dataclass(frozen=True)
class AudioMambaConfig:
    """Static model configuration (reference defaults, mamba_models.py:194-242)."""

    spectrogram_size: Tuple[int, int] = (128, 1024)  # (F, T)
    patch_size: Tuple[int, int] = (16, 16)
    strides: Tuple[int, int] = (16, 16)
    depth: int = 24
    embed_dim: int = 768
    num_classes: int = 527
    d_state: int = 16
    norm_epsilon: float = 1e-5
    rms_norm: bool = True
    residual_in_fp32: bool = True
    final_pool_type: str = "mean"
    if_abs_pos_embed: bool = True
    if_cls_token: bool = True
    use_middle_cls_token: bool = True
    use_end_cls_token: bool = False
    use_double_cls_token: bool = False
    bimamba_type: str = "v2"
    if_devide_out: bool = True
    # Per-mixer LayerScale gamma init value (reference init_layer_scale,
    # mamba_models.py:234 -> mamba_simple.py:70-72; None = off, the
    # default everywhere upstream).
    init_layer_scale: Optional[float] = None
    if_bidirectional: bool = False
    transpose_token_sequence: bool = False
    # Rematerialize activations in the backward pass (jax.checkpoint): the
    # fused-scan residuals are O(L*d_inner) per direction per layer, so
    # without remat a 24-layer training step would hold ~GBs of residuals
    # (the torch reference frees them layer-by-layer; XLA needs the policy).
    remat: bool = True
    # Remat granularity:
    #   "split" — checkpoint only the pre-scan compute (norm stays exposed;
    #       in/x/dt projections + conv recomputed in the backward) and leave
    #       the scan OUT of the remat region so its custom_vjp residuals are
    #       kept and the backward never re-runs the scan forward kernel —
    #       the reference's checkpoint_lvl=1 (selective_scan_interface.py:
    #       218-219). Costs the scan residuals in HBM: ~6 * B*L*d_inner *
    #       itemsize per layer (u/delta/z/y in model dtype + fp32 B/C/
    #       boundary states) ≈ 260MB/layer at B=32/L=513/base/bf16 — fits
    #       v5e HBM to B~32; prefer "block" beyond that.
    #   "block" — nn.remat around the whole block (round-1 behavior): holds
    #       only (hidden, residual) per layer but re-runs the scan forward
    #       inside the backward (~10% of train-step time).
    #   "auto" — "split" when the Pallas kernel path is active AND the
    #       calibrated HBM estimate fits, else "block". Calibrated against
    #       XLA's memory_analysis() of the full train step on v5e
    #       (scripts/mem_analysis.py, 2026-08-17, B=32/L=513/base/depth 24):
    #       temp = 14.42 GiB at fp32, 10.59 GiB at bf16 — i.e. ~(3.4 *
    #       itemsize + 12.0) bytes per depth*B*L*d_inner element (the fixed
    #       part is the fp32 residual stream, norm inputs, boundary states,
    #       and backward-loop transients). Args+optimizer state (~2.1 GiB
    #       at base) sit outside this estimate; the default budget leaves
    #       room for them. Budget override: AUM_SPLIT_REMAT_BUDGET (bytes).
    remat_mode: str = "auto"
    if_rope: bool = False
    if_rope_residual: bool = False
    # Stochastic depth (reference --aum_drop_path -> drop_path_rate,
    # mamba_models.py:290-293): per-layer rates follow the linear decay rule
    # inter_dpr = [0.0] + linspace(0, rate, depth)[:-1] (layer i >= 1 drops
    # its incoming hidden with rate*(i-1)/(depth-1); the final add+norm
    # drops at the full rate, :644-657). Train-time only (`train=True` +
    # a 'dropout' rng); rate 0 traces the identical graph as before.
    drop_path_rate: float = 0.0
    # Dropout after the pos-embed add (reference drop_rate -> pos_drop,
    # mamba_models.py:477/541; not CLI-exposed upstream, default 0).
    drop_rate: float = 0.0
    dtype: str = "float32"

    @property
    def patch_grid(self) -> Tuple[int, int]:
        return patch_grid_shape(
            to_2tuple(self.strides), to_2tuple(self.patch_size),
            self.spectrogram_size[0], self.spectrogram_size[1])

    @property
    def num_patches(self) -> int:
        f, t = self.patch_grid
        return f * t

    @property
    def num_prefix_tokens(self) -> int:
        if not self.if_cls_token:
            return 0
        return 2 if self.use_double_cls_token else 1

    @staticmethod
    def base(**kw) -> "AudioMambaConfig":
        return AudioMambaConfig(depth=24, embed_dim=768, **kw)

    @staticmethod
    def small(**kw) -> "AudioMambaConfig":
        return AudioMambaConfig(depth=24, embed_dim=384, **kw)

    @staticmethod
    def tiny(**kw) -> "AudioMambaConfig":
        return AudioMambaConfig(depth=24, embed_dim=192, **kw)

    @staticmethod
    def from_variant(model_type: str = "base", aum_type: str = "Fo-Bi",
                     **kw) -> "AudioMambaConfig":
        """run.py:227-246 variant mapping."""
        bimamba = {"Fo-Fo": "none", "Fo-Bi": "v1", "Bi-Bi": "v2"}[aum_type]
        ctor = {"base": AudioMambaConfig.base, "small": AudioMambaConfig.small,
                "tiny": AudioMambaConfig.tiny}[model_type]
        return ctor(bimamba_type=bimamba, **kw)


class AudioMamba(nn.Module):
    config: AudioMambaConfig
    use_kernel: Optional[bool] = None
    # Tensor-parallel axis name when running under shard_map (d_inner sharded).
    model_axis: Optional[str] = None
    # Sequence-parallel axis name: mixers shard token length over this mesh
    # axis (ops/seq_parallel.py); composes with GSPMD DP/TP. Requires an
    # ambient mesh (jax.set_mesh) carrying the axis.
    seq_axis: Optional[str] = None
    # Pipeline-parallel axis name: the block stack runs GPipe-style over
    # this mesh axis (parallel/pipeline.py), depth-sharded with
    # `pipe_microbatches` microbatches (batch must divide). Composes with
    # GSPMD DP/TP; not combinable with seq_axis (nested partial-manual
    # shard_maps — unsupported). Init always runs the sequential stack
    # (identical params); apply reads the stacked params and pipelines.
    pipe_axis: Optional[str] = None
    pipe_microbatches: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, return_features: bool = False,
                 patch_size=None, strides=None,
                 if_random_cls_token_position: bool = False,
                 if_random_token_rank: bool = False,
                 flip_sequence_prob: float = 0.0,
                 train: bool = False,
                 rng: Optional[jax.Array] = None) -> jax.Array:
        """Forward. `patch_size`/`strides` enable flexible-patch-size
        runs (FlexiPatchEmbed/FlexiPosEmbed, traintest.py:127-141): the
        stored kernel is PI-resized and the pos-embed grid resampled for the
        runtime size — each distinct size is one extra jit specialization.
        """
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        b = x.shape[0]

        run_grid = None
        if patch_size is not None or strides is not None:
            rp = to_2tuple(patch_size if patch_size is not None
                           else cfg.patch_size)
            rs = to_2tuple(strides if strides is not None else rp)
            run_grid = patch_grid_shape(rs, rp, *cfg.spectrogram_size)

        # (B, T, F) -> (B, F, T) (mamba_models.py:510-511).
        x = jnp.swapaxes(x, 1, 2).astype(dtype)
        x = PatchEmbed(
            patch_size=to_2tuple(cfg.patch_size),
            strides=to_2tuple(cfg.strides),
            embed_dim=cfg.embed_dim, dtype=dtype, name="patch_embed")(
                x, patch_size=patch_size, strides=strides)
        n = x.shape[1]
        grid = run_grid if run_grid is not None else cfg.patch_grid

        if (if_random_cls_token_position or if_random_token_rank
                or flip_sequence_prob > 0) and rng is None:
            rng = self.make_rng("augment")

        token_position = None
        dyn_position = None  # traced position (random-cls / shuffled cases)
        if cfg.if_cls_token and if_random_cls_token_position                 and not cfg.use_double_cls_token:
            # Random cls position (mamba_models.py:526-528) via a dynamic
            # gather-insert: out[i] = cls if i==p else tokens[i - (i>p)].
            rng, kpos = jax.random.split(rng)
            cls_tok = self.param("cls_token", trunc_normal_02,
                                 (1, 1, cfg.embed_dim))
            p_dyn = jax.random.randint(kpos, (), 0, n + 1)
            idx = jnp.arange(n + 1)
            src = jnp.clip(idx - (idx > p_dyn), 0, n - 1)
            gathered = x[:, src]
            x = jnp.where((idx == p_dyn)[None, :, None],
                          cls_tok.astype(dtype), gathered)
            dyn_position = p_dyn
        elif cfg.if_cls_token:
            if cfg.use_double_cls_token:
                head_tok = self.param("cls_token_head", trunc_normal_02,
                                      (1, 1, cfg.embed_dim))
                tail_tok = self.param("cls_token_tail", trunc_normal_02,
                                      (1, 1, cfg.embed_dim))
                token_position = [0, n + 1]
                x = jnp.concatenate([
                    jnp.tile(head_tok.astype(dtype), (b, 1, 1)), x,
                    jnp.tile(tail_tok.astype(dtype), (b, 1, 1))], axis=1)
            else:
                cls_tok = self.param("cls_token", trunc_normal_02,
                                     (1, 1, cfg.embed_dim))
                if cfg.use_middle_cls_token:
                    token_position = n // 2
                elif cfg.use_end_cls_token:
                    token_position = n
                else:
                    token_position = 0
                tp = token_position
                x = jnp.concatenate([
                    x[:, :tp], jnp.tile(cls_tok.astype(dtype), (b, 1, 1)),
                    x[:, tp:]], axis=1)

        if cfg.if_abs_pos_embed:
            if dyn_position is not None:
                # dynamic-position variant of the prefix pos-embed add
                pe = PosEmbed(
                    pos_grid_size=cfg.patch_grid, embed_dim=cfg.embed_dim,
                    n_prefix_tokens=cfg.num_prefix_tokens, name="pos_embed")
                x = _add_pos_dynamic(pe, x, dyn_position, dtype)
            else:
                x = PosEmbed(
                    pos_grid_size=cfg.patch_grid, embed_dim=cfg.embed_dim,
                    n_prefix_tokens=cfg.num_prefix_tokens, name="pos_embed")(
                        x, token_position=token_position,
                        run_grid_size=run_grid)
            if cfg.drop_rate > 0 and train:
                # pos_drop (mamba_models.py:477/541).
                x = nn.Dropout(rate=cfg.drop_rate, deterministic=False)(x)

        if cfg.transpose_token_sequence:
            # F-major -> T-major patch order (mamba_models.py:543-562):
            # remove prefix tokens, transpose the (F', T') grid, re-insert.
            # Applied BEFORE shuffle/flip, matching the reference's order
            # (transpose :543 < shuffle :564 < flip :593).
            x = _transpose_tokens(x, grid, token_position)

        if if_random_token_rank:
            # Random token shuffle with cls-position tracking
            # (mamba_models.py:566-590; the reference tracks list positions
            # for double-cls too, :578-584).
            rng, kperm = jax.random.split(rng)
            perm = jax.random.permutation(kperm, x.shape[1])
            x = x[:, perm]
            token_position, dyn_position = _track_shuffle(
                perm, token_position, dyn_position)

        if flip_sequence_prob > 0:
            # flip_img_sequences_ratio (mamba_models.py:596-599): flip the
            # whole token sequence with the given probability. The reference
            # does not retarget list (double-cls) positions on flip — it
            # doesn't need to: the [0, N-1] prefix pair maps to itself and
            # the (head+tail)/2 readout is symmetric. Shuffled double-cls
            # positions ARE retargeted below (i -> N-1-i), which the
            # reference-with-shuffle+flip combination would require too.
            # Known divergence when combined with if_rope (both ctor-only
            # knobs, neither reachable from the reference CLI): the
            # reference un-flips around each per-layer rope application
            # (mamba_models.py:603-618) so rope always sees the canonical
            # orientation; here rope is applied to the flipped order —
            # self-consistent, but not bit-matching that ctor combination.
            rng, kflip = jax.random.split(rng)
            do_flip = jax.random.uniform(kflip, ()) < flip_sequence_prob
            x = jnp.where(do_flip, x[:, ::-1], x)
            token_position, dyn_position = _track_flip(
                do_flip, x.shape[1], token_position, dyn_position)

        # Effective remat granularity (see AudioMambaConfig.remat_mode).
        if not cfg.remat:
            remat_mode = "none"
        elif cfg.remat_mode == "auto":
            remat_mode = "block"
            if self.use_kernel is not False:
                import os as _os

                # Calibrated whole-program temp estimate for split remat
                # (v5e memory_analysis(): 14.42 GiB fp32 / 10.59 GiB bf16
                # at depth 24, B=32, L=513, d_inner=1536 -> affine in the
                # itemsize; see AudioMambaConfig.remat_mode docs).
                per_unit = 3.4 * jnp.dtype(dtype).itemsize + 12.0
                # x here is the token sequence (B, L, D), cls included.
                est = (cfg.depth * x.shape[0] * x.shape[1]
                       * 2 * cfg.embed_dim * per_unit)
                # 15.75 GB v5e HBM minus ~2.1 GiB args/opt-state minus
                # headroom for the eval program and fragmentation.
                budget = float(_os.environ.get(
                    "AUM_SPLIT_REMAT_BUDGET", 12.5e9))
                if est <= budget:
                    remat_mode = "split"
        else:
            remat_mode = cfg.remat_mode

        block_kwargs = dict(
            d_model=cfg.embed_dim, norm_epsilon=cfg.norm_epsilon,
            rms_norm=cfg.rms_norm, residual_in_fp32=cfg.residual_in_fp32,
            bimamba_type=cfg.bimamba_type, if_devide_out=cfg.if_devide_out,
            init_layer_scale=cfg.init_layer_scale,
            d_state=cfg.d_state, n_layer=cfg.depth, dtype=dtype,
            use_kernel=self.use_kernel, model_axis=self.model_axis,
            seq_axis=self.seq_axis,
            split_remat=remat_mode == "split")

        rope_bufs = None
        if cfg.if_rope:
            from aum_tpu.models.rope import rope_freqs_2d

            cos, sin = rope_freqs_2d(cfg.embed_dim // 2, cfg.patch_grid,
                                     cfg.patch_grid)
            rope_bufs = (jnp.asarray(cos), jnp.asarray(sin))

        # The scan carry must keep a fixed pytree structure, so the residual
        # stream starts as zeros (equivalent to the reference's residual=None
        # first-block special case: residual' = 0 + hidden = hidden).
        res0 = jnp.zeros(
            x.shape, jnp.float32 if cfg.residual_in_fp32 else dtype)
        cell_cls = _BlockCell
        pair_cls = _BlockPair
        if remat_mode == "block":
            cell_cls = nn.remat(_BlockCell, prevent_cse=False)
            pair_cls = nn.remat(_BlockPair, prevent_cse=False)
        if self.pipe_axis is not None and self.seq_axis is not None:
            raise ValueError("pipe_axis and seq_axis cannot be combined "
                             "(nested partial-manual shard_maps)")
        # Pipeline parallelism: in apply mode, read the nn.scan-owned
        # stacked params ('layers' subtree — identical structure either
        # way) and run the SAME cell module GPipe-style over pipe_axis
        # (parallel/pipeline.py). Init (and non-pipe runs) use the
        # sequential nn.scan.
        pipelined = (self.pipe_axis is not None
                     and not self.is_initializing())
        # Stochastic depth: per-layer drop rates (the reference's decay rule,
        # mamba_models.py:290-293 — layer 0 rate 0, layer i >= 1 rate
        # rate*(i-1)/(depth-1)). Passed as nn.scan xs so each scan step sees
        # its own rate; None (the rate-0 / eval case) keeps the trace
        # byte-identical to the no-drop-path graph.
        use_dp = train and cfg.drop_path_rate > 0
        dp_rates = None
        dp_scales = None
        if use_dp:
            import numpy as _np

            dpr = _np.linspace(0.0, cfg.drop_path_rate, cfg.depth)
            inter = _np.concatenate([[0.0], dpr[:-1]]).astype(_np.float32)
            if pipelined:
                # Under the shard_map pipeline the cells cannot make_rng;
                # instead draw ALL per-(layer, sample) keep decisions here
                # (ordinary module scope) and ship the resulting scale array
                # (mask/keep: 0 or 1/keep — _drop_path's where(mask, x/keep,
                # 0) written as one multiply) through the pipeline carry so
                # it microbatches with the activations
                # (parallel/pipeline.py::block_stage_fn_dp, VERDICT r4 #5).
                # Layer 0's rate is 0 -> keep=1 -> scale==1.0 exactly.
                keep = 1.0 - jnp.asarray(inter)  # (depth,)
                keys = jax.random.split(self.make_rng("dropout"), cfg.depth)
                mask = jax.vmap(
                    lambda k, p: jax.random.bernoulli(k, p, (x.shape[0],))
                )(keys, keep)  # (depth, B)
                scales = mask.astype(jnp.float32) / keep[:, None]
                dp_scales = (
                    scales.T if not cfg.if_bidirectional  # (B, depth)
                    else jnp.transpose(
                        scales.reshape(cfg.depth // 2, 2, x.shape[0]),
                        (2, 0, 1)))  # (B, depth//2, 2)
            else:
                dp_rates = jnp.asarray(
                    inter if not cfg.if_bidirectional
                    else inter.reshape(cfg.depth // 2, 2))
        if not cfg.if_bidirectional:
            if pipelined:
                from aum_tpu.parallel.pipeline import (
                    block_stage_fn,
                    block_stage_fn_dp,
                    pipeline_apply,
                )

                cell = cell_cls(
                    block_kwargs=block_kwargs, rope_bufs=rope_bufs,
                    rope_residual=cfg.if_rope_residual,
                    n_prefix=cfg.num_prefix_tokens)
                if use_dp:
                    hidden, residual, _ = pipeline_apply(
                        block_stage_fn_dp(cell, self.pipe_axis),
                        self.get_variable("params", "layers"),
                        (x, res0, dp_scales),
                        axis=self.pipe_axis,
                        microbatches=self.pipe_microbatches)
                else:
                    hidden, residual = pipeline_apply(
                        block_stage_fn(cell),
                        self.get_variable("params", "layers"), (x, res0),
                        axis=self.pipe_axis,
                        microbatches=self.pipe_microbatches)
            else:
                ScannedBlock = nn.scan(
                    cell_cls,
                    variable_axes={"params": 0},
                    split_rngs={"params": True, "dropout": True},
                    length=cfg.depth,
                    metadata_params={nn.meta.PARTITION_NAME: "layers"},
                )
                (hidden, residual), _ = ScannedBlock(
                    block_kwargs=block_kwargs, rope_bufs=rope_bufs,
                    rope_residual=cfg.if_rope_residual,
                    n_prefix=cfg.num_prefix_tokens,
                    name="layers")((x, res0), dp_rates)
        else:
            # Paired forward/backward layers (mamba_models.py:624-638): layer
            # 2i on the sequence, layer 2i+1 on the reversed sequence, summed.
            if pipelined:
                from aum_tpu.parallel.pipeline import (
                    block_stage_fn,
                    block_stage_fn_dp,
                    pipeline_apply,
                )

                cell = pair_cls(block_kwargs=block_kwargs)
                if use_dp:
                    hidden, residual, _ = pipeline_apply(
                        block_stage_fn_dp(cell, self.pipe_axis),
                        self.get_variable("params", "layers"),
                        (x, res0, dp_scales),
                        axis=self.pipe_axis,
                        microbatches=self.pipe_microbatches)
                else:
                    hidden, residual = pipeline_apply(
                        block_stage_fn(cell),
                        self.get_variable("params", "layers"), (x, res0),
                        axis=self.pipe_axis,
                        microbatches=self.pipe_microbatches)
            else:
                ScannedPair = nn.scan(
                    pair_cls,
                    variable_axes={"params": 0},
                    split_rngs={"params": True, "dropout": True},
                    length=cfg.depth // 2,
                    metadata_params={nn.meta.PARTITION_NAME: "layers"},
                )
                (hidden, residual), _ = ScannedPair(
                    block_kwargs=block_kwargs,
                    name="layers")((x, res0), dp_rates)

        if use_dp:
            # Final add+norm drops the last mixer output at the FULL rate
            # (model-level self.drop_path, mamba_models.py:293/644-657).
            hidden = _drop_path(self.make_rng("dropout"), hidden,
                                cfg.drop_path_rate)
        norm_f_w = self.param("norm_f_weight", nn.initializers.ones,
                              (cfg.embed_dim,))
        norm_f_b = (None if cfg.rms_norm else self.param(
            "norm_f_bias", nn.initializers.zeros, (cfg.embed_dim,)))
        hidden = fused_add_norm(
            hidden, norm_f_w.astype(dtype), norm_f_b, residual=residual,
            prenorm=False, residual_in_fp32=cfg.residual_in_fp32,
            eps=cfg.norm_epsilon,
            norm_type="rms" if cfg.rms_norm else "layer")

        # Readout (mamba_models.py:660-675).
        if cfg.if_cls_token:
            if cfg.use_double_cls_token:
                feats = (hidden[:, token_position[0]]
                         + hidden[:, token_position[1]]) / 2
            elif dyn_position is not None:
                feats = jnp.take_along_axis(
                    hidden, dyn_position[None, None, None].repeat(
                        hidden.shape[0], 0).repeat(hidden.shape[2], 2),
                    axis=1)[:, 0]
            else:
                feats = hidden[:, token_position]
        elif cfg.final_pool_type == "none":
            feats = hidden[:, -1]
        elif cfg.final_pool_type == "mean":
            feats = jnp.mean(hidden, axis=1)
        elif cfg.final_pool_type in ("max", "all"):
            feats = hidden
        else:
            raise NotImplementedError(cfg.final_pool_type)

        if return_features:
            return feats

        head_w = self.param("head_weight", trunc_normal_02,
                            (cfg.embed_dim, cfg.num_classes))
        head_b = self.param("head_bias", nn.initializers.zeros,
                            (cfg.num_classes,))
        logits = feats.astype(dtype) @ head_w.astype(dtype) + head_b.astype(dtype)
        if cfg.final_pool_type == "max" and not cfg.if_cls_token:
            logits = jnp.max(logits, axis=1)
        return logits


def _drop_path(rng, x, rate):
    """Per-sample stochastic depth (timm DropPath semantics, referenced by
    mamba_models.py:51/71/90): with probability `rate` zero the whole branch
    for a sample, scaling kept samples by 1/keep. `rate` may be a traced
    scalar (a per-layer nn.scan input); rate 0 is an exact identity
    (bernoulli(p=1) keeps everything, /1.0)."""
    keep = jnp.float32(1.0) - jnp.asarray(rate, jnp.float32)
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return jnp.where(mask, x / keep.astype(x.dtype), 0).astype(x.dtype)


class _BlockCell(nn.Module):
    """nn.scan cell wrapping one MambaBlock (carry = (hidden, residual)).

    Per-layer RoPE (mamba_models.py:614-620) is applied to the hidden stream
    (and optionally the residual) before the block when enabled. The scan
    xs is the per-layer stochastic-depth rate (None when disabled); dropping
    `hidden` before the block equals the reference Block's
    `fused_add_norm_fn(self.drop_path(hidden_states), ..., residual)`
    (mamba_models.py:88-97) since MambaBlock starts with that same add+norm.
    """

    block_kwargs: dict
    rope_bufs: Optional[tuple] = None
    rope_residual: bool = False
    n_prefix: int = 1

    @nn.compact
    def __call__(self, carry, dp_rate):
        hidden, residual = carry
        if self.rope_bufs is not None:
            from aum_tpu.models.rope import apply_rope

            cos, sin = self.rope_bufs
            hidden = apply_rope(hidden, cos.astype(hidden.dtype),
                                sin.astype(hidden.dtype), self.n_prefix)
            if self.rope_residual:
                residual = apply_rope(residual, cos.astype(residual.dtype),
                                      sin.astype(residual.dtype),
                                      self.n_prefix)
        if dp_rate is not None:
            if jnp.ndim(dp_rate) == 0:
                # per-layer RATE (nn.scan xs): draw the mask here.
                hidden = _drop_path(self.make_rng("dropout"), hidden,
                                    dp_rate)
            else:
                # precomputed per-sample SCALE (B,) — pipeline path, where
                # make_rng is unavailable inside shard_map; the mask/keep
                # multiply is drawn by the caller (block_stage_fn_dp).
                hidden = hidden * dp_rate.astype(hidden.dtype)[:, None, None]
        hidden, residual = MambaBlock(
            **self.block_kwargs, name="block")(hidden, residual)
        return (hidden, residual), None


class _BlockPair(nn.Module):
    """One forward-layer + one reversed-layer pair for if_bidirectional.

    The scan xs is the (2,) per-layer stochastic-depth rate pair — each
    paired layer drops its own incoming hidden (mamba_models.py:631-636,
    rates inter_dpr[2i]/inter_dpr[2i+1]); the per-sample mask broadcasts
    over length, so dropping before the flip equals dropping after it.
    """

    block_kwargs: dict

    @nn.compact
    def __call__(self, carry, dp_rates):
        hidden, residual = carry
        h_in_f, h_in_b = hidden, hidden[:, ::-1]
        if dp_rates is not None:
            if jnp.ndim(dp_rates) == 1:
                # (2,) per-pair RATES (nn.scan xs): draw masks here.
                h_in_f = _drop_path(self.make_rng("dropout"), h_in_f,
                                    dp_rates[0])
                h_in_b = _drop_path(self.make_rng("dropout"), h_in_b,
                                    dp_rates[1])
            else:
                # (B, 2) precomputed per-sample SCALES (pipeline path; see
                # _BlockCell). The per-sample scale broadcasts over length,
                # so scaling before the flip equals scaling after it.
                h_in_f = h_in_f * dp_rates[:, 0, None, None].astype(
                    h_in_f.dtype)
                h_in_b = h_in_b * dp_rates[:, 1, None, None].astype(
                    h_in_b.dtype)
        h_f, r_f = MambaBlock(**self.block_kwargs, name="fwd")(
            h_in_f, residual)
        h_b, r_b = MambaBlock(**self.block_kwargs, name="bwd")(
            h_in_b, residual[:, ::-1])
        hidden = h_f + h_b[:, ::-1]
        residual = r_f + r_b[:, ::-1]
        return (hidden, residual), None


def _track_shuffle(perm, token_position, dyn_position):
    """Position bookkeeping for ``x -> x[:, perm]`` (the random token
    shuffle, mamba_models.py:566-590): the token formerly at position p now
    sits at ``argmax(perm == p)``. Double-cls list positions are tracked
    per element (reference :578-584); scalar positions (static, random-cls,
    or already-traced) collapse into ``dyn_position``. Returns the updated
    ``(token_position, dyn_position)`` pair. Pure — unit-tested with marker
    tokens in tests/test_model.py."""
    if isinstance(token_position, (list, tuple)):
        return ([jnp.argmax(perm == p) for p in token_position],
                dyn_position)
    pos0 = (dyn_position if dyn_position is not None
            else (token_position if token_position is not None else 0))
    return token_position, jnp.argmax(perm == pos0)


def _track_flip(do_flip, n_tok, token_position, dyn_position):
    """Position bookkeeping for the conditional whole-sequence flip
    (flip_img_sequences_ratio, mamba_models.py:596-599): position p maps to
    ``n_tok - 1 - p`` when ``do_flip``. Static double-cls positions
    [0, n-1] are left alone — the pair maps to itself and the
    (head+tail)/2 readout is symmetric, matching the reference (which never
    retargets on flip); traced (post-shuffle) double-cls positions ARE
    retargeted, which the reference's shuffle+flip combination would
    require too. Returns the updated ``(token_position, dyn_position)``."""
    if isinstance(token_position, (list, tuple)):
        if any(not isinstance(p, int) for p in token_position):
            token_position = [jnp.where(do_flip, n_tok - 1 - p, p)
                              for p in token_position]
        return token_position, dyn_position
    if dyn_position is not None:
        return token_position, jnp.where(
            do_flip, n_tok - 1 - dyn_position, dyn_position)
    if token_position is not None:
        return token_position, jnp.where(
            do_flip, n_tok - 1 - token_position, token_position)
    return token_position, dyn_position


def _transpose_tokens(x, grid, token_position):
    """Reorder grid tokens from F-major to T-major (mamba_models.py:543-562),
    keeping cls token(s) at their position(s)."""
    gh, gw = grid
    if token_position is None:
        b, n, d = x.shape
        return x.reshape(b, gh, gw, d).swapaxes(1, 2).reshape(b, n, d)
    if isinstance(token_position, (list, tuple)):
        head, tail = x[:, :1], x[:, -1:]
        body = x[:, 1:-1]
        b, n, d = body.shape
        body = body.reshape(b, gh, gw, d).swapaxes(1, 2).reshape(b, n, d)
        return jnp.concatenate([head, body, tail], axis=1)
    tp = int(token_position)
    tok = x[:, tp:tp + 1]
    body = jnp.concatenate([x[:, :tp], x[:, tp + 1:]], axis=1)
    b, n, d = body.shape
    body = body.reshape(b, gh, gw, d).swapaxes(1, 2).reshape(b, n, d)
    return jnp.concatenate([body[:, :tp], tok, body[:, tp:]], axis=1)


def _add_pos_dynamic(pe: PosEmbed, x, p_dyn, dtype):
    """Prefix pos-embed add when the cls position is a traced value:
    token i gets prefix-pos if i==p else grid-pos[i - (i>p)]."""
    pos_var = pe(jnp.zeros((1, x.shape[1], x.shape[2]), dtype),
                 token_position=0)  # materializes the parameter via module
    # pos_var[0, 0] = prefix pos; pos_var[0, 1:] = grid pos in order.
    prefix = pos_var[:, :1]
    grid = pos_var[:, 1:]
    n1 = x.shape[1]
    idx = jnp.arange(n1)
    src = jnp.clip(idx - (idx > p_dyn), 0, n1 - 2)
    pos_for_tok = jnp.where((idx == p_dyn)[:, None], prefix[0],
                            grid[0][src])
    return x + pos_for_tok[None].astype(x.dtype)
