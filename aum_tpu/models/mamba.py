"""Mamba mixer + residual block, TPU-native (flax.linen).

Re-design of the reference `Mamba` module (/root/reference/vim-mamba_ssm/
mamba_ssm/modules/mamba_simple.py:34-399) and `Block`
(/root/reference/src/models/mamba_models.py:30-102) for JAX/TPU:

- (B, L, D) layout end-to-end; projections are plain MXU matmuls that XLA
  fuses with neighbors.
- The scan is the fused Pallas op `aum_tpu.ops.selective_scan` (softplus +
  discretize + scan + C-readout + D-skip + SiLU(z) gating in one kernel).
- Bidirectional variants never materialize flipped sequences: the backward
  direction uses `reverse=True` on the conv and the scan (equivalent to the
  reference's flip→op→flip at mamba_simple.py:229-246).

Variants (mamba_simple.py:129-165, 195-246):
  bimamba_type="none" (Fo-Fo): single forward scan.
  bimamba_type="v1" (Fo-Bi): shared conv/x_proj/dt_proj; a second scan over
    the same activations in reverse with its own A_b; outputs summed.
  bimamba_type="v2" (Bi-Bi): a fully separate second branch (conv1d_b,
    x_proj_b, dt_proj_b, A_b, D_b) run in reverse; outputs summed and halved
    when if_devide_out.

Parameter initializers replicate the torch defaults so training dynamics
match: Linear kernels ~ U(±1/sqrt(fan_in)) (torch kaiming_uniform(a=sqrt 5)),
conv taps/bias ~ U(±1/sqrt(k)), the special dt_proj init (mamba_simple.py:
96-113), S4D-real A_log = log(1..N) and D = 1 (mamba_simple.py:116-127), and
the GPT-2 1/sqrt(n_layer) out_proj rescale (mamba_models.py:143-172).
"""

from __future__ import annotations

import math
import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from aum_tpu.ops import causal_conv1d, fused_add_norm, selective_scan
from aum_tpu.ops.selective_scan import selective_scan_dual


def uniform_fan_in(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def scaled_uniform_fan_in(fan_in: int, scale: float):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound) * scale

    return init


def dt_bias_init(dt_min: float, dt_max: float, dt_init_floor: float):
    """Init so softplus(bias) is log-uniform in [dt_min, dt_max]."""

    def init(key, shape, dtype=jnp.float32):
        dt = jnp.exp(
            jax.random.uniform(key, shape, jnp.float32)
            * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
        dt = jnp.maximum(dt, dt_init_floor)
        # inverse softplus
        inv = dt + jnp.log(-jnp.expm1(-dt))
        return inv.astype(dtype)

    return init


def a_log_init(d_state: int):
    def init(key, shape, dtype=jnp.float32):
        del key
        d_inner = shape[0]
        a = jnp.tile(jnp.arange(1, d_state + 1, dtype=jnp.float32)[None, :],
                     (d_inner, 1))
        return jnp.log(a).astype(dtype)

    return init


def _scan_bypassed() -> bool:
    """AUM_SCAN_BYPASS=1: ablation knob for the eval millisecond budget
    (scripts/eval_budget.py, VERDICT r4 #1). NOT a compute path — it
    replaces the selective scan with a shape-correct surrogate so the
    non-scan share of a model step can be measured in isolation."""
    return os.environ.get("AUM_SCAN_BYPASS", "0") == "1"


def _scan_bypass(args):
    """Shape/dtype-correct scan surrogate that consumes EVERY scan input
    (so XLA cannot dead-code the projections that feed it) at roughly the
    HBM read floor of the real op's input streams: ~3 (B, L, D) reads and
    2 (B, L, N) reads, a few VPU passes, no transcendental/scan work."""
    u, delta, a, bm, cm, dsk, z, dt_b = args
    extra = jnp.sum(a) + jnp.sum(dsk)
    if dt_b is not None:
        extra = extra + jnp.sum(dt_b)
    y = (u * z + delta
         + (jnp.sum(bm, -1) + jnp.sum(cm, -1))[..., None]
         + extra.astype(u.dtype) * jnp.asarray(1e-30, u.dtype))
    return y.astype(u.dtype)


class MambaMixer(nn.Module):
    """Selective-SSM mixer (one direction pair) for one block."""

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: Optional[int] = None
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init_floor: float = 1e-4
    conv_bias: bool = True
    proj_bias: bool = False
    bimamba_type: str = "v2"
    if_devide_out: bool = True
    init_layer_scale: Optional[float] = None  # LayerScale gamma (mamba_simple.py:70-72)
    n_layer: int = 24          # for the GPT-2 out_proj rescale
    dtype: jnp.dtype = jnp.float32
    use_kernel: Optional[bool] = None
    # Tensor-parallel axis name (set when running under shard_map with
    # d_inner sharded; inserts the two psums the TP layout needs).
    model_axis: Optional[str] = None
    # Sequence-parallel axis name (VERDICT r3 #5): the scans run through
    # ops/seq_parallel.py::sharded_scan_in_jit — token length sharded over
    # this mesh axis with a (decay-product, end-state) carry exchange,
    # composing with GSPMD DP/TP in the same jit. Disables the fused dual
    # kernel (the two directions run as separate seq-parallel scans).
    seq_axis: Optional[str] = None
    # Split-remat: jax.checkpoint the pre-scan compute (in/x/dt projections
    # + conv) so its intermediates are recomputed in the backward, while the
    # scan itself stays OUT of any remat region — its custom_vjp residuals
    # (inputs + chunk-boundary states) are then saved once and the backward
    # never re-runs the scan forward kernel. This is the TPU analogue of the
    # reference's checkpoint_lvl=1 (selective_scan_interface.py:218-219: the
    # CUDA backward also recomputes only conv/projections, never the scan).
    # Enabled by AudioMamba when remat is on and the kernel path is active;
    # mutually exclusive with block-level nn.remat (which would re-run the
    # scan forward during the backward — measured ~10% of train-step time).
    split_remat: bool = False

    @property
    def d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def rank(self) -> int:
        return self.dt_rank if self.dt_rank is not None else math.ceil(
            self.d_model / 16)

    def _branch_params(self, suffix: str):
        d_in = self.d_inner
        conv_w = self.param(f"conv1d{suffix}_weight",
                            uniform_fan_in(self.d_conv),
                            (d_in, self.d_conv))
        conv_b = (self.param(f"conv1d{suffix}_bias",
                             uniform_fan_in(self.d_conv), (d_in,))
                  if self.conv_bias else None)
        x_proj = self.param(f"x_proj{suffix}_weight", uniform_fan_in(d_in),
                            (d_in, self.rank + 2 * self.d_state))
        dt_w = self.param(f"dt_proj{suffix}_weight",
                          uniform_fan_in(self.rank), (self.rank, d_in))
        dt_b = self.param(f"dt_proj{suffix}_bias",
                          dt_bias_init(self.dt_min, self.dt_max,
                                       self.dt_init_floor), (d_in,))
        a_log = self.param(f"A{suffix}_log", a_log_init(self.d_state),
                           (d_in, self.d_state))
        dsk = self.param(f"D{suffix}", nn.initializers.ones, (d_in,))
        return conv_w, conv_b, x_proj, dt_w, dt_b, a_log, dsk

    def _branch_activations(self, x, params, reverse_conv: bool):
        """conv -> x projection (shared pre-scan activations); returns the
        raw (B, L, R) dt-rank slice — the dt_proj matmul is applied by
        pre_fn (XLA path) or folded into the scan kernel (dt_fold)."""
        conv_w, conv_b, x_proj, _, _, _, _ = params
        xc = causal_conv1d(
            x, conv_w.astype(self.dtype),
            None if conv_b is None else conv_b.astype(self.dtype),
            activation="silu", reverse=reverse_conv)
        x_dbl = xc @ x_proj.astype(self.dtype)
        if self.model_axis is not None:
            # TP: x_proj contracts the sharded d_inner -- reduce partials.
            x_dbl = jax.lax.psum(x_dbl, self.model_axis)
        dtr = x_dbl[..., : self.rank]
        bm = x_dbl[..., self.rank: self.rank + self.d_state]
        cm = x_dbl[..., self.rank + self.d_state:]
        return xc, dtr, bm, cm

    def _scan_args(self, delta, acts, z, params, a_log_override=None):
        """delta is None when the dt_proj matmul is folded into the kernel."""
        xc, _, bm, cm = acts
        _, _, _, _, dt_b, a_log, dsk = params
        a_log_use = a_log if a_log_override is None else a_log_override
        a = -jnp.exp(a_log_use.astype(jnp.float32))
        return (xc, delta, a, bm, cm, dsk.astype(jnp.float32), z,
                dt_b.astype(jnp.float32))

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d_in = self.d_inner
        # The reference's single in_proj (d_model, 2*d_inner) is stored as
        # separate x/z projections so that sharding d_inner over the model
        # axis keeps both halves local (the checkpoint porter splits the
        # torch weight rows).
        in_proj_x = self.param("in_proj_x_weight",
                               uniform_fan_in(self.d_model),
                               (self.d_model, d_in))
        in_proj_z = self.param("in_proj_z_weight",
                               uniform_fan_in(self.d_model),
                               (self.d_model, d_in))
        out_proj = self.param(
            "out_proj_weight",
            scaled_uniform_fan_in(d_in, 1.0 / math.sqrt(self.n_layer)),
            (d_in, self.d_model))
        in_bias = None
        if self.proj_bias:
            in_bias = (self.param("in_proj_x_bias", nn.initializers.zeros,
                                  (d_in,)),
                       self.param("in_proj_z_bias", nn.initializers.zeros,
                                  (d_in,)))

        fwd_params = self._branch_params("")
        a_b_log = None
        bwd_params = None
        if self.bimamba_type == "v1":
            # v1 reuses the SAME forward conv/projection activations and
            # only runs the scan in reverse with its own A_b
            # (bimamba_inner_fn semantics, selective_scan_interface.py:
            # 673-709: y_b = scan(x.flip, delta.flip, A_b, B.flip, C.flip)).
            a_b_log = self.param("A_b_log", a_log_init(self.d_state),
                                 (d_in, self.d_state))
        elif self.bimamba_type == "v2":
            # v2 runs a fully separate branch on the flipped sequence
            # (mamba_simple.py:229-241): anti-causal conv + reverse scan.
            bwd_params = self._branch_params("_b")
        elif self.bimamba_type != "none":
            raise ValueError(f"unknown bimamba_type: {self.bimamba_type}")

        # fused bidirectional kernel; under sequence parallelism each
        # direction runs as its own seq-parallel scan instead.
        use_dual = self.use_kernel is not False and self.seq_axis is None
        # dt_fold: stream the dt-rank slice and run the dt_proj matmul +
        # softplus inside the dual kernel (MXU work in the VPU kernel; no
        # (B, L, D) dt tensor in HBM on the eval path — VERDICT r2 #2).
        # MEASURED SLOWER on v5e eval (interleaved A/B, B=64 bench:
        # 416.6/418.1 clips/s unfused vs 400.9/401.6 fused, ~-4%): the
        # in-kernel per-chunk (L_c,R)@(R,d_b) matmul + softplus costs more
        # VPU-serial time than the saved dt HBM streams — the scan is
        # issue-bound, not dt-bandwidth-bound (docs/ROOFLINE.md "Fused
        # dt_proj"). OFF by default; AUM_SCAN_FUSE_DT=1 opts in.
        fold_dt = (use_dual and self.bimamba_type in ("v1", "v2")
                   and os.environ.get("AUM_SCAN_FUSE_DT", "0") == "1")
        x = x.astype(self.dtype)

        def pre_fn(x, in_x_w, in_z_w, in_b, fwd_p, a_b, bwd_p):
            """Pre-scan compute: in-projections, conv, x/dt projections —
            pure in its params so it can sit inside a jax.checkpoint."""
            xs = x @ in_x_w.astype(self.dtype)
            z = x @ in_z_w.astype(self.dtype)
            if in_b is not None:
                xs = xs + in_b[0].astype(self.dtype)
                z = z + in_b[1].astype(self.dtype)
            acts = self._branch_activations(xs, fwd_p, reverse_conv=False)
            delta = (None if fold_dt
                     else acts[1] @ fwd_p[3].astype(self.dtype))
            if self.bimamba_type == "v1":
                fold = (((acts[1], fwd_p[3].astype(self.dtype)),) * 2
                        if fold_dt else None)
                return (self._scan_args(delta, acts, z, fwd_p),
                        self._scan_args(delta, acts, z, fwd_p,
                                        a_log_override=a_b), fold)
            if self.bimamba_type == "v2":
                acts_b = self._branch_activations(xs, bwd_p,
                                                  reverse_conv=True)
                delta_b = (None if fold_dt
                           else acts_b[1] @ bwd_p[3].astype(self.dtype))
                fold = (((acts[1], fwd_p[3].astype(self.dtype)),
                         (acts_b[1], bwd_p[3].astype(self.dtype)))
                        if fold_dt else None)
                return (self._scan_args(delta, acts, z, fwd_p),
                        self._scan_args(delta_b, acts_b, z, bwd_p), fold)
            return (self._scan_args(delta, acts, z, fwd_p), None, None)

        pre = (jax.checkpoint(pre_fn, prevent_cse=False) if self.split_remat
               else pre_fn)
        args_f, args_r, dt_fold = pre(x, in_proj_x, in_proj_z, in_bias,
                                      fwd_params, a_b_log, bwd_params)

        def scan_one(args, reverse):
            u, delta, a, bm, cm, dsk, z, dt_b = args
            if _scan_bypassed():
                return _scan_bypass(args)
            if self.seq_axis is not None:
                from aum_tpu.ops.seq_parallel import sharded_scan_in_jit

                return sharded_scan_in_jit(
                    u, delta, a, bm, cm, dsk, z, dt_b,
                    delta_softplus=True, reverse=reverse,
                    axis=self.seq_axis, use_kernel=self.use_kernel)
            return selective_scan(
                u, delta, a, bm, cm, dsk, z=z, delta_bias=dt_b,
                delta_softplus=True, reverse=reverse,
                use_kernel=self.use_kernel)

        if self.bimamba_type == "none":
            y = scan_one(args_f, reverse=False)
        else:
            if use_dual:
                if _scan_bypassed():
                    y_f, y_b = _scan_bypass(args_f), _scan_bypass(args_r)
                else:
                    y_f, y_b = selective_scan_dual(args_f, args_r,
                                                   dt_fold=dt_fold)
            else:
                y_f = scan_one(args_f, reverse=False)
                y_b = scan_one(args_r, reverse=True)
            y = y_f + y_b
            if self.bimamba_type == "v2" and self.if_devide_out:
                y = y / 2

        out = y.astype(self.dtype) @ out_proj.astype(self.dtype)
        if self.model_axis is not None:
            # TP: out_proj contracts the sharded d_inner -- reduce partials.
            out = jax.lax.psum(out, self.model_axis)
        if self.proj_bias:
            out = out + self.param("out_proj_bias", nn.initializers.zeros,
                                   (self.d_model,)).astype(self.dtype)
        if self.init_layer_scale is not None:
            # gamma scales the FULL out_proj output incl. its bias
            # (mamba_simple.py:308-310: out = self.out_proj(y) then
            # out * self.gamma) -- so it must come after the bias add.
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.init_layer_scale),
                (self.d_model,))
            out = out * gamma.astype(self.dtype)
        return out


class MambaBlock(nn.Module):
    """Add → Norm → Mixer block with fp32 residual stream.

    Matches the reference Block (mamba_models.py:30-102): takes
    (hidden, residual), returns (mixer_out, residual + hidden) where the norm
    is applied to the fp32 residual sum.
    """

    d_model: int
    norm_epsilon: float = 1e-5
    rms_norm: bool = True
    residual_in_fp32: bool = True
    bimamba_type: str = "v2"
    if_devide_out: bool = True
    init_layer_scale: Optional[float] = None
    d_state: int = 16
    n_layer: int = 24
    dtype: jnp.dtype = jnp.float32
    use_kernel: Optional[bool] = None
    model_axis: Optional[str] = None
    seq_axis: Optional[str] = None
    split_remat: bool = False

    @nn.compact
    def __call__(self, hidden, residual=None):
        norm_w = self.param("norm_weight", nn.initializers.ones,
                            (self.d_model,))
        norm_b = (None if self.rms_norm else
                  self.param("norm_bias", nn.initializers.zeros,
                             (self.d_model,)))
        normed, residual = fused_add_norm(
            hidden, norm_w.astype(self.dtype), norm_b, residual=residual,
            prenorm=True, residual_in_fp32=self.residual_in_fp32,
            eps=self.norm_epsilon,
            norm_type="rms" if self.rms_norm else "layer")
        hidden = MambaMixer(
            d_model=self.d_model, d_state=self.d_state,
            bimamba_type=self.bimamba_type, if_devide_out=self.if_devide_out,
            init_layer_scale=self.init_layer_scale,
            n_layer=self.n_layer, dtype=self.dtype,
            use_kernel=self.use_kernel, model_axis=self.model_axis,
            seq_axis=self.seq_axis,
            split_remat=self.split_remat, name="mixer")(normed)
        return hidden, residual
