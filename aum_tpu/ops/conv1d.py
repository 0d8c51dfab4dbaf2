"""Depthwise causal 1D convolution (the Mamba "short conv"), TPU-style.

The reference uses a dedicated CUDA op (`causal_conv1d_cuda`, wrapped at
/root/reference/vim-mamba_ssm/mamba_ssm/ops/selective_scan_interface.py:177 and
mamba_simple.py:271-280): a depthwise conv with kernel k (default 4), left
padding k-1, optionally fused with SiLU.

Two implementations:

1. ``causal_conv1d_xla``: k equal-size slices of ONE zero-padded copy — pure
   VPU work XLA fuses into a single elementwise pass. Device profiling showed
   the earlier per-tap slice+concat form materialized three ~100MB shifted
   copies per call (3.1 ms at eval shapes); the pad-once form fuses to one
   pass (0.7 ms). But that fused pass still *reads* the padded input once per
   tap (~4R + 1W of HBM traffic at k=4).

2. A Pallas kernel (opt-in via AUM_CONV_KERNEL=1 / use_kernel=True): each
   grid step loads a (b_tile, L, d_block) panel into VMEM once, forms the k
   shifted multiply-adds on-chip, and writes the result. The full sequence
   length fits VMEM at model shapes (L≈513), so no sequential chunk grid or
   carried halo is needed.

Measured on v5e (scripts/bench_conv.py, B=64 L=513 D=1536): the bf16 XLA
form runs ~0.24 ms — already at the 1R+1W HBM floor (XLA fuses the pad and
all four tap-slices into one pass; the "4 reads" this kernel was built to
eliminate don't materialize in practice). The kernel pays ~1.0 ms in bf16
(Mosaic lowers the sublane-shifted tap slices of (16,128)-packed bf16 tiles
to expensive roll ops) and wins only modestly in fp32 (1.34 vs 1.57 ms).
Hence the XLA form is the DEFAULT on all backends; the kernel stays for
fp32 use and as the partitioning-rule reference. End-to-end eval with the
kernel on was 379.9 vs 391.3 clips/s with the XLA form — same story.

The kernel path is wrapped in ``jax.custom_vjp``: the backward of a causal
depthwise conv is an anti-causal depthwise conv of the cotangent (and
vice-versa) plus k shifted reductions for the weight grad — all thin
memory-bound XLA ops, so the backward uses the XLA form directly (the
reference's CUDA op does the analogous thing: causal_conv1d_cuda.bwd is its
own mirrored kernel).

``reverse=True`` computes flip(seq) -> causal conv -> flip(seq), i.e. an
anti-causal conv, used by the backward branch of bidirectional Mamba v2
(mamba_simple.py:229-241 runs the full branch on the flipped sequence)
without materializing flipped copies.

GSPMD: the op is elementwise over (batch, channel) with only a k-1 halo
along L; the partitioning rule (shared with the scan ops) shards batch over
the data axes and channels over the model axes, keeps L replicated, and runs
the kernel on local shards with zero communication.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aum_tpu.ops.selective_scan import (
    _env_int,
    _make_partitioned,
    _partition_enabled,
    _pick_d_block,
    _sigmoid,
)


def causal_conv1d_xla(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    activation: str | None = "silu",
    reverse: bool = False,
) -> jax.Array:
    """Pad-once XLA form. See module docstring; semantics identical to the
    kernel path and to the reference op."""
    k = weight.shape[1]
    b_, l_, d_ = x.shape
    w = weight.astype(x.dtype)
    if not reverse:
        xp = jnp.pad(x, [(0, 0), (k - 1, 0), (0, 0)])
    else:
        xp = jnp.pad(x, [(0, 0), (0, k - 1), (0, 0)])
    out = None
    for i in range(k):
        # Causal: slice offset i holds x shifted right by (k-1-i) steps and
        # multiplies tap i; anti-causal mirrors the taps.
        tap = i if not reverse else (k - 1 - i)
        xi = jax.lax.slice(xp, (0, i, 0), (b_, i + l_, d_))
        term = xi * w[None, None, :, tap]
        out = term if out is None else out + term
    if bias is not None:
        out = out + bias[None, None, :].astype(x.dtype)
    if activation == "silu":
        out = out * jax.nn.sigmoid(out)
    elif activation is not None:
        raise ValueError(f"unsupported activation: {activation}")
    return out


# ---------------------------------------------------------------------------
# Pallas kernel path
# ---------------------------------------------------------------------------


def _conv_kernel(x_ref, wt_ref, b_ref, out_ref, *, k: int, reverse: bool,
                 activation: str | None, compute_f32: bool):
    """One (b_tile, L, d_block) panel: zero-halo concat + k shifted FMAs.

    Everything stays in VMEM. compute_f32 converts on load: bf16 VMEM values
    pack (16, 128) tiles, making the sublane-shifted tap slices expensive
    (Mosaic emits packed roll ops); f32 shifts are cheap and the HBM traffic
    stays bf16 either way. compute_f32=False matches the XLA form bit-for-bit
    in fp32 and to ~1 ulp in bf16 (identical op order).
    """
    x = x_ref[...]                       # (b_t, L, d_b)
    if compute_f32:
        x = x.astype(jnp.float32)
    w = wt_ref[...].astype(x.dtype)      # (k, d_b)
    l_ = x.shape[1]
    zpad = jnp.zeros((x.shape[0], k - 1, x.shape[2]), x.dtype)
    if not reverse:
        xp = jnp.concatenate([zpad, x], axis=1)
    else:
        xp = jnp.concatenate([x, zpad], axis=1)
    out = None
    for i in range(k):
        tap = i if not reverse else (k - 1 - i)
        term = xp[:, i:i + l_] * w[tap][None, None]
        out = term if out is None else out + term
    out = out + b_ref[...].astype(x.dtype)[None]
    if activation == "silu":
        out = out * _sigmoid(out)
    out_ref[...] = out.astype(out_ref.dtype)


def _pick_conv_b_tile(bsz: int, l_: int, d_block: int, esize: int,
                      budget_bytes: int = 8 * 2 ** 20) -> int:
    """Largest batch tile whose double-buffered in+out panels fit VMEM."""
    per_b = 4 * l_ * d_block * esize  # in + out, double-buffered
    for cand in (8, 4, 2):
        if cand * per_b <= budget_bytes and bsz % cand == 0:
            return cand
    return 1


def _conv_pallas(x, wt, bias2, *, reverse: bool, activation: str | None,
                 d_block: int, b_tile, interpret: bool, compute_f32: bool):
    bsz, l_, d = x.shape
    k = wt.shape[0]
    compute_f32 = compute_f32 and x.dtype != jnp.float32
    d_block = _pick_d_block(d, d_block)
    n_d = d // d_block
    if b_tile is None:
        b_tile = _pick_conv_b_tile(bsz, l_, d_block, x.dtype.itemsize)
    if bsz % b_tile != 0:
        b_tile = 1
    n_b = bsz // b_tile

    x_spec = pl.BlockSpec((b_tile, l_, d_block), lambda di, bi: (bi, 0, di),
                          memory_space=pltpu.VMEM)
    wt_spec = pl.BlockSpec((k, d_block), lambda di, bi: (0, di),
                           memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, d_block), lambda di, bi: (0, di),
                          memory_space=pltpu.VMEM)

    kernel = functools.partial(_conv_kernel, k=k, reverse=reverse,
                               activation=activation,
                               compute_f32=compute_f32)
    cost = pl.CostEstimate(
        flops=(2 * k + 4) * bsz * l_ * d,
        bytes_accessed=2 * bsz * l_ * d * x.dtype.itemsize,
        transcendentals=bsz * l_ * d if activation == "silu" else 0,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_d, n_b),
        in_specs=[x_spec, wt_spec, b_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(x, wt, bias2)


def _dsilu(pre):
    """d/dp [p * sigmoid(p)] = sig + p*sig*(1-sig)."""
    sig = jax.nn.sigmoid(pre)
    return sig + pre * sig * (1.0 - sig)


@functools.lru_cache(maxsize=None)
def _get_conv_op(reverse: bool, activation: str | None, d_block: int,
                 b_tile, interpret: bool, compute_f32: bool = True):
    """custom_vjp'd (x, weight, bias) -> out with a partitioned Pallas fwd."""

    def pallas_fun(x, wt, bias2):
        return _conv_pallas(x, wt, bias2, reverse=reverse,
                            activation=activation, d_block=d_block,
                            b_tile=b_tile, interpret=interpret,
                            compute_f32=compute_f32)

    if _partition_enabled():
        # x: (B, L, D) "seq"; wt: (k, D) matches the "at" (n d) factors;
        # bias2: (1, D) "vec". Batch shards over data, channels over model,
        # L replicated — zero-communication local conv per shard.
        pallas_fun = _make_partitioned(
            pallas_fun, ["seq", "at", "vec"], ["seq"])

    def primal(x, weight, bias):
        return pallas_fun(x, jnp.transpose(weight), bias[None])

    conv = jax.custom_vjp(primal)

    def fwd(x, weight, bias):
        return primal(x, weight, bias), (x, weight, bias)

    def bwd(res, g):
        x, weight, bias = res
        k = weight.shape[1]
        b_, l_, d_ = x.shape
        if activation == "silu":
            pre = causal_conv1d_xla(x, weight, bias, activation=None,
                                    reverse=reverse)
            gp = g * _dsilu(pre.astype(jnp.float32)).astype(g.dtype)
        else:
            gp = g
        # dx: transpose of a causal conv is the anti-causal conv with the
        # same taps (and vice versa) — exactly the `reverse=not reverse`
        # form: out[t] = sum_j gp[t+j] * w[:, k-1-j] for causal forward.
        dx = causal_conv1d_xla(gp, weight, None, activation=None,
                               reverse=not reverse)
        # dw[:, tap(i)] = sum_{b,t} gp[b,t,:] * xp[b,t+i,:]
        if not reverse:
            xp = jnp.pad(x, [(0, 0), (k - 1, 0), (0, 0)])
        else:
            xp = jnp.pad(x, [(0, 0), (0, k - 1), (0, 0)])
        taps = []
        for i in range(k):
            sl = jax.lax.slice(xp, (0, i, 0), (b_, i + l_, d_))
            taps.append(jnp.einsum("blc,blc->c", gp, sl,
                                   preferred_element_type=jnp.float32))
        dw = jnp.stack(taps, axis=1)
        if reverse:
            dw = dw[:, ::-1]
        db = jnp.sum(gp, axis=(0, 1), dtype=jnp.float32).astype(bias.dtype)
        return dx.astype(x.dtype), dw.astype(weight.dtype), db

    conv.defvjp(fwd, bwd)
    return conv


def causal_conv1d(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    activation: str | None = "silu",
    reverse: bool = False,
    use_kernel: bool | None = None,
    interpret: bool | None = None,
    d_block: int | None = None,
    b_tile: int | None = None,
) -> jax.Array:
    """Depthwise causal conv along the sequence axis.

    Args:
      x: (B, L, D) input.
      weight: (D, K) per-channel filter taps, tap k multiplies x[t - (K-1) + k]
        (same orientation as the reference's Conv1d weight squeezed to (d, w)).
      bias: (D,) or None.
      activation: None | "silu".
      reverse: anti-causal (right-padded, taps reversed) — equivalent to
        flipping the sequence before and after a causal conv.
      use_kernel: force the Pallas path (None = off — the XLA form measured
        faster on-chip, see module docstring; opt in via AUM_CONV_KERNEL=1).
      interpret: Pallas interpret mode (None = auto: off on TPU).

    Returns:
      (B, L, D), same dtype as x.
    """
    if activation not in (None, "silu"):
        raise ValueError(f"unsupported activation: {activation}")
    if use_kernel is None:
        use_kernel = (_env_int("AUM_CONV_KERNEL", 0) != 0
                      and jax.default_backend() == "tpu")
    if not use_kernel:
        return causal_conv1d_xla(x, weight, bias, activation, reverse)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if d_block is None:
        d_block = _env_int("AUM_CONV_DBLOCK", 768)
    if b_tile is None:
        b_tile = _env_int("AUM_CONV_BTILE", 0) or None
    op = _get_conv_op(bool(reverse), activation, d_block, b_tile,
                      bool(interpret), _env_int("AUM_CONV_F32", 1) != 0)
    bias_arr = (jnp.zeros((x.shape[-1],), x.dtype) if bias is None
                else bias)
    return op(x, weight, bias_arr)


def causal_conv1d_update(
    x: jax.Array,
    conv_state: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    activation: str | None = "silu",
) -> tuple[jax.Array, jax.Array]:
    """Single-token decode step of the causal conv.

    Mirrors `causal_conv1d_update` (reference mamba_simple.py:328-334): rolls
    the (B, D, K) state left by one, appends x, and applies the filter.

    Args:
      x: (B, D) new token.
      conv_state: (B, D, K) previous inputs (oldest first).
      weight: (D, K).

    Returns:
      (y (B, D), new_conv_state (B, D, K)).
    """
    conv_state = jnp.concatenate([conv_state[:, :, 1:], x[:, :, None]], axis=2)
    y = jnp.einsum("bdk,dk->bd", conv_state, weight)
    if bias is not None:
        y = y + bias[None, :]
    if activation == "silu":
        y = y * jax.nn.sigmoid(y)
    return y, conv_state
