"""Pallas TPU selective-scan (Mamba SSM) kernel with custom VJP.

TPU-native replacement for the reference's CUDA ops `selective_scan_cuda.fwd`
and `selective_scan_cuda.bwd` (wrapped at /root/reference/vim-mamba_ssm/
mamba_ssm/ops/selective_scan_interface.py:37-84). Semantics match the
pure-PyTorch oracle `selective_scan_ref` (same file, :86-152), re-expressed in
the TPU-natural (batch, length, channel) layout; the jnp oracle lives in
``aum_tpu.ops.scan_ref`` and is what the kernel is tested against.

Design (see SURVEY.md §2.2 / §7):

- Grid ``(d_tile, batch, l_chunk)`` with the length-chunk dimension innermost.
  TPU grid steps execute sequentially on the core, so the SSM state is carried
  across length chunks in a VMEM scratch buffer — a two-level scan: sequential
  across chunks, vectorized within a chunk.
- Within a chunk, everything parallelizable is hoisted out of the serial
  chain: ``dt = softplus(delta + bias)``, the decay ``a = exp(dt ⊗ A)`` and
  the input term ``dt·u ⊗ B`` are materialized for the whole chunk as
  (L_c, N, d_b) VMEM tensors in one shot (vectorized exp!), the output
  contraction ``y_t = Σ_n C_t x_t`` and the D-skip + SiLU(z) gating are
  applied chunk-wide after the scan. The serial loop itself is a single
  vector fma per step on an (N, d_b) tile — full-lane VPU work.
- ``reverse=True`` runs the recurrence right-to-left by *indexing* chunks and
  in-chunk steps in reverse — equivalent to flip→scan→flip (what the reference
  does for the backward direction of bidirectional Mamba, mamba_simple.py:
  229-246) with zero materialized flips.
- Backward: a checkpointed adjoint scan (the analogue of the reference's
  ``checkpoint_lvl=1`` recompute strategy, selective_scan_interface.py:218).
  The forward saves only chunk-boundary states; the backward revisits chunks
  in reverse processing order, recomputes in-chunk states with the same
  two-level scan, then runs the adjoint recurrence
  ``λ_t = C_t·gy_t + a_{t+1}·λ_{t+1}`` and forms all parameter/input grads
  with chunk-wide vectorized contractions. dA/dD/ddelta_bias accumulate into
  revisited output blocks; dB/dC are produced as per-d-tile partials and
  reduced outside the kernel.

The fused op covers: discretization, scan, C-readout, D skip and SiLU(z)
gating. dt = softplus(delta + bias) is hoisted OUT of the kernels into XLA
(see ``_prep``): it fuses into the dt_proj matmul epilogue that produces
delta, so the kernels stream a pre-activated dt (same bytes as delta) and
the softplus work rides the MXU-bound projection phase instead of the
VPU-bound scan. The backward applies the softplus chain rule in-kernel from
dt alone via sigmoid(delta + bias) = 1 - exp(-dt). The surrounding
projections (in/x/dt/out_proj) stay in XLA where they map straight onto the
MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aum_tpu.ops.scan_ref import selective_scan_ref



def _largest_divisor_leq(n: int, target: int, step: int) -> int:
    """Largest multiple of `step` that divides n and is <= target (or n itself)."""
    if n <= target:
        return n
    best = step
    d = step
    while d <= target:
        if n % d == 0:
            best = d
        d += step
    return best


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_d_block(d: int, target: int) -> int:
    """d-tile for the *local* channel extent.

    Called inside the (possibly partitioned) op so the tile is picked from
    the per-shard d — under GSPMD the kernel sees d/n_model channels.
    """
    d_block = _largest_divisor_leq(d, target, 128)
    if d % 128 != 0:
        d_block = _largest_divisor_leq(d, target, 8)
    return d_block


def _sigmoid(x):
    # Primitives-only stable sigmoid (jax.nn.sigmoid is custom_jvp-wrapped;
    # its closed_call jaxpr trips the MLIR lowering cache inside Pallas
    # kernels that get inlined under an outer scan/fori_loop).
    return 0.5 * (jnp.tanh(0.5 * x) + 1.0)


def _softplus(x):
    # Primitives-only stable softplus (same closed_call rationale as above).
    return jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(x)))


def _silu(x):
    return x * _sigmoid(x)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel_z(
    *refs,
    l_chunk: int, reverse: bool, save_states: bool, seq_len: int,
    inline_decay: bool = False, with_state: bool = False,
):
    """Forward kernel with fused D-skip and SiLU(z) gating.

    with_state=True adds an initial-state input x0 (the scan starts from it
    instead of zeros) and a final-state output (the carry at the last valid
    position) — the building block for sequence-parallel scans (chunk-
    boundary carries exchanged across a 'seq' mesh axis) and chunked LM
    prefill. In that mode the recurrence inputs are overhang-masked in BOTH
    directions: a forward scan meets the overhang chunk last, and with a
    live final-state output the garbage would no longer die with the chunk.

    dt arrives PRE-ACTIVATED: softplus(delta + bias) is computed by XLA in
    the wrapper (_prep), where it fuses into the dt_proj matmul epilogue
    that produces delta — the kernel streams dt instead of delta (same
    bytes) and skips the softplus/bias work entirely, and the backward
    recovers d(delta) via sigmoid(delta+bias) = 1 - exp(-dt) (see
    scan_bwd), so no extra residual is needed.

    Blocks carry a leading batch-tile dim (b_t): b_t independent recurrence
    chains advance together in the serial loop (interleaved FMA chains hide
    each other's latency and cut grid steps by b_t for large batches).

    Inputs are NOT padded on the host: the last chunk's blocks overhang the
    array (Pallas allows out-of-bounds blocks; overhang reads are garbage,
    overhang writes are discarded). For reverse scans, positions >= seq_len
    are neutralized by forcing dt=0 / dt·u=0 / B=0 there (decay exp(0)=1
    passes the state through, input term is 0) — the overhang chunk is
    processed first, so its garbage would otherwise poison every valid
    chunk's carry. Forward scans need no masking at all (see the in-code
    note), which saves several full-chunk select passes per grid step.

    Mirrors the dual kernel's fused design: the input term dt·u ⊗ B is
    formed per step from small scratch (never a (L_c, N, d_b) chunk tensor),
    the y-readout contraction happens per step in the loop (x never
    round-trips through scratch), and exp goes through exp2 with log2(e)
    folded into the (L_c, d_b) dt factor.
    """
    n_in = 8 if with_state else 7
    (u_ref, dt_ref, at_ref, b_ref, c_ref, d_ref, z_ref) = refs[:7]
    x0_ref = refs[7] if with_state else None
    out_ref, xb_ref = refs[n_in:n_in + 2]
    xfin_ref = refs[n_in + 2] if with_state else None
    state_ref, a_scr, y_scr, dtu_scr, bm_scr, cm_scr = refs[n_in + 2
                                                           + with_state:]

    l = pl.program_id(2)

    @pl.when(l == 0)
    def _():
        if with_state:
            state_ref[...] = x0_ref[...].astype(jnp.float32)
        else:
            state_ref[...] = jnp.zeros_like(state_ref)

    if save_states:
        xb_ref[...] = state_ref[...][:, None]

    # Overhang masking is needed only when this scan direction processes
    # the overhang chunk FIRST (reverse=True: right-to-left across chunks,
    # invalid tail steps first within the chunk) — garbage there would
    # poison the carried state. Forward scans meet the overhang last, so
    # garbage only reaches dying state and discarded output rows (see the
    # fuller argument in _fwd_kernel_dual). Only the recurrence inputs
    # (dt, u, B) need the mask; C and z feed valid rows only. With a
    # final-state output the forward scan's carry must survive the overhang
    # too, so with_state masks both directions.
    masked = reverse or with_state
    if masked:
        lc = (pl.num_programs(2) - 1 - l) if reverse else l
        mask = _pos_mask(lc, l_chunk, seq_len, u_ref.shape)
        u = _mask0(mask, u_ref[...].astype(jnp.float32))  # (b_t,L_c,d_b)
    else:
        u = u_ref[...].astype(jnp.float32)
    a_t = at_ref[...].astype(jnp.float32)       # (N, d_b)

    dt = dt_ref[...].astype(jnp.float32)        # pre-activated (see docstring)
    if masked:
        dt = _mask0(mask, dt)

    _LOG2E = 1.4426950408889634
    if inline_decay:
        # As in _fwd_kernel_dual: per-step exp2 off the carry path; a_scr is
        # the (b_t, L_c, d_b) dt·log2(e) factor, not the materialized decay.
        a_scr[...] = dt * _LOG2E
    else:
        a_scr[...] = jnp.exp2(
            (dt * _LOG2E)[:, :, None, :] * a_t[None, None, :, :])
    dtu_scr[...] = dt * u
    bm = b_ref[...].astype(jnp.float32)
    bm_scr[...] = _mask0(mask, bm) if masked else bm
    cm_scr[...] = c_ref[...].astype(jnp.float32)

    def body(i, x):
        t = (l_chunk - 1 - i) if reverse else i
        if inline_decay:
            da = jnp.exp2(a_scr[:, t][:, None, :] * a_t[None])
        else:
            da = a_scr[:, t]
        x = (da * x
             + dtu_scr[:, t][:, None, :] * bm_scr[:, t][:, :, None])
        y_scr[:, t] = jnp.sum(x * cm_scr[:, t][:, :, None], axis=1)
        return x

    state = jax.lax.fori_loop(0, l_chunk, body, state_ref[...],
                              unroll=l_chunk)
    state_ref[...] = state
    if with_state:
        # Every grid step writes its carry; the sequentially-last write (the
        # final processed chunk, whose overhang steps are masked to exact
        # pass-throughs) is the one that lands in HBM.
        xfin_ref[...] = state

    ycore = y_scr[...] + d_ref[...].astype(jnp.float32)[None] * u
    zf = z_ref[...].astype(jnp.float32)
    out_ref[...] = (ycore * _silu(zf)).astype(out_ref.dtype)


def _pos_mask(l, l_chunk: int, seq_len: int, shape):
    """(1, L_c, 1) mask over the chunk: global position < seq_len."""
    pos = l * l_chunk + jax.lax.broadcasted_iota(
        jnp.int32, (shape[1], 1), 0)
    return (pos < seq_len).reshape(1, shape[1], 1)


def _mask0(m, x):
    """x where m else 0 (kills NaN/inf from overhang reads, unlike x*m).

    Uses lax.select directly: jnp.where is internally jit-wrapped and its
    closed_call jaxpr trips the MLIR lowering cache when the masked value is
    sliced many times inside the unrolled scan loop.
    """
    return jax.lax.select(jnp.broadcast_to(m, x.shape), x, jnp.zeros_like(x))


_VMEM_LIMIT_DEFAULT = 64 * 2 ** 20


def _scoped_vmem_limit() -> int:
    return int(float(_os.environ.get("AUM_SCAN_VMEM_LIMIT",
                                     _VMEM_LIMIT_DEFAULT)))


def _scoped_vmem_kw(interpret: bool) -> dict:
    """compiler_params raising Mosaic's scoped-VMEM ceiling.

    Mosaic's stock scoped-VMEM budget (declared scratch + stack
    temporaries) is 16M — a compiler default, not hardware: v5e has 128M of
    VMEM. Raising it to 64M unlocks tile shapes the 16M ceiling rejected;
    the big winner is the backward d-tile, 256 -> 768 at l_chunk 104
    (measured B=64/L=513 dual fwd+bwd: 24.04 -> 22.25 ms; d-tile 1536 at a
    96M ceiling regresses to 27.3 ms, and the forward's best tile is
    unchanged). AUM_SCAN_VMEM_LIMIT (bytes) overrides.
    """
    if interpret:
        return {}
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=_scoped_vmem_limit())}


def _scoped_vmem_budget() -> float:
    """Effective scoped-VMEM byte budget for kernel tile selection."""
    return _scoped_vmem_limit() - 0.5 * 2 ** 20


def _pick_b_tile(bsz: int, l_chunk: int, d_block: int, n_pad: int,
                 n_bufs: int = 3, budget_bytes: int = 12 * 2 ** 20) -> int:
    """Largest batch tile whose chunk scratch fits the VMEM budget."""
    per_chain = n_bufs * l_chunk * n_pad * d_block * 4
    max_bt = max(1, budget_bytes // max(per_chain, 1))
    bt = 1
    for cand in (8, 4, 2):
        if cand <= max_bt and bsz % cand == 0:
            bt = cand
            break
    return bt


def _fwd_pallas(u, dt, a_t, bm, cm, dsk, z, x0=None, *, reverse, save_states,
                d_block, l_chunk, interpret, b_tile=None, inline_decay=True):
    with_state = x0 is not None
    bsz, seq_len, d = u.shape
    n_pad = a_t.shape[0]
    d_block = _pick_d_block(d, d_block)  # d_block arg is the *target*
    n_d = d // d_block
    n_l = -(-seq_len // l_chunk)  # cdiv; last chunk may overhang
    if b_tile is None:
        b_tile = _pick_b_tile(bsz, l_chunk, d_block, n_pad)
    n_b = bsz // b_tile

    def lmap(li):
        return (n_l - 1 - li) if reverse else li

    seq_spec = pl.BlockSpec(
        (b_tile, l_chunk, d_block), lambda di, bi, li: (bi, lmap(li), di),
        memory_space=pltpu.VMEM)
    bc_spec = pl.BlockSpec(
        (b_tile, l_chunk, n_pad), lambda di, bi, li: (bi, lmap(li), 0),
        memory_space=pltpu.VMEM)
    at_spec = pl.BlockSpec(
        (n_pad, d_block), lambda di, bi, li: (0, di), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec(
        (1, d_block), lambda di, bi, li: (0, di), memory_space=pltpu.VMEM)

    state_spec = pl.BlockSpec(
        (b_tile, n_pad, d_block), lambda di, bi, li: (bi, 0, di),
        memory_space=pltpu.VMEM)

    out_shapes = [jax.ShapeDtypeStruct((bsz, seq_len, d), u.dtype)]
    out_specs = [seq_spec]
    if save_states:
        out_shapes.append(
            jax.ShapeDtypeStruct((bsz, n_l, n_pad, d), jnp.float32))
        out_specs.append(pl.BlockSpec(
            (b_tile, 1, n_pad, d_block), lambda di, bi, li: (bi, li, 0, di),
            memory_space=pltpu.VMEM))
    else:
        # Dummy 1-chunk-sized output so the kernel signature stays uniform.
        out_shapes.append(
            jax.ShapeDtypeStruct((b_tile, 1, n_pad, d), jnp.float32))
        out_specs.append(pl.BlockSpec(
            (b_tile, 1, n_pad, d_block), lambda di, bi, li: (0, 0, 0, di),
            memory_space=pltpu.VMEM))
    if with_state:
        out_shapes.append(
            jax.ShapeDtypeStruct((bsz, n_pad, d), jnp.float32))  # final state
        out_specs.append(state_spec)

    kernel = functools.partial(
        _fwd_kernel_z, l_chunk=l_chunk, reverse=reverse,
        save_states=save_states, seq_len=seq_len, inline_decay=inline_decay,
        with_state=with_state)

    flops_per_el = 10
    cost = pl.CostEstimate(
        flops=flops_per_el * bsz * seq_len * d * n_pad,
        bytes_accessed=4 * bsz * seq_len * d * 4,
        transcendentals=bsz * seq_len * d * n_pad,
    )

    a_shape = ((b_tile, l_chunk, d_block) if inline_decay
               else (b_tile, l_chunk, n_pad, d_block))
    in_specs = [seq_spec, seq_spec, at_spec, bc_spec, bc_spec, vec_spec,
                seq_spec]
    args = (u, dt, a_t, bm, cm, dsk, z)
    if with_state:
        in_specs.append(state_spec)
        args = args + (x0,)
    outs = pl.pallas_call(
        kernel,
        grid=(n_d, n_b, n_l),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((b_tile, n_pad, d_block), jnp.float32),   # state
            pltpu.VMEM(a_shape, jnp.float32),         # decay or dt·log2e
            pltpu.VMEM((b_tile, l_chunk, d_block), jnp.float32),  # y
            pltpu.VMEM((b_tile, l_chunk, d_block), jnp.float32),  # dt*u
            pltpu.VMEM((b_tile, l_chunk, n_pad), jnp.float32),   # B masked
            pltpu.VMEM((b_tile, l_chunk, n_pad), jnp.float32),   # C masked
        ],
        cost_estimate=cost,
        interpret=interpret,
        **_scoped_vmem_kw(interpret),
    )(*args)
    if with_state:
        out, xb, xfin = outs
        return out, xb, xfin
    out, xb = outs
    return out, xb


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(
    *refs,
    l_chunk: int, reverse: bool, seq_len: int, softplus: bool = True,
    with_state: bool = False, dla_mode: str = "xprev",
):
    # dt arrives pre-activated (see _fwd_kernel_z): the softplus chain rule
    # is applied IN-KERNEL from dt alone via sigmoid(delta + bias) =
    # 1 - exp(-dt) — one transcendental on a (b_t, L_c, d_b) chunk
    # (amortized over N), vs a full (B, L, D) ddt+dt read / ddelta write
    # XLA pass per direction per layer if done outside (measured +6 ms on
    # the B=12 train step). Note exp(-0) - ... = 0 on masked overhang rows,
    # which keeps dbias's accumulation overhang-safe exactly like the old
    # masked-sigmoid formulation.
    #
    # with_state adds a gfin input (cotangent of the forward's final-state
    # output — it seeds the adjoint carry lam exactly where a state beyond
    # the last position would inject it) and a dx0 output (the adjoint
    # carry after the first logical position, i.e. dL/dx0; written every
    # grid step, sequentially-last write wins).
    n_in = 10 if with_state else 9
    (u_ref, dt_ref, at_ref, b_ref, c_ref, d_ref, z_ref,
     g_ref, xb_ref) = refs[:9]
    gfin_ref = refs[9] if with_state else None
    (du_ref, ddelta_ref, dz_ref, dat_ref, dd_ref, dbias_ref,
     dbp_ref, dcp_ref) = refs[n_in:n_in + 8]
    dx0_ref = refs[n_in + 8] if with_state else None
    lam_state, a_scr, x_scr, lam_scr, tmp_scr = refs[n_in + 8 + with_state:]

    di = pl.program_id(0)
    bi = pl.program_id(1)
    l = pl.program_id(2)

    @pl.when(jnp.logical_and(bi == 0, l == 0))
    def _():
        dat_ref[...] = jnp.zeros_like(dat_ref)
        dd_ref[...] = jnp.zeros_like(dd_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    @pl.when(l == 0)
    def _():
        if with_state:
            lam_state[...] = gfin_ref[...].astype(jnp.float32)
        else:
            lam_state[...] = jnp.zeros_like(lam_state)

    # Neutralize out-of-range positions (unpadded inputs; see _fwd_kernel_z):
    # every per-position load is masked (overhang bits may be NaN/inf, and
    # 0 * NaN = NaN), dt=0 makes the recurrence pass-through, and masking
    # gy/sig zeroes every adjoint contribution from the overhang (lam there
    # is pure propagation; dla = lam*a*xprev is killed via the dla mask).
    lc = pl.program_id(2)
    n_lp = pl.num_programs(2)
    logical_chunk = lc if reverse else (n_lp - 1 - lc)
    m = _pos_mask(logical_chunk, l_chunk, seq_len, u_ref.shape)

    u = _mask0(m, u_ref[...].astype(jnp.float32))  # (b_t, L_c, d_b)
    a_t = at_ref[...].astype(jnp.float32)       # (N, d_b)
    bm = _mask0(m, b_ref[...].astype(jnp.float32))  # (b_t, L_c, N)
    cm = _mask0(m, c_ref[...].astype(jnp.float32))
    zf = _mask0(m, z_ref[...].astype(jnp.float32))
    g = _mask0(m, g_ref[...].astype(jnp.float32))
    dsk = d_ref[...].astype(jnp.float32)[None]

    dt = _mask0(m, dt_ref[...].astype(jnp.float32))

    # --- Recompute in-chunk states from the saved boundary state. -----------
    # exp as exp2 with log2(e) folded into the (L_c, d_b) dt factor — skips
    # the hidden full-(L_c, N, d_b) multiply inside exp's VPU lowering
    # (same trade the dual forward ships, _fwd_kernel_dual).
    _LOG2E = 1.4426950408889634
    a_scr[...] = jnp.exp2((dt * _LOG2E)[:, :, None, :]
                          * a_t[None, None, :, :])
    tmp_scr[...] = (dt * u)[:, :, None, :] * bm[:, :, :, None]   # dBu

    def fwd_body(i, x):
        t = (l_chunk - 1 - i) if reverse else i
        x = a_scr[:, t] * x + tmp_scr[:, t]
        x_scr[:, t] = x
        return x

    x0 = xb_ref[:, 0].astype(jnp.float32)        # (b_t, N, d_b)
    jax.lax.fori_loop(0, l_chunk, fwd_body, x0, unroll=l_chunk)

    # --- Recompute outputs of the chunk and gating grads. -------------------
    y = jnp.sum(x_scr[...] * cm[:, :, :, None], axis=2)    # (b_t, L_c, d_b)
    ycore = y + dsk * u
    sigz = _sigmoid(zf)
    silz = zf * sigz
    gy = _mask0(m, g * silz)                       # dL/dy_t
    dz = g * ycore * (sigz * (1.0 + zf * (1.0 - sigz)))
    dz_ref[...] = dz.astype(dz_ref.dtype)
    dd_ref[...] += jnp.sum(gy * u, axis=(0, 1), keepdims=True)[0]

    # --- Adjoint scan:  lam_t = C_t*gy_t + a_{t+1}*lam_{t+1}. ---------------
    # Pass-merge (VERDICT r4 #2c): dla_t = lam_t * a_t * x_{t-1} is computed
    # via the recurrence identity  a_t * x_{t-1} = x_t - dBu_t  (exact in
    # the same fp32 arithmetic that produced x_t, up to one rounding of the
    # fused update), which removes TWO full (L_c, N, d_b) traversals from
    # the chunk epilogue: the xprev concat (a Mosaic stack temporary) and
    # the separate *a_scr multiply. To keep dBu (tmp_scr) live, CgY is
    # staged in lam_scr and the adjoint loop updates lam_scr IN PLACE.
    # Overhang rows: dt=0 => a=1, dBu=0 => x_t = x_{t-1}, so
    # lam*(x_t - 0) == lam*1*x_{t-1} — identical to the old form; the same
    # consumer-side masking argument applies (dat via dt=0, ddelta via
    # sig=0, dbp via dt*u=0).
    xminus = dla_mode == "xminus"
    if xminus:
        lam_scr[...] = cm[:, :, :, None] * gy[:, :, None, :]    # CgY
    else:
        # xprev (the round-4 form) and dbu both stage CgY in tmp_scr and
        # keep lam_scr write-only in the adjoint loop.
        tmp_scr[...] = cm[:, :, :, None] * gy[:, :, None, :]

    def bwd_body(i, p):
        # Iterate opposite to the forward scan direction.
        t = i if reverse else (l_chunk - 1 - i)
        src = lam_scr if xminus else tmp_scr
        lam = src[:, t] + p
        lam_scr[:, t] = lam
        return a_scr[:, t] * lam

    lam_state[...] = jax.lax.fori_loop(
        0, l_chunk, bwd_body, lam_state[...], unroll=l_chunk)
    if with_state:
        # After this chunk's adjoint pass, lam_state = dL/d(state at chunk
        # entry); the sequentially-last grid step's value is dL/dx0.
        dx0_ref[...] = lam_state[...]

    lam = lam_scr[...]
    if xminus:
        dla = lam * (x_scr[...] - tmp_scr[...])              # grad wrt dt*A
    elif dla_mode == "dbu":
        # Concat removal WITHOUT the in-place CgY staging (the in-place
        # lam_scr read+write measured ~3.4% slower on the train step):
        # recompute dBu in the epilogue — (dt*u) is computed there for dbp
        # anyway, so the extra work is one bm broadcast-multiply + subtract,
        # traded against the xprev concat stack temporary.
        dla = lam * (x_scr[...]
                     - (dt * u)[:, :, None, :] * bm[:, :, :, None])
    else:
        xb0 = xb_ref[:, 0].astype(jnp.float32)[:, None]     # (b_t,1,N,d_b)
        if reverse:
            xprev = jnp.concatenate([x_scr[:, 1:], xb0], axis=1)
        else:
            xprev = jnp.concatenate([xb0, x_scr[:, : l_chunk - 1]], axis=1)
        dla = lam * a_scr[...] * xprev
    dat_ref[...] += jnp.sum(dt[:, :, None, :] * dla, axis=(0, 1))
    gdtu = jnp.sum(lam * bm[:, :, :, None], axis=2)          # (b_t, L_c, d_b)
    ddt = jnp.sum(dla * a_t[None, None], axis=2) + gdtu * u
    ddelta = ddt * (1.0 - jnp.exp(-dt)) if softplus else ddt
    ddelta_ref[...] = ddelta.astype(ddelta_ref.dtype)
    dbias_ref[...] += jnp.sum(ddelta, axis=(0, 1), keepdims=True)[0]
    du_ref[...] = (gy * dsk + gdtu * dt).astype(du_ref.dtype)
    dbp_ref[...] = jnp.sum(
        lam * (dt * u)[:, :, None, :],
        axis=3)[None].astype(dbp_ref.dtype)                  # (b_t, L_c, N)
    dcp_ref[...] = jnp.sum(
        x_scr[...] * gy[:, :, None, :], axis=3)[None].astype(dcp_ref.dtype)
    # (dbp is already masked through dt=0; dcp through gy=0.)


def _bwd_kernel_fused(
    # inputs
    u_ref, dt_ref, at_ref, b_ref, c_ref, d_ref, z_ref,
    g_ref, xb_ref,
    # outputs
    du_ref, ddelta_ref, dz_ref, dat_ref, dd_ref, dbias_ref, dbp_ref, dcp_ref,
    # scratch
    lam_state, xprev_scr, um_scr, dt_scr, gy_scr, bm_scr, cm_scr,
    *, l_chunk: int, reverse: bool, seq_len: int, softplus: bool = True,
):
    """Fused-loop adjoint (v2 of _bwd_kernel — same math, see its notes and
    the derivation anchored to selective_scan_interface.py:219-246).

    Every (L_c, N, d_b)-sized quantity except the pre-step states is formed
    PER STEP inside the two serial loops: the decay is recomputed by exp2
    in both loops (off the carry path, overlapped by the unrolled chains;
    costs 2x the exp at 24% exp-port utilization), dBu / C·gy / dla and all
    their grad reductions happen per step, and dA/dbias accumulate in
    loop-carried values. That shrinks scoped VMEM from four declared chunk
    buffers + chunk-wide stack temporaries (~8.4 buffer-equivalents,
    capping the d-tile at 256) to ONE chunk buffer + per-step temporaries —
    letting the backward run at the forward's d-tile with 3x fewer grid
    passes and no redundant decay/lambda VMEM round-trips.

    MEASURED SLOWER on v5e and therefore OFF by default
    (AUM_SCAN_BWD_FUSED=1 opts in): B=12 base train step 240.4 ms at
    d-tile 768 / 422.2 ms at d-tile 256, vs 208.1 ms for _bwd_kernel at
    d-tile 256. The five per-step cross-N reductions (dat/gdtu/ddt/dbp/dcp)
    cost more than the three eliminated chunk buffers buy — chunk-wide
    vectorized reductions win on the VPU. Kept as the measured negative
    result and for shapes where VMEM, not issue rate, binds.
    """
    bi = pl.program_id(1)
    l = pl.program_id(2)

    @pl.when(jnp.logical_and(bi == 0, l == 0))
    def _():
        dat_ref[...] = jnp.zeros_like(dat_ref)
        dd_ref[...] = jnp.zeros_like(dd_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    @pl.when(l == 0)
    def _():
        lam_state[...] = jnp.zeros_like(lam_state)

    n_lp = pl.num_programs(2)
    logical_chunk = l if reverse else (n_lp - 1 - l)
    m = _pos_mask(logical_chunk, l_chunk, seq_len, u_ref.shape)

    # Masked per-position loads -> scratch (overhang bits may be NaN/inf;
    # the loops index these dynamically, which Mosaic allows on refs only).
    um_scr[...] = _mask0(m, u_ref[...].astype(jnp.float32))
    a_t = at_ref[...].astype(jnp.float32)            # (N, d_b)
    dt_scr[...] = _mask0(m, dt_ref[...].astype(jnp.float32))
    bm_scr[...] = _mask0(m, b_ref[...].astype(jnp.float32))
    cm_scr[...] = _mask0(m, c_ref[...].astype(jnp.float32))
    dsk0 = d_ref[...].astype(jnp.float32)            # (1, d_b)

    _LOG2E = 1.4426950408889634

    # --- Forward recompute: store PRE-step states, emit y per step. --------
    def fwd_body(i, x):
        t = (l_chunk - 1 - i) if reverse else i
        xprev_scr[:, t] = x
        dt_t = dt_scr[:, t]
        a_step = jnp.exp2((dt_t * _LOG2E)[:, None, :] * a_t[None])
        x = (a_step * x
             + (dt_t * um_scr[:, t])[:, None, :] * bm_scr[:, t][:, :, None])
        gy_scr[:, t] = jnp.sum(x * cm_scr[:, t][:, :, None], axis=1)
        return x

    x0 = xb_ref[:, 0].astype(jnp.float32)            # (b_t, N, d_b)
    jax.lax.fori_loop(0, l_chunk, fwd_body, x0, unroll=l_chunk)

    # --- Gating grads (vector phase; gy_scr holds y, then gy). -------------
    zf = _mask0(m, z_ref[...].astype(jnp.float32))
    g = _mask0(m, g_ref[...].astype(jnp.float32))
    ycore = gy_scr[...] + dsk0[None] * um_scr[...]
    sigz = _sigmoid(zf)
    silz = zf * sigz
    dz = g * ycore * (sigz * (1.0 + zf * (1.0 - sigz)))
    dz_ref[...] = dz.astype(dz_ref.dtype)
    gy = _mask0(m, g * silz)
    dd_ref[...] += jnp.sum(gy * um_scr[...], axis=(0, 1), keepdims=True)[0]
    gy_scr[...] = gy

    # --- Adjoint scan with per-step grad emission. --------------------------
    # Overhang correctness matches _bwd_kernel's argument: lam there is pure
    # propagation, and every per-position grad is killed by a masked factor
    # (dat/du via dt=0, ddelta via sig=1-exp(-dt)=0, dbp via dt·u=0, dcp
    # via gy=0).
    def bwd_body(i, carry):
        p, dat_acc, db_acc = carry
        t = i if reverse else (l_chunk - 1 - i)
        dt_t = dt_scr[:, t]                          # (b_t, d_b)
        a_step = jnp.exp2((dt_t * _LOG2E)[:, None, :] * a_t[None])
        xprev = xprev_scr[:, t]                      # (b_t, N, d_b)
        gy_t = gy_scr[:, t]
        lam = cm_scr[:, t][:, :, None] * gy_t[:, None, :] + p
        dla = lam * a_step * xprev
        dat_acc = dat_acc + jnp.sum(dt_t[:, None, :] * dla, axis=0)
        gdtu = jnp.sum(lam * bm_scr[:, t][:, :, None], axis=1)
        ddt = jnp.sum(dla * a_t[None], axis=1) + gdtu * um_scr[:, t]
        ddelta_t = (ddt * (1.0 - jnp.exp(-dt_t))) if softplus else ddt
        ddelta_ref[:, t] = ddelta_t.astype(ddelta_ref.dtype)
        db_acc = db_acc + jnp.sum(ddelta_t, axis=0, keepdims=True)
        du_ref[:, t] = (gy_t * dsk0 + gdtu * dt_t).astype(du_ref.dtype)
        dtu_t = dt_t * um_scr[:, t]
        # .astype: the partial refs are bf16 under AUM_SCAN_BWD_BF16_PARTIALS
        # (out_shapes pdt in _bwd_pallas) — an un-cast fp32 store would fail
        # to lower.
        dbp_ref[0, :, t] = jnp.sum(
            lam * dtu_t[:, None, :], axis=2).astype(dbp_ref.dtype)
        xt = a_step * xprev + dtu_t[:, None, :] * bm_scr[:, t][:, :, None]
        dcp_ref[0, :, t] = jnp.sum(
            xt * gy_t[:, None, :], axis=2).astype(dcp_ref.dtype)
        return (a_step * lam, dat_acc, db_acc)

    init = (lam_state[...],
            jnp.zeros(dat_ref.shape, jnp.float32),
            jnp.zeros(dbias_ref.shape, jnp.float32))
    lam_f, dat_acc, db_acc = jax.lax.fori_loop(0, l_chunk, bwd_body, init,
                                               unroll=l_chunk)
    lam_state[...] = lam_f
    dat_ref[...] += dat_acc
    dbias_ref[...] += db_acc


def _bwd_pallas(u, dt, a_t, bm, cm, dsk, z, g, xb, gfin=None, *,
                reverse, d_block, l_chunk, interpret, b_tile=None,
                fused=True, softplus=True, dla_mode="xprev"):
    with_state = gfin is not None
    if with_state:
        fused = False  # state-carrying path supports the v1 kernel only
    bsz, seq_len, d = u.shape
    n_pad = a_t.shape[0]
    # d_block arg is the *target* (VMEM-budget-capped by the caller); pick
    # the realized tile from the local (per-shard) channel extent.
    bd = _largest_divisor_leq(d, d_block, 128)
    d_block = d if d % 128 != 0 else bd
    n_d = d // d_block
    n_l = -(-seq_len // l_chunk)  # cdiv
    if b_tile is None:
        # Calibrated cost model: buffer-equivalents of stack temporaries +
        # scratch per chain (see scan_bwd) — ~8.4 for the v1 kernel, ~3 for
        # the fused one (one declared chunk buffer, per-step temporaries).
        # Earlier optimistic models compiled to 23.3M / 17.6M scoped-vmem
        # and were rejected by the 16MB limit, so leave margin.
        b_tile = _pick_b_tile(bsz, l_chunk, d_block, n_pad,
                              n_bufs=4 if fused else 9,
                              budget_bytes=12 * 2 ** 20)
    n_b = bsz // b_tile

    # Backward visits chunks in reverse processing order; data index maps go
    # through processing order p = n_l-1-l, logical chunk c = p (forward scan)
    # or n_l-1-p (reverse scan).
    def cmap(li):
        p = n_l - 1 - li
        return (n_l - 1 - p) if reverse else p

    seq_spec = pl.BlockSpec(
        (b_tile, l_chunk, d_block), lambda di, bi, li: (bi, cmap(li), di),
        memory_space=pltpu.VMEM)
    bc_spec = pl.BlockSpec(
        (b_tile, l_chunk, n_pad), lambda di, bi, li: (bi, cmap(li), 0),
        memory_space=pltpu.VMEM)
    at_spec = pl.BlockSpec(
        (n_pad, d_block), lambda di, bi, li: (0, di), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec(
        (1, d_block), lambda di, bi, li: (0, di), memory_space=pltpu.VMEM)
    xb_spec = pl.BlockSpec(
        (b_tile, 1, n_pad, d_block),
        lambda di, bi, li: (bi, n_l - 1 - li, 0, di),
        memory_space=pltpu.VMEM)
    part_spec = pl.BlockSpec(
        (1, b_tile, l_chunk, n_pad), lambda di, bi, li: (di, bi, cmap(li), 0),
        memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _bwd_kernel_fused if fused else _bwd_kernel,
        l_chunk=l_chunk, reverse=reverse, seq_len=seq_len, softplus=softplus,
        **({"with_state": True} if with_state else {}),
        **({} if fused else {"dla_mode": dla_mode}))

    state_spec = pl.BlockSpec(
        (b_tile, n_pad, d_block), lambda di, bi, li: (bi, 0, di),
        memory_space=pltpu.VMEM)

    # bf16 dB/dC partials (VERDICT r4 #2b, AUM_SCAN_BWD_BF16_PARTIALS=1):
    # halves the HBM write+readback of the two (n_d, B, L, N) partial
    # streams; the cross-tile reduction outside stays fp32 (_get_bwd_op
    # upcasts before summing). Env is read at trace time (the op is
    # lru_cached per process, like the other A/B knobs).
    pdt = (jnp.bfloat16 if _env_int("AUM_SCAN_BWD_BF16_PARTIALS", 0)
           else jnp.float32)
    out_shapes = [
        jax.ShapeDtypeStruct((bsz, seq_len, d), u.dtype),      # du
        jax.ShapeDtypeStruct((bsz, seq_len, d), dt.dtype),     # ddelta
        jax.ShapeDtypeStruct((bsz, seq_len, d), z.dtype),      # dz
        jax.ShapeDtypeStruct((n_pad, d), jnp.float32),         # dA_T
        jax.ShapeDtypeStruct((1, d), jnp.float32),             # dD
        jax.ShapeDtypeStruct((1, d), jnp.float32),             # dbias
        jax.ShapeDtypeStruct((n_d, bsz, seq_len, n_pad), pdt),
        jax.ShapeDtypeStruct((n_d, bsz, seq_len, n_pad), pdt),
    ]
    out_specs = [seq_spec, seq_spec, seq_spec, at_spec, vec_spec, vec_spec,
                 part_spec, part_spec]
    in_specs = [seq_spec, seq_spec, at_spec, bc_spec, bc_spec, vec_spec,
                seq_spec, seq_spec, xb_spec]
    args = (u, dt, a_t, bm, cm, dsk, z, g, xb)
    if with_state:
        in_specs.append(state_spec)
        args = args + (gfin,)
        out_shapes.append(
            jax.ShapeDtypeStruct((bsz, n_pad, d), jnp.float32))  # dx0
        out_specs.append(state_spec)

    cost = pl.CostEstimate(
        flops=30 * bsz * seq_len * d * n_pad,
        bytes_accessed=8 * bsz * seq_len * d * 4,
        transcendentals=2 * bsz * seq_len * d * n_pad,
    )

    return pl.pallas_call(
        kernel,
        grid=(n_d, n_b, n_l),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=(
            [pltpu.VMEM((b_tile, n_pad, d_block), jnp.float32),  # lam carry
             pltpu.VMEM((b_tile, l_chunk, n_pad, d_block),
                        jnp.float32)]                            # xprev
            + [pltpu.VMEM((b_tile, l_chunk, d_block),
                          jnp.float32)] * 3                      # um/dt/gy
            + [pltpu.VMEM((b_tile, l_chunk, n_pad),
                          jnp.float32)] * 2                      # bm/cm
            if fused else
            [pltpu.VMEM((b_tile, n_pad, d_block), jnp.float32),  # lam carry
             pltpu.VMEM((b_tile, l_chunk, n_pad, d_block),
                        jnp.float32),                            # a
             pltpu.VMEM((b_tile, l_chunk, n_pad, d_block),
                        jnp.float32),                            # x
             pltpu.VMEM((b_tile, l_chunk, n_pad, d_block),
                        jnp.float32),                            # lam
             pltpu.VMEM((b_tile, l_chunk, n_pad, d_block),
                        jnp.float32)]                            # dBu/CgY
        ),
        cost_estimate=cost,
        interpret=interpret,
        **_scoped_vmem_kw(interpret),
    )(*args)


# ---------------------------------------------------------------------------
# Fused dual-direction backward kernel
# ---------------------------------------------------------------------------
#
# The backward analogue of _fwd_kernel_dual (the BiMambaInnerFn.backward of
# selective_scan_interface.py:519-603 runs ONE fused backward for both
# scans): in one grid step, direction f runs its adjoint on its chunk
# p = n_l-1-li while direction r runs its own on the same processing index
# (logical chunk li), interleaving the two recompute chains and the two
# adjoint chains in the serial loops so each hides the other's latency, and
# halving the number of backward grid passes. Costs ~2x the scoped VMEM of
# the single-direction backward, so it runs at a smaller d-tile (see
# _dual_bwd_target).


def _bwd_kernel_dual(
    # inputs (f then r), grads, boundary states
    uf_ref, df_ref, atf_ref, bf_ref, cf_ref, dskf_ref, zf_ref,
    ur_ref, dr_ref, atr_ref, br_ref, cr_ref, dskr_ref, zr_ref,
    gf_ref, gr_ref, xbf_ref, xbr_ref,
    # outputs (f then r)
    duf_ref, ddf_ref, dzf_ref, datf_ref, ddskf_ref, dbiasf_ref,
    dbpf_ref, dcpf_ref,
    dur_ref, ddr_ref, dzr_ref, datr_ref, ddskr_ref, dbiasr_ref,
    dbpr_ref, dcpr_ref,
    # scratch
    lamf_state, lamr_state, af_scr, ar_scr, xf_scr, xr_scr,
    lamf_scr, lamr_scr, tmpf_scr, tmpr_scr,
    *, l_chunk: int, seq_len: int, softplus: bool = True,
):
    # dt arrives pre-activated in the delta slot; the softplus chain rule is
    # applied in-kernel from dt via sigmoid = 1 - exp(-dt) (see _bwd_kernel).
    bi = pl.program_id(1)
    l = pl.program_id(2)
    n_lp = pl.num_programs(2)

    @pl.when(jnp.logical_and(bi == 0, l == 0))
    def _():
        for ref in (datf_ref, ddskf_ref, dbiasf_ref,
                    datr_ref, ddskr_ref, dbiasr_ref):
            ref[...] = jnp.zeros_like(ref)

    @pl.when(l == 0)
    def _():
        lamf_state[...] = jnp.zeros_like(lamf_state)
        lamr_state[...] = jnp.zeros_like(lamr_state)

    # Direction f (forward scan) is revisited on logical chunk n_l-1-l,
    # direction r (reverse scan) on logical chunk l — both are their own
    # reverse *processing* order (see _bwd_pallas on the masking rationale).
    mf = _pos_mask(n_lp - 1 - l, l_chunk, seq_len, uf_ref.shape)
    mr = _pos_mask(l, l_chunk, seq_len, ur_ref.shape)

    def load(m, u_ref, dt_ref, b_ref, c_ref, z_ref, g_ref, d_ref):
        u = _mask0(m, u_ref[...].astype(jnp.float32))
        bm = _mask0(m, b_ref[...].astype(jnp.float32))
        cm = _mask0(m, c_ref[...].astype(jnp.float32))
        zf = _mask0(m, z_ref[...].astype(jnp.float32))
        g = _mask0(m, g_ref[...].astype(jnp.float32))
        dsk = d_ref[...].astype(jnp.float32)[None]
        dt = _mask0(m, dt_ref[...].astype(jnp.float32))
        return u, bm, cm, zf, g, dsk, dt

    uf, bmf, cmf, zff, gf, dskf, dtf = load(
        mf, uf_ref, df_ref, bf_ref, cf_ref, zf_ref, gf_ref, dskf_ref)
    ur, bmr, cmr, zfr, gr, dskr, dtr = load(
        mr, ur_ref, dr_ref, br_ref, cr_ref, zr_ref, gr_ref, dskr_ref)
    atf = atf_ref[...].astype(jnp.float32)
    atr = atr_ref[...].astype(jnp.float32)

    # --- Recompute in-chunk states from the saved boundary states. ----------
    _LOG2E = 1.4426950408889634
    af_scr[...] = jnp.exp2((dtf * _LOG2E)[:, :, None, :] * atf[None, None])
    ar_scr[...] = jnp.exp2((dtr * _LOG2E)[:, :, None, :] * atr[None, None])
    tmpf_scr[...] = (dtf * uf)[:, :, None, :] * bmf[:, :, :, None]
    tmpr_scr[...] = (dtr * ur)[:, :, None, :] * bmr[:, :, :, None]

    def fwd_body(i, carry):
        xf, xr = carry
        tr = l_chunk - 1 - i
        xf = af_scr[:, i] * xf + tmpf_scr[:, i]
        xr = ar_scr[:, tr] * xr + tmpr_scr[:, tr]
        xf_scr[:, i] = xf
        xr_scr[:, tr] = xr
        return (xf, xr)

    jax.lax.fori_loop(
        0, l_chunk, fwd_body,
        (xbf_ref[:, 0].astype(jnp.float32), xbr_ref[:, 0].astype(jnp.float32)),
        unroll=l_chunk)

    # --- Recompute outputs and gating grads (chunk-wide, per direction). ----
    def gate_grads(m, x_scr, cm, dsk, u, zf, g, dz_ref, dd_ref):
        y = jnp.sum(x_scr[...] * cm[:, :, :, None], axis=2)
        ycore = y + dsk * u
        sigz = _sigmoid(zf)
        gy = _mask0(m, g * (zf * sigz))
        dz = g * ycore * (sigz * (1.0 + zf * (1.0 - sigz)))
        dz_ref[...] = dz.astype(dz_ref.dtype)
        dd_ref[...] += jnp.sum(gy * u, axis=(0, 1), keepdims=True)[0]
        return gy

    gyf = gate_grads(mf, xf_scr, cmf, dskf, uf, zff, gf, dzf_ref, ddskf_ref)
    gyr = gate_grads(mr, xr_scr, cmr, dskr, ur, zfr, gr, dzr_ref, ddskr_ref)

    # --- Interleaved adjoint scans. ------------------------------------------
    tmpf_scr[...] = cmf[:, :, :, None] * gyf[:, :, None, :]
    tmpr_scr[...] = cmr[:, :, :, None] * gyr[:, :, None, :]

    def bwd_body(i, carry):
        pf, pr = carry
        tf = l_chunk - 1 - i
        lamf = tmpf_scr[:, tf] + pf
        lamr = tmpr_scr[:, i] + pr
        lamf_scr[:, tf] = lamf
        lamr_scr[:, i] = lamr
        return (af_scr[:, tf] * lamf, ar_scr[:, i] * lamr)

    lamf_state[...], lamr_state[...] = jax.lax.fori_loop(
        0, l_chunk, bwd_body, (lamf_state[...], lamr_state[...]),
        unroll=l_chunk)

    # --- Parameter/input grads (chunk-wide, per direction). -----------------
    def param_grads(x_scr, lam_scr, a_scr, xb_ref, reverse, at, dt, u,
                    bm, gy, dsk, dat_ref, ddelta_ref, dbias_ref, du_ref,
                    dbp_ref, dcp_ref):
        xb0 = xb_ref[:, 0].astype(jnp.float32)[:, None]
        if reverse:
            xprev = jnp.concatenate([x_scr[:, 1:], xb0], axis=1)
        else:
            xprev = jnp.concatenate([xb0, x_scr[:, : l_chunk - 1]], axis=1)
        lam = lam_scr[...]
        dla = lam * a_scr[...] * xprev
        dat_ref[...] += jnp.sum(dt[:, :, None, :] * dla, axis=(0, 1))
        gdtu = jnp.sum(lam * bm[:, :, :, None], axis=2)
        ddt = jnp.sum(dla * at[None, None], axis=2) + gdtu * u
        ddelta = ddt * (1.0 - jnp.exp(-dt)) if softplus else ddt
        ddelta_ref[...] = ddelta.astype(ddelta_ref.dtype)
        dbias_ref[...] += jnp.sum(ddelta, axis=(0, 1), keepdims=True)[0]
        du_ref[...] = (gy * dsk + gdtu * dt).astype(du_ref.dtype)
        dbp_ref[...] = jnp.sum(lam * (dt * u)[:, :, None, :], axis=3)[None]
        dcp_ref[...] = jnp.sum(x_scr[...] * gy[:, :, None, :], axis=3)[None]

    param_grads(xf_scr, lamf_scr, af_scr, xbf_ref, False, atf, dtf,
                uf, bmf, gyf, dskf, datf_ref, ddf_ref, dbiasf_ref, duf_ref,
                dbpf_ref, dcpf_ref)
    param_grads(xr_scr, lamr_scr, ar_scr, xbr_ref, True, atr, dtr,
                ur, bmr, gyr, dskr, datr_ref, ddr_ref, dbiasr_ref, dur_ref,
                dbpr_ref, dcpr_ref)


def _bwd_pallas_dual(args_f, args_r, gf, gr, xbf, xbr, *,
                     d_block, l_chunk, interpret, b_tile=None,
                     softplus=True):
    """Fused backward for both directions. args_f/args_r as in
    _fwd_pallas_dual; returns the two directions' grad tuples
    (du, ddelta, dz, dat, dd, dbias, dbp, dcp) each."""
    u = args_f[0]
    bsz, seq_len, d = u.shape
    n_pad = args_f[2].shape[0]
    bd = _largest_divisor_leq(d, d_block, 128)
    d_block = d if d % 128 != 0 else bd
    n_d = d // d_block
    n_l = -(-seq_len // l_chunk)
    if b_tile is None:
        b_tile = 1
    n_b = bsz // b_tile

    # Both directions revisit their own processing order p = n_l-1-li;
    # direction f's logical chunk is p, direction r's is n_l-1-p = li.
    def spec_of(rev):
        def cmap(li):
            p = n_l - 1 - li
            return (n_l - 1 - p) if rev else p

        seq = pl.BlockSpec((b_tile, l_chunk, d_block),
                           lambda di, bi, li: (bi, cmap(li), di),
                           memory_space=pltpu.VMEM)
        bc = pl.BlockSpec((b_tile, l_chunk, n_pad),
                          lambda di, bi, li: (bi, cmap(li), 0),
                          memory_space=pltpu.VMEM)
        part = pl.BlockSpec((1, b_tile, l_chunk, n_pad),
                            lambda di, bi, li: (di, bi, cmap(li), 0),
                            memory_space=pltpu.VMEM)
        return seq, bc, part

    at_spec = pl.BlockSpec((n_pad, d_block), lambda di, bi, li: (0, di),
                           memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, d_block), lambda di, bi, li: (0, di),
                            memory_space=pltpu.VMEM)
    xb_spec = pl.BlockSpec((b_tile, 1, n_pad, d_block),
                           lambda di, bi, li: (bi, n_l - 1 - li, 0, di),
                           memory_space=pltpu.VMEM)
    seq_f, bc_f, part_f = spec_of(False)
    seq_r, bc_r, part_r = spec_of(True)

    kernel = functools.partial(_bwd_kernel_dual, l_chunk=l_chunk,
                               seq_len=seq_len, softplus=softplus)

    def outs_of(u_, dt_, z_):
        return [
            jax.ShapeDtypeStruct((bsz, seq_len, d), u_.dtype),
            jax.ShapeDtypeStruct((bsz, seq_len, d), dt_.dtype),
            jax.ShapeDtypeStruct((bsz, seq_len, d), z_.dtype),
            jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((n_d, bsz, seq_len, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_d, bsz, seq_len, n_pad), jnp.float32),
        ]

    out_shapes = (outs_of(args_f[0], args_f[1], args_f[6])
                  + outs_of(args_r[0], args_r[1], args_r[6]))
    out_specs = ([seq_f, seq_f, seq_f, at_spec, vec_spec, vec_spec,
                  part_f, part_f]
                 + [seq_r, seq_r, seq_r, at_spec, vec_spec, vec_spec,
                    part_r, part_r])

    cost = pl.CostEstimate(
        flops=60 * bsz * seq_len * d * n_pad,
        bytes_accessed=16 * bsz * seq_len * d * 4,
        transcendentals=4 * bsz * seq_len * d * n_pad,
    )

    outs = pl.pallas_call(
        kernel,
        grid=(n_d, n_b, n_l),
        in_specs=[seq_f, seq_f, at_spec, bc_f, bc_f, vec_spec, seq_f,
                  seq_r, seq_r, at_spec, bc_r, bc_r, vec_spec, seq_r,
                  seq_f, seq_r, xb_spec, xb_spec],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=(
            [pltpu.VMEM((b_tile, n_pad, d_block), jnp.float32)] * 2
            + [pltpu.VMEM((b_tile, l_chunk, n_pad, d_block), jnp.float32)] * 8
        ),
        cost_estimate=cost,
        interpret=interpret,
        **_scoped_vmem_kw(interpret),
    )(*args_f, *args_r, gf, gr, xbf, xbr)
    return outs[:8], outs[8:]


# ---------------------------------------------------------------------------
# Padding / layout wrapper + custom VJP
# ---------------------------------------------------------------------------


def _choose_l(l: int, target: int) -> tuple[int, int]:
    """(l_eff, l_chunk) minimizing overhang waste.

    The sequence itself is no longer padded (the last chunk's blocks overhang
    and are masked in-kernel), but every chunk still *processes* l_chunk
    positions, so the chunk size determines wasted scan work:
    a naive 128-chunk at L=513 computes ceil(513/128)*128 = 640 positions
    (25% waste, confirmed by device profiling); chunk 104 computes 520
    (1.4%). Scans 8-aligned effective lengths and picks the chunk with the
    least waste near the target.

    AUM_SCAN_LCHUNK_EXACT pins the chunk exactly (8-rounded), bypassing the
    waste-minimizing search — the only way to measure fewer-but-larger
    chunks, since the search always prefers minimal overhang (at L=513 it
    returns 104 for any target >= 104). Sweep knob; unset in production.
    """
    exact = _os.environ.get("AUM_SCAN_LCHUNK_EXACT")
    if exact:
        c = max(8, _round_up(int(exact), 8))
        return _round_up(l, c), c
    if l <= target:
        c = _round_up(l, 8)
        return c, c
    best = None
    for pad in range(_round_up(l, 8), _round_up(l, target) + 1, 8):
        c = _largest_divisor_leq(pad, target, 8)
        if c < 48:
            continue
        if best is None or (pad - l) < (best[0] - l):
            best = (pad, c)
        if pad - l < 8:
            break
    if best is None:
        # Fallback must keep the chunk 8-aligned (Mosaic requires the
        # second-minor block dim divisible by 8): round the target up to a
        # multiple of 8 and pad the processed length to a whole number of
        # chunks.
        c = max(8, _round_up(target, 8))
        best = (_round_up(l, c), c)
    return best


def _prep(u, delta, A, B, C, D, z, delta_bias, d_block_target, l_chunk_target,
          delta_softplus=True):
    """Pick the length chunking and pad only the (tiny) state dim.

    The sequence is NOT padded: the kernels' final chunk overhangs the array
    (Pallas masks overhang writes; overhang reads are neutralized in-kernel
    via the position mask). This removes five HBM-round-trip pad ops and an
    output slice per scan call.

    dt = softplus(delta + bias) is computed HERE, in XLA, instead of inside
    the kernels: the kernel streams dt in delta's place (identical bytes),
    and in the model the softplus fuses into the dt_proj matmul epilogue
    that produces delta — so two full softplus passes per grid step (one
    per direction) leave the kernels' VPU-bound issue stream for free. The
    backward recovers the delta/bias cotangents from dt alone via
    sigmoid(delta + bias) = 1 - exp(-dt) (see scan_bwd), so dt simply
    replaces delta in the residuals.

    The d-tile is NOT picked here: the ops carry GSPMD partitioning rules
    (d over 'model'), so the realized d_block must come from the per-shard
    channel extent — `_pick_d_block` inside the op. Only the *target* flows
    through. l_chunk is global-consistent (l is never sharded) and must
    match between the forward and backward, so it is picked here.
    """
    bsz, l, d = u.shape
    n = A.shape[1]

    d_block = d_block_target

    _, l_chunk = _choose_l(l, l_chunk_target)
    n_pad = max(8, _round_up(n, 8))

    if n_pad != n:
        B = jnp.pad(B, [(0, 0), (0, 0), (0, n_pad - n)])
        C = jnp.pad(C, [(0, 0), (0, 0), (0, n_pad - n)])
        A = jnp.pad(A, [(0, 0), (0, n_pad - n)], constant_values=-1.0)

    a_t = jnp.swapaxes(A.astype(jnp.float32), 0, 1)  # (N_pad, D)
    dsk = D.astype(jnp.float32)[None, :]
    if delta is None:
        # In-kernel dt_proj mode (dt_fold): the kernel computes dt itself;
        # only the non-dt operands need prep.
        return u, None, a_t, B, C, dsk, z, d_block, l_chunk, l, n
    dt32 = delta.astype(jnp.float32)
    if delta_bias is not None:
        dt32 = dt32 + delta_bias.astype(jnp.float32)[None, None, :]
    if delta_softplus:
        # Primitives-only stable softplus: jax.nn.softplus is custom_jvp/
        # jit-wrapped and its closed_call jaxpr trips the MLIR lowering
        # cache (KeyError) when this sits under an outer fori_loop next to
        # the inlined Pallas call. Autodiff never sees this expression (the
        # custom_vjp's backward applies the chain rule itself).
        dt32 = _softplus(dt32)
    dt = dt32.astype(delta.dtype)
    return u, dt, a_t, B, C, dsk, z, d_block, l_chunk, l, n


# ---------------------------------------------------------------------------
# GSPMD partitioning rules (multi-chip kernel path)
# ---------------------------------------------------------------------------
#
# The scan is embarrassingly parallel over batch and over channels (each
# (b, d) pair is an independent recurrence; A/D/bias are per-channel, B/C are
# per-(b, l)), so under a ('data','model') mesh the kernel runs on local
# shards with ZERO communication — except the backward's dB/dC, which reduce
# over channels and need one psum over the model axis. The rules below teach
# GSPMD exactly that, so the *production* Pallas path (not just the jnp
# oracle) shards like the reference's DDP'd CUDA op
# (selective_scan_interface.py:77 under accelerate/NCCL).
#
# Mechanics: each pallas-invoking op is wrapped in
# jax.experimental.custom_partitioning. The sharding policy is derived from
# u's (batch, length, channel) sharding: batch axes pass through, length is
# forced replicated (sequential scan), channel axes pass through to every
# d-extent operand. The per-shard lowering is the op itself — d_block /
# b_tile are re-picked from local shapes inside (_pick_d_block).

_ARG_FACTORS = {
    "seq": "b l d",      # (B, L, D) sequence tensors: u, delta, z, g, out
    "bc": "b l n",       # (B, L, N_pad) B/C projections
    "at": "n d",         # (N_pad, D) transposed A
    "vec": "o d",        # (1, D) D-skip / delta bias
    "xb": "b c n d",     # (B, n_chunks, N_pad, D) boundary states
    "state": "b n d",    # (B, N_pad, D) initial/final scan state
    "bc_sum": "b l n",   # output reduced over d  -> psum over model axes
    "at_sum": "n d",     # output reduced over b,l -> psum over data axes
    "vec_sum": "o d",    # output reduced over b,l -> psum over data axes
    "dtr": "b l r",      # (B, L, R_pad) dt-rank slice (in-kernel dt_proj)
    "wdt": "r d",        # (R_pad, D) dt_proj weight (d over model axes)
}


def _kind_spec(kind: str, b_ax, d_ax):
    from jax.sharding import PartitionSpec as P

    return {
        "seq": P(b_ax, None, d_ax),
        "bc": P(b_ax, None, None),
        "at": P(None, d_ax),
        "vec": P(None, d_ax),
        "xb": P(b_ax, None, None, d_ax),
        "state": P(b_ax, None, d_ax),
        "bc_sum": P(b_ax, None, None),
        "at_sum": P(None, d_ax),
        "vec_sum": P(None, d_ax),
        "dtr": P(b_ax, None, None),
        "wdt": P(None, d_ax),
    }[kind]


def _make_partitioned(fun, in_kinds, out_kinds):
    """Wrap `fun` (a pallas-op closure) with a custom_partitioning rule."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding

    rule = (", ".join(_ARG_FACTORS[k] for k in in_kinds) + " -> "
            + ", ".join(_ARG_FACTORS[k] for k in out_kinds))
    single_out = len(out_kinds) == 1

    def _axes(arg_shapes):
        # Policy source: u (arg 0, kind "seq"). Length stays replicated.
        spec = getattr(getattr(arg_shapes[0], "sharding", None), "spec", None)
        b_ax = spec[0] if spec is not None and len(spec) > 0 else None
        d_ax = spec[2] if spec is not None and len(spec) > 2 else None
        return b_ax, d_ax

    def infer(mesh, arg_shapes, result_shape):
        b_ax, d_ax = _axes(arg_shapes)
        outs = tuple(NamedSharding(mesh, _kind_spec(k, b_ax, d_ax))
                     for k in out_kinds)
        return outs[0] if single_out else outs

    def partition(mesh, arg_shapes, result_shape):
        b_ax, d_ax = _axes(arg_shapes)
        arg_sh = tuple(NamedSharding(mesh, _kind_spec(k, b_ax, d_ax))
                       for k in in_kinds)
        res_sh = tuple(NamedSharding(mesh, _kind_spec(k, b_ax, d_ax))
                       for k in out_kinds)
        def flat(ax):
            if ax is None:
                return ()
            return tuple(ax) if isinstance(ax, tuple) else (ax,)

        # Cross-shard reductions: dB/dC reduce over channels (psum over the
        # model axes); dA/dD/dbias reduce over batch (psum over data axes).
        psum_of = {"bc_sum": flat(d_ax), "at_sum": flat(b_ax),
                   "vec_sum": flat(b_ax)}

        def lower_fn(*args):
            outs = fun(*args)
            if single_out:
                outs = (outs,)
            outs = tuple(
                jax.lax.psum(o, psum_of[k]) if psum_of.get(k) else o
                for o, k in zip(outs, out_kinds))
            return outs[0] if single_out else outs

        return mesh, lower_fn, (res_sh[0] if single_out else res_sh), arg_sh

    p = custom_partitioning(fun)
    p.def_partition(partition=partition, infer_sharding_from_operands=infer,
                    sharding_rule=rule)
    return p


def _partition_enabled() -> bool:
    return _os.environ.get("AUM_SCAN_PARTITION", "1") != "0"


_FWD_KINDS = ["seq", "seq", "at", "bc", "bc", "vec", "seq"]


@functools.lru_cache(maxsize=None)
def _get_fwd_op(reverse: bool, save_states: bool, d_block_target: int,
                l_chunk: int, interpret: bool, b_tile,
                inline_decay: bool = True, with_state: bool = False):
    if with_state:
        def fun(u, dt, a_t, bm, cm, dsk, z, x0):
            out, xb, xfin = _fwd_pallas(
                u, dt, a_t, bm, cm, dsk, z, x0, reverse=reverse,
                save_states=save_states, d_block=d_block_target,
                l_chunk=l_chunk, interpret=interpret, b_tile=b_tile,
                inline_decay=inline_decay)
            return (out, xb, xfin) if save_states else (out, xfin)

        if not _partition_enabled():
            return fun
        return _make_partitioned(
            fun, _FWD_KINDS + ["state"],
            (["seq", "xb", "state"] if save_states else ["seq", "state"]))

    def fun(u, dt, a_t, bm, cm, dsk, z):
        out, xb = _fwd_pallas(
            u, dt, a_t, bm, cm, dsk, z, reverse=reverse,
            save_states=save_states, d_block=d_block_target, l_chunk=l_chunk,
            interpret=interpret, b_tile=b_tile, inline_decay=inline_decay)
        return (out, xb) if save_states else out

    if not _partition_enabled():
        return fun
    return _make_partitioned(
        fun, _FWD_KINDS, ["seq", "xb"] if save_states else ["seq"])


def _bwd_dla_mode() -> str:
    """A/B env switch for the adjoint's dla formulation (ROOFLINE.md
    "Backward", VERDICT r4 #2c). Default: the xprev concat form — the
    interleaved on-chip A/B measured it FASTEST (148.0/148.9 ms B=12 train
    step vs 153.1/153.4 for the in-place-CgY x-minus-dBu pass-merge, ~3.4%:
    removing two chunk traversals lost to whatever scheduling freedom the
    in-place lam_scr read+write costs Mosaic). AUM_SCAN_BWD_XMINUS=1 /
    AUM_SCAN_BWD_DBU=1 select the measured-negative variants (all three are
    oracle-exact; pinned by
    tests/test_selective_scan.py::test_bwd_dla_variant_grads_match_default)."""
    if _env_int("AUM_SCAN_BWD_XMINUS", 0):
        return "xminus"
    if _env_int("AUM_SCAN_BWD_DBU", 0):
        return "dbu"
    return "xprev"


@functools.lru_cache(maxsize=None)
def _get_bwd_op(reverse: bool, bwd_target: int, l_chunk: int,
                interpret: bool, fused: bool = True, softplus: bool = True,
                with_state: bool = False, dla_mode: str = "xprev"):
    if with_state:
        def fun(u, dt, a_t, bm, cm, dsk, z, g, xb, gfin):
            du, ddelta, dz, dat, dd, dbias, dbp, dcp, dx0 = _bwd_pallas(
                u, dt, a_t, bm, cm, dsk, z, g, xb, gfin, reverse=reverse,
                d_block=bwd_target, l_chunk=l_chunk, interpret=interpret,
                fused=False, softplus=softplus, dla_mode=dla_mode)
            return (du, ddelta, dz, dat, dd, dbias,
                    jnp.sum(dbp.astype(jnp.float32), axis=0),
                    jnp.sum(dcp.astype(jnp.float32), axis=0), dx0)

        if not _partition_enabled():
            return fun
        return _make_partitioned(
            fun, _FWD_KINDS + ["seq", "xb", "state"],
            ["seq", "seq", "seq", "at_sum", "vec_sum", "vec_sum",
             "bc_sum", "bc_sum", "state"])

    def fun(u, dt, a_t, bm, cm, dsk, z, g, xb):
        du, ddelta, dz, dat, dd, dbias, dbp, dcp = _bwd_pallas(
            u, dt, a_t, bm, cm, dsk, z, g, xb, reverse=reverse,
            d_block=bwd_target, l_chunk=l_chunk, interpret=interpret,
            fused=fused, softplus=softplus, dla_mode=dla_mode)
        # Reduce the per-d-tile dB/dC partials here so the op's outputs are
        # global shapes (the remaining cross-shard d-reduction is the psum
        # in the partitioning rule).
        return (du, ddelta, dz, dat, dd, dbias,
                jnp.sum(dbp.astype(jnp.float32), axis=0),
                jnp.sum(dcp.astype(jnp.float32), axis=0))

    if not _partition_enabled():
        return fun
    return _make_partitioned(
        fun, _FWD_KINDS + ["seq", "xb"],
        ["seq", "seq", "seq", "at_sum", "vec_sum", "vec_sum",
         "bc_sum", "bc_sum"])


@functools.lru_cache(maxsize=None)
def _get_dual_bwd_op(bwd_target: int, l_chunk: int, interpret: bool):
    def fun(*args):  # 7 f-args, 7 r-args, gf, gr, xbf, xbr
        args_f, args_r = args[:7], args[7:14]
        gf, gr, xbf, xbr = args[14:]
        of, o_r = _bwd_pallas_dual(
            args_f, args_r, gf, gr, xbf, xbr, d_block=bwd_target,
            l_chunk=l_chunk, interpret=interpret)

        def reduce_parts(o8):
            du, ddelta, dz, dat, dd, dbias, dbp, dcp = o8
            return (du, ddelta, dz, dat, dd, dbias,
                    jnp.sum(dbp, axis=0), jnp.sum(dcp, axis=0))

        return reduce_parts(of) + reduce_parts(o_r)

    if not _partition_enabled():
        return fun
    out_kinds = ["seq", "seq", "seq", "at_sum", "vec_sum", "vec_sum",
                 "bc_sum", "bc_sum"] * 2
    return _make_partitioned(
        fun, _FWD_KINDS * 2 + ["seq", "seq", "xb", "xb"], out_kinds)


@functools.lru_cache(maxsize=None)
def _get_dual_fwd_op(save_states: bool, d_block_target: int, l_chunk: int,
                     interpret: bool, fuse_y: bool = True,
                     inline_decay: bool = False, direct: bool = False):
    def fun(*args14):
        outs = _fwd_pallas_dual(
            args14[:7], args14[7:], save_states=save_states,
            d_block=d_block_target, l_chunk=l_chunk, interpret=interpret,
            fuse_y=fuse_y, inline_decay=inline_decay, direct=direct)
        outf, outr, xbf, xbr = outs
        return (outf, outr, xbf, xbr) if save_states else (outf, outr)

    if not _partition_enabled():
        return fun
    return _make_partitioned(
        fun, _FWD_KINDS * 2,
        ["seq", "seq", "xb", "xb"] if save_states else ["seq", "seq"])


_FDT_KINDS = ["seq", "dtr", "at", "bc", "bc", "vec", "seq"]


@functools.lru_cache(maxsize=None)
def _get_dual_fdt_op(d_block_target: int, l_chunk: int, interpret: bool):
    """Dual forward with in-kernel dt_proj (eval path; no state saving)."""

    def fun(*args18):  # 7 f-args, 7 r-args, wdt_f, bias_f, wdt_r, bias_r
        outf, outr, _, _ = _fwd_pallas_dual(
            args18[:7], args18[7:14], save_states=False,
            d_block=d_block_target, l_chunk=l_chunk, interpret=interpret,
            fuse_y=True, inline_decay=True, dt_fold=args18[14:])
        return outf, outr

    if not _partition_enabled():
        return fun
    return _make_partitioned(
        fun, _FDT_KINDS * 2 + ["wdt", "vec", "wdt", "vec"], ["seq", "seq"])


def _train_l_target(l_chunk_target: int) -> int:
    """Chunk target for the differentiated (training) forward.

    The training path may chunk differently from inference: the custom_vjp
    primal (eval) and fwd rule (train) are separate programs and the
    backward reads its chunk size from the residuals, so the two stay
    self-consistent. A smaller train chunk buys a much wider backward
    d-tile (l=40 -> 640 vs l=104 -> 256, via the ~8.4-buffer-equivalent
    VMEM budget), but MEASURED NEUTRAL on v5e: back-to-back B=12 base
    train steps put chunk-40 and chunk-104 long-chain times within 0.1%
    (an initial -5% reading was dispatch noise in the short chain — the
    wider backward tile and the worse forward chunking cancel). Default is
    therefore the shared target; AUM_SCAN_LCHUNK_TRAIN opts in to a
    train-specific chunk for experiments.
    """
    return _env_int("AUM_SCAN_LCHUNK_TRAIN", l_chunk_target)


@functools.cache
def _make_scan(reverse: bool, d_block_target: int, l_chunk_target: int,
               interpret: bool, b_tile, softplus: bool = True):
    """Build a custom-VJP selective scan closed over static config."""

    @jax.custom_vjp
    def scan(u, delta, A, B, C, D, z, delta_bias):
        up, dtp, a_t, bp, cp, dsk, zp, dbt, l_chunk, l, _ = _prep(
            u, delta, A, B, C, D, z, delta_bias,
            d_block_target, l_chunk_target, softplus)
        inline = _env_int("AUM_SCAN_INLINE_DECAY", 1) != 0
        op = _get_fwd_op(reverse, False, dbt, l_chunk, interpret, b_tile,
                         inline)
        return op(up, dtp, a_t, bp, cp, dsk, zp)

    def scan_fwd(u, delta, A, B, C, D, z, delta_bias):
        up, dtp, a_t, bp, cp, dsk, zp, dbt, l_chunk, l, _ = _prep(
            u, delta, A, B, C, D, z, delta_bias,
            d_block_target, _train_l_target(l_chunk_target), softplus)
        inline = _env_int("AUM_SCAN_INLINE_DECAY", 1) != 0
        op = _get_fwd_op(reverse, True, dbt, l_chunk, interpret, b_tile,
                         inline)
        out, xb = op(up, dtp, a_t, bp, cp, dsk, zp)
        res = (up, dtp, a_t, bp, cp, dsk, zp, xb, dbt, l_chunk, l,
               A.shape[1], delta_bias is not None)
        return out, res

    def scan_bwd(res, gout):
        (up, dtp, a_t, bp, cp, dsk, zp, xb, dbt, l_chunk, l, n,
         has_bias) = res
        # The backward holds 4 (l_chunk, N, d_b) fp32 scratch buffers PLUS
        # roughly as much again in Mosaic stack temporaries (xprev concat,
        # lam*a products, masked loads): measured scoped-vmem is ~8.4 buffer
        # equivalents of l_chunk*n_pad*d_block*4 bytes (17.61M at d_block=256,
        # l_chunk=128, N=16 — over the 16M limit). Pick the largest d-tile
        # target whose calibrated estimate stays under 15.5M; the realized
        # tile comes from the local shard shape inside _bwd_pallas. The
        # forward's saved boundary states are tiled over d by the BlockSpec,
        # so the backward d-tile is independent of the forward's (only
        # l_chunk must match).
        n_pad = a_t.shape[0]
        fused = _env_int("AUM_SCAN_BWD_FUSED", 0) != 0
        dla_mode = _bwd_dla_mode()
        eq = 3.0 if fused else 8.4  # calibrated buffer-equivalents/chain
        budget = int(_scoped_vmem_budget() / (eq * l_chunk * n_pad * 4))
        bwd_target = _env_int("AUM_SCAN_BWD_DBLOCK",
                              min(dbt, max(128, (budget // 128) * 128)))
        op = _get_bwd_op(reverse, bwd_target, l_chunk, interpret, fused,
                         softplus, dla_mode=dla_mode)
        du, ddelta, dz, dat, dd, dbias, dbsum, dcsum = op(
            up, dtp, a_t, bp, cp, dsk, zp, gout, xb)
        dA = jnp.swapaxes(dat, 0, 1)[:, :n]
        dB = dbsum[..., :n].astype(bp.dtype)
        dC = dcsum[..., :n].astype(cp.dtype)
        ddb = dbias[0] if has_bias else None
        return (du, ddelta, dA, dB, dC, dd[0], dz, ddb)

    scan.defvjp(scan_fwd, scan_bwd)
    return scan


@functools.cache
def _make_scan_x0(reverse: bool, d_block_target: int, l_chunk_target: int,
                  interpret: bool, b_tile, softplus: bool = True):
    """custom-VJP scan with an initial-state input and final-state output.

    State layout at this boundary is the reference's (B, D, N)
    (selective_scan_interface.py:86-152 return_last_state); the kernels run
    (B, N_pad, D) internally, so the wrapper transposes/pads on the way in
    and out. The backward seeds the adjoint carry from the final state's
    cotangent and emits dL/dx0 — so autodiff composes across chained or
    sequence-sharded scan segments.
    """

    def _to_kernel(x, n, n_pad):  # (B, D, N) -> (B, N_pad, D) fp32
        xk = jnp.swapaxes(x.astype(jnp.float32), 1, 2)
        if n_pad != n:
            xk = jnp.pad(xk, [(0, 0), (0, n_pad - n), (0, 0)])
        return xk

    def _from_kernel(xk, n):  # (B, N_pad, D) -> (B, D, N) fp32
        return jnp.swapaxes(xk[:, :n], 1, 2)

    @jax.custom_vjp
    def scan(u, delta, A, B, C, D, z, delta_bias, x0):
        n = A.shape[1]
        up, dtp, a_t, bp, cp, dsk, zp, dbt, l_chunk, l, _ = _prep(
            u, delta, A, B, C, D, z, delta_bias,
            d_block_target, l_chunk_target, softplus)
        inline = _env_int("AUM_SCAN_INLINE_DECAY", 1) != 0
        op = _get_fwd_op(reverse, False, dbt, l_chunk, interpret, b_tile,
                         inline, True)
        out, xfin = op(up, dtp, a_t, bp, cp, dsk, zp,
                       _to_kernel(x0, n, a_t.shape[0]))
        return out, _from_kernel(xfin, n)

    def scan_fwd(u, delta, A, B, C, D, z, delta_bias, x0):
        n = A.shape[1]
        up, dtp, a_t, bp, cp, dsk, zp, dbt, l_chunk, l, _ = _prep(
            u, delta, A, B, C, D, z, delta_bias,
            d_block_target, _train_l_target(l_chunk_target), softplus)
        inline = _env_int("AUM_SCAN_INLINE_DECAY", 1) != 0
        op = _get_fwd_op(reverse, True, dbt, l_chunk, interpret, b_tile,
                         inline, True)
        out, xb, xfin = op(up, dtp, a_t, bp, cp, dsk, zp,
                           _to_kernel(x0, n, a_t.shape[0]))
        res = (up, dtp, a_t, bp, cp, dsk, zp, xb, dbt, l_chunk, n,
               delta_bias is not None)
        return (out, _from_kernel(xfin, n)), res

    def scan_bwd(res, gouts):
        (up, dtp, a_t, bp, cp, dsk, zp, xb, dbt, l_chunk, n,
         has_bias) = res
        gout, gfin = gouts
        n_pad = a_t.shape[0]
        eq = 8.4  # v1 kernel buffer-equivalents (see scan_bwd above)
        budget = int(_scoped_vmem_budget() / (eq * l_chunk * n_pad * 4))
        bwd_target = _env_int("AUM_SCAN_BWD_DBLOCK",
                              min(dbt, max(128, (budget // 128) * 128)))
        op = _get_bwd_op(reverse, bwd_target, l_chunk, interpret, False,
                         softplus, True, dla_mode=_bwd_dla_mode())
        du, ddelta, dz, dat, dd, dbias, dbsum, dcsum, dx0 = op(
            up, dtp, a_t, bp, cp, dsk, zp, gout, xb,
            _to_kernel(gfin, n, n_pad))
        dA = jnp.swapaxes(dat, 0, 1)[:, :n]
        dB = dbsum[..., :n].astype(bp.dtype)
        dC = dcsum[..., :n].astype(cp.dtype)
        ddb = dbias[0] if has_bias else None
        return (du, ddelta, dA, dB, dC, dd[0], dz, ddb,
                _from_kernel(dx0, n))

    scan.defvjp(scan_fwd, scan_bwd)
    return scan


def selective_scan(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: jax.Array | None = None,
    z: jax.Array | None = None,
    delta_bias: jax.Array | None = None,
    delta_softplus: bool = False,
    reverse: bool = False,
    d_block: int = 512,
    l_chunk: int = 128,
    use_kernel: bool | None = None,
    interpret: bool | None = None,
    b_tile: int | None = None,
    initial_state: jax.Array | None = None,
    return_final_state: bool = False,
):
    """Fused selective scan. See ``selective_scan_ref`` for semantics.

    The Pallas kernel path requires both D and z (the configuration the AuM
    models always use, mamba_simple.py:195-263; ``delta_softplus`` is
    handled outside the kernel — see ``_prep``); other combinations fall
    back to the jnp oracle, which XLA still compiles to a reasonable
    sequential scan.

    ``initial_state`` (B, D_model, N) starts the recurrence from a carried
    state instead of zeros, and ``return_final_state=True`` additionally
    returns the (B, D_model, N) fp32 state at the scan's last position
    (reference: selective_scan_fn's return_last_state,
    selective_scan_interface.py:86-152). Together they let scans chain
    exactly — the building block for chunked LM prefill and the
    sequence-parallel scan (aum_tpu.ops.seq_parallel).
    """
    if use_kernel is None:
        use_kernel = D is not None and z is not None
    if not use_kernel:
        return selective_scan_ref(
            u, delta, A, B, C, D, z, delta_bias, delta_softplus,
            reverse=reverse, initial_state=initial_state,
            return_last_state=return_final_state)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if delta_bias is None:
        delta_bias = jnp.zeros((u.shape[-1],), jnp.float32)
    if initial_state is not None or return_final_state:
        scan = _make_scan_x0(bool(reverse), d_block, l_chunk,
                             bool(interpret), b_tile, bool(delta_softplus))
        if initial_state is None:
            initial_state = jnp.zeros(
                (u.shape[0], u.shape[-1], A.shape[1]), jnp.float32)
        out, xfin = scan(u, delta, A, B, C, D, z, delta_bias, initial_state)
        return (out, xfin) if return_final_state else out
    scan = _make_scan(bool(reverse), d_block, l_chunk, bool(interpret),
                      b_tile, bool(delta_softplus))
    return scan(u, delta, A, B, C, D, z, delta_bias)


# ---------------------------------------------------------------------------
# Fused dual-direction (bidirectional) forward kernel
# ---------------------------------------------------------------------------
#
# Both directions of a bidirectional Mamba layer are independent serial
# recurrences; running them as two pallas_calls leaves the VPU waiting on one
# dependence chain. The dual kernel processes, in the same grid step, the
# forward chain on logical chunk l and the reverse chain on logical chunk
# n_l-1-l (separate BlockSpec index maps), interleaving the two fma chains so
# each hides the other's latency, and halving kernel-launch count. Outputs
# are produced per-direction and summed by XLA (the (y_f + y_b) of
# mamba_simple.py:243-246 / bimamba_inner, selective_scan_interface.py:707).


def _fwd_kernel_dual(
    uf_ref, df_ref, atf_ref, bf_ref, cf_ref, dskf_ref, zf_ref,
    ur_ref, dr_ref, atr_ref, br_ref, cr_ref, dskr_ref, zr_ref,
    *rest,
    l_chunk: int, save_states: bool, seq_len: int, fuse_y: bool = False,
    inline_decay: bool = False, fuse_dt: bool = False,
    bf16_stage: bool = False,
):
    if fuse_dt:
        # Four extra *input* refs (pallas passes inputs before outputs):
        # per-direction dt_proj weight (R_pad, d_b) and bias (1, d_b).
        wdtf_ref, dbf_ref, wdtr_ref, dbr_ref, *rest = rest
    (outf_ref, outr_ref, xbf_ref, xbr_ref,
     statef_ref, stater_ref, af_scr, ar_scr,
     xf_scr, xr_scr, dtuf_scr, dtur_scr, bfm_scr, brm_scr,
     *extra_scr) = rest
    l = pl.program_id(2)

    @pl.when(l == 0)
    def _():
        statef_ref[...] = jnp.zeros_like(statef_ref)
        stater_ref[...] = jnp.zeros_like(stater_ref)

    if save_states:
        xbf_ref[...] = statef_ref[...][:, None]
        xbr_ref[...] = stater_ref[...][:, None]

    n_l = pl.num_programs(2)
    # Forward branch walks chunks left-to-right, reverse branch right-to-left.
    # Overhang masking is needed ONLY on the recurrence inputs (dt, u, B) of
    # the REVERSE branch: it processes the overhang chunk FIRST, and within
    # it the invalid tail steps first, so garbage (possibly NaN/inf) there
    # would poison the state carried into every valid chunk. Masking dt=0,
    # dt·u=0, B=0 makes those steps exact pass-throughs. The FORWARD branch
    # meets the overhang chunk LAST and its invalid steps come after every
    # valid step, so garbage can only reach state that dies with the chunk
    # and output rows Pallas discards — no masks needed. Likewise C and z
    # are read per valid row only (the y contraction is per-step and invalid
    # y/out rows are discarded), so they stay unmasked in both branches.
    # Each skipped mask was a full-chunk lax.select pass per grid step.
    mr = _pos_mask(n_l - 1 - l, l_chunk, seq_len, ur_ref.shape)
    if bf16_stage:
        # VERDICT r2 #4 experiment (AUM_SCAN_BF16_STAGE=1): stage the chunk
        # operands in the stream dtype (bf16) instead of fp32 — halves the
        # load/store/ALU vector-op count of every prologue staging pass
        # (dt·log2e, dt·u, B, C) at the cost of one bf16 rounding on the
        # dt·log2e and dt·u products plus per-step upcasts inside the loop
        # (small (b_t, d_b)/(b_t, N) slices, off the carry path). The FMA
        # chain itself stays fp32. Requires bf16 streams + the production
        # fuse_y/inline_decay configuration (enforced in _fwd_pallas_dual).
        uf = uf_ref[...]                              # (b_t,L_c,d_b) bf16
        ur = _mask0(mr, ur_ref[...])
        dtf = df_ref[...]
        dtr = _mask0(mr, dr_ref[...])
    else:
        uf = uf_ref[...].astype(jnp.float32)          # (b_t,L_c,d_b)
        ur = _mask0(mr, ur_ref[...].astype(jnp.float32))
    if fuse_dt:
        # In-kernel dt_proj (VERDICT r2 #2 — MXU work folded into the VPU
        # kernel): df/dr stream the (b_t, L_c, R_pad) x_dbl dt-rank slice
        # instead of a (b_t, L_c, d_b) activated dt. The (L_c, R_pad) @
        # (R_pad, d_b) matmul runs on the MXU (idle in this kernel
        # otherwise) and softplus(· + bias) is applied in fp32 here. Kills
        # the dt HBM streams: the XLA-side (B, L, D) dt materialization and
        # the kernel's two full-tensor dt reads (~300 MB/layer at base
        # eval shapes) are replaced by two (B, L, R_pad) reads (~17 MB).
        # Costs back the two softplus passes the round-2 hoist removed
        # (~3 ms/step at B=64) — net measured on-chip, see ROOFLINE.md.
        wf = wdtf_ref[...].astype(jnp.float32)         # (R_pad, d_b)
        wr = wdtr_ref[...].astype(jnp.float32)
        badf = dbf_ref[...].astype(jnp.float32)        # (1, d_b)
        badr = dbr_ref[...].astype(jnp.float32)
        rf = df_ref[...].astype(jnp.float32)           # (b_t, L_c, R_pad)
        rr = dr_ref[...].astype(jnp.float32)
        bt_, lc_, rp_ = rf.shape
        db_ = wf.shape[1]
        dtf = _softplus(
            jax.lax.dot(rf.reshape(bt_ * lc_, rp_), wf,
                        preferred_element_type=jnp.float32)
            .reshape(bt_, lc_, db_) + badf[None])
        dtr = _mask0(mr, _softplus(
            jax.lax.dot(rr.reshape(bt_ * lc_, rp_), wr,
                        preferred_element_type=jnp.float32)
            .reshape(bt_, lc_, db_) + badr[None]))
    elif not bf16_stage:
        # dt arrives pre-activated (softplus(delta+bias) fused into the
        # dt_proj matmul epilogue by XLA — see _prep); only the reverse
        # branch masks it.
        dtf = df_ref[...].astype(jnp.float32)
        dtr = _mask0(mr, dr_ref[...].astype(jnp.float32))

    # exp(dt·A) as exp2((dt·log2e)·A): folding log2(e) into the (L_c, d_b)
    # dt factor skips the hidden per-(L_c, N, d_b) multiply inside exp's
    # lowering (exp = exp2(x·log2e) on the VPU).
    _LOG2E = 1.4426950408889634
    if inline_decay:
        # Decay computed per step inside the loop: exp2 of the (N, d_b)
        # outer factor depends only on dt and A (not the running state), so
        # it sits OFF the carry path and the unrolled FMA chains overlap it.
        # This removes the two (L_c, N, d_b) decay buffers — the largest
        # scratch by 16x — freeing VMEM for bigger batch tiles (fewer grid
        # steps). af_scr/ar_scr here are (b_t, L_c, d_b) dt·log2(e) factors.
        # (.astype = no-op unless bf16_stage meets a mixed-dtype call.)
        af_scr[...] = (dtf * _LOG2E).astype(af_scr.dtype)
        ar_scr[...] = (dtr * _LOG2E).astype(ar_scr.dtype)
        atf = atf_ref[...].astype(jnp.float32)  # (N, d_b)
        atr = atr_ref[...].astype(jnp.float32)
    else:
        af_scr[...] = jnp.exp2(
            (dtf * _LOG2E)[:, :, None, :]
            * atf_ref[...].astype(jnp.float32)[None, None])
        ar_scr[...] = jnp.exp2(
            (dtr * _LOG2E)[:, :, None, :]
            * atr_ref[...].astype(jnp.float32)[None, None])
    # The input term dt·u ⊗ B is formed per-step in the loop (one broadcast
    # multiply of (d_b) × (N) factors read from small scratch) instead of
    # materializing a (L_c, N, d_b) chunk tensor: saves a full chunk-width
    # VMEM write+read per direction. The factors go through scratch refs —
    # Mosaic supports dynamic indexing on refs, not on values.
    dtuf_scr[...] = (dtf * uf).astype(dtuf_scr.dtype)
    dtur_scr[...] = (dtr * ur).astype(dtur_scr.dtype)
    bfm_scr[...] = bf_ref[...].astype(bfm_scr.dtype)
    brm_scr[...] = _mask0(mr, br_ref[...].astype(brm_scr.dtype))

    if fuse_y:
        # Fused y-readout: the C-contraction happens per step in the loop
        # (x never round-trips through an (L_c, N, d_b) scratch — xf_scr /
        # xr_scr here are the (L_c, d_b) y accumulators and extra_scr holds
        # the masked C chunks). The reduction is off the carry path, so the
        # unrolled chains still overlap.
        cfm_scr, crm_scr = extra_scr
        cfm_scr[...] = cf_ref[...].astype(cfm_scr.dtype)
        crm_scr[...] = cr_ref[...].astype(crm_scr.dtype)

        def body(i, carry):
            xf, xr = carry
            tr = l_chunk - 1 - i
            # Per-step slices upcast BEFORE any broadcast: keeps the math
            # fp32 when the chunk is staged bf16 (no-op casts on the fp32
            # path), and Mosaic only supports minor-dim insertion
            # ([:, :, None]) on 32-bit vectors.
            if inline_decay:
                daf = jnp.exp2(
                    af_scr[:, i].astype(jnp.float32)[:, None, :] * atf[None])
                dar = jnp.exp2(
                    ar_scr[:, tr].astype(jnp.float32)[:, None, :] * atr[None])
            else:
                daf = af_scr[:, i]
                dar = ar_scr[:, tr]
            xf = (daf * xf
                  + dtuf_scr[:, i].astype(jnp.float32)[:, None, :]
                  * bfm_scr[:, i].astype(jnp.float32)[:, :, None])
            xr = (dar * xr
                  + dtur_scr[:, tr].astype(jnp.float32)[:, None, :]
                  * brm_scr[:, tr].astype(jnp.float32)[:, :, None])
            xf_scr[:, i] = jnp.sum(
                xf * cfm_scr[:, i].astype(jnp.float32)[:, :, None], axis=1)
            xr_scr[:, tr] = jnp.sum(
                xr * crm_scr[:, tr].astype(jnp.float32)[:, :, None], axis=1)
            return (xf, xr)

        statef, stater = jax.lax.fori_loop(
            0, l_chunk, body, (statef_ref[...], stater_ref[...]),
            unroll=l_chunk)
        statef_ref[...] = statef
        stater_ref[...] = stater
        yf = xf_scr[...]
        yr = xr_scr[...]
    else:
        def body(i, carry):
            xf, xr = carry
            tr = l_chunk - 1 - i
            xf = (af_scr[:, i] * xf
                  + dtuf_scr[:, i][:, None, :] * bfm_scr[:, i][:, :, None])
            xr = (ar_scr[:, tr] * xr
                  + dtur_scr[:, tr][:, None, :] * brm_scr[:, tr][:, :, None])
            xf_scr[:, i] = xf
            xr_scr[:, tr] = xr
            return (xf, xr)

        statef, stater = jax.lax.fori_loop(
            0, l_chunk, body, (statef_ref[...], stater_ref[...]),
            unroll=l_chunk)
        statef_ref[...] = statef
        stater_ref[...] = stater

        cf = cf_ref[...].astype(jnp.float32)
        cr = cr_ref[...].astype(jnp.float32)
        yf = jnp.sum(xf_scr[...] * cf[:, :, :, None], axis=2)
        yr = jnp.sum(xr_scr[...] * cr[:, :, :, None], axis=2)
    ycf = yf + dskf_ref[...].astype(jnp.float32)[None] * uf
    ycr = yr + dskr_ref[...].astype(jnp.float32)[None] * ur
    zff = zf_ref[...].astype(jnp.float32)
    zrr = zr_ref[...].astype(jnp.float32)
    outf_ref[...] = (ycf * _silu(zff)).astype(outf_ref.dtype)
    outr_ref[...] = (ycr * _silu(zrr)).astype(outr_ref.dtype)


def _mask_step(valid, x):
    """Per-step overhang mask: x where the (dynamic scalar) `valid` else 0.

    lax.select (not multiply) so NaN/inf garbage from overhang reads is
    killed; primitives-only for the same MLIR-cache reason as _mask0.
    """
    return jax.lax.select(jnp.broadcast_to(valid, x.shape), x,
                          jnp.zeros_like(x))


def _fwd_kernel_dual_direct(
    uf_ref, df_ref, atf_ref, bf_ref, cf_ref, dskf_ref, zf_ref,
    ur_ref, dr_ref, atr_ref, br_ref, cr_ref, dskr_ref, zr_ref,
    outf_ref, outr_ref, xbf_ref, xbr_ref,
    statef_ref, stater_ref,
    *, l_chunk: int, save_states: bool, seq_len: int,
):
    """Direct-streaming variant of _fwd_kernel_dual (fused y + inline decay).

    MEASURED NEGATIVE — kept behind AUM_SCAN_DIRECT=1 (default off); do not
    re-enable without new evidence. On-chip dual fwd at B=64/L=513/d1536/
    N=16: 9.29 ms at b_t=8 and 7.75 ms at b_t=4 vs 4.79 ms for the staged
    kernel. Mosaic does not slot-reuse stack temporaries across the fully
    unrolled loop, so every per-step intermediate is spilled to the VMEM
    stack — recreating (worse) the scratch round trips this design tried to
    remove, while also giving up the chunk-wide vectorized prologue passes.
    Chunk-wide staged passes are the right shape for Mosaic; per-step
    streaming is not.

    The idea: with the loop FULLY unrolled every in-chunk index is static,
    so per-step operands can be read straight off the input block refs and
    the gated output written straight to the output refs — no chunk-wide
    scratch copies (a/dtu/B/C per direction, y accumulator, gating
    epilogue); declared scratch shrinks to the two carry states, freeing
    room for batch tiles b_t >= 8 that fill the VPU sublanes per step.
    The stack-spill behavior above is what kills it.

    The experiment's one lasting win: it surfaced CompilerParams
    vmem_limit_bytes (see _scoped_vmem_kw), which un-capped the backward
    d-tile for the staged kernels.

    Masking follows the staged kernel's argument: only the REVERSE branch
    meets the overhang chunk first, and here the mask collapses to a scalar
    predicate per (static) step — 3 small selects replacing full-chunk
    select passes.
    """
    l = pl.program_id(2)

    @pl.when(l == 0)
    def _():
        statef_ref[...] = jnp.zeros_like(statef_ref)
        stater_ref[...] = jnp.zeros_like(stater_ref)

    if save_states:
        xbf_ref[...] = statef_ref[...][:, None]
        xbr_ref[...] = stater_ref[...][:, None]

    n_l = pl.num_programs(2)
    _LOG2E = 1.4426950408889634
    atf = atf_ref[...].astype(jnp.float32) * _LOG2E   # (N, d_b)
    atr = atr_ref[...].astype(jnp.float32) * _LOG2E
    dskf = dskf_ref[...].astype(jnp.float32)          # (1, d_b)
    dskr = dskr_ref[...].astype(jnp.float32)
    rc0 = (n_l - 1 - l) * l_chunk  # reverse chunk's global start position

    def body(i, carry):
        xf, xr = carry
        tr = l_chunk - 1 - i
        # Forward direction: unmasked (overhang garbage dies with the chunk
        # and lands only in discarded output rows — see _fwd_kernel_dual).
        dtf = df_ref[:, i].astype(jnp.float32)        # (b_t, d_b)
        uf = uf_ref[:, i].astype(jnp.float32)
        bf = bf_ref[:, i].astype(jnp.float32)         # (b_t, N)
        daf = jnp.exp2(dtf[:, None, :] * atf[None])
        xf = daf * xf + (dtf * uf)[:, None, :] * bf[:, :, None]
        cf = cf_ref[:, i].astype(jnp.float32)
        yf = jnp.sum(xf * cf[:, :, None], axis=1) + dskf * uf
        zf = zf_ref[:, i].astype(jnp.float32)
        outf_ref[:, i] = (yf * _silu(zf)).astype(outf_ref.dtype)
        # Reverse direction: mask the recurrence inputs at overhang steps
        # (processed first; dt=0 -> decay 1, input term 0 -> pass-through).
        valid = rc0 + tr < seq_len
        dtr = _mask_step(valid, dr_ref[:, tr].astype(jnp.float32))
        ur = _mask_step(valid, ur_ref[:, tr].astype(jnp.float32))
        br = _mask_step(valid, br_ref[:, tr].astype(jnp.float32))
        dar = jnp.exp2(dtr[:, None, :] * atr[None])
        xr = dar * xr + (dtr * ur)[:, None, :] * br[:, :, None]
        cr = cr_ref[:, tr].astype(jnp.float32)
        yr = jnp.sum(xr * cr[:, :, None], axis=1) + dskr * ur
        zr = zr_ref[:, tr].astype(jnp.float32)
        outr_ref[:, tr] = (yr * _silu(zr)).astype(outr_ref.dtype)
        return (xf, xr)

    statef, stater = jax.lax.fori_loop(
        0, l_chunk, body, (statef_ref[...], stater_ref[...]),
        unroll=l_chunk)
    statef_ref[...] = statef
    stater_ref[...] = stater


def _fwd_pallas_dual(args_f, args_r, *, save_states, d_block, l_chunk,
                     interpret, b_tile=None, fuse_y=True,
                     inline_decay=False, direct=False, dt_fold=None):
    """args_f/args_r: (u, dt, a_t, bm, cm, dsk, z) per direction, dt
    pre-activated (see _prep). Forward direction scans chunks
    left->right, reverse right->left.

    dt_fold = (wdt_f, bias_f, wdt_r, bias_r) switches on in-kernel dt_proj:
    the dt slot of args_f/args_r then carries the (B, L, R_pad) x_dbl
    dt-rank slice and the kernel computes softplus(dtr @ wdt + bias) itself
    (see _fwd_kernel_dual). Requires fuse_y + inline_decay (the production
    configuration)."""
    fuse_dt = dt_fold is not None
    u = args_f[0]
    # AUM_SCAN_BF16_STAGE=1: stage chunk operands in bf16 scratch (VERDICT
    # r2 #4 prologue experiment, see _fwd_kernel_dual). Only meaningful for
    # bf16 streams on the production fuse_y+inline_decay kernel.
    bf16_stage = (_env_int("AUM_SCAN_BF16_STAGE", 0) != 0
                  and fuse_y and inline_decay and not direct and not fuse_dt
                  and u.dtype == jnp.bfloat16)
    stage_dtype = jnp.bfloat16 if bf16_stage else jnp.float32
    bsz, seq_len, d = u.shape
    n_pad = args_f[2].shape[0]
    r_pad = args_f[1].shape[-1] if fuse_dt else None
    d_block = _pick_d_block(d, d_block)  # d_block arg is the *target*
    n_d = d // d_block
    n_l = -(-seq_len // l_chunk)  # cdiv; last chunk may overhang
    if b_tile is None:
        env_bt = _os.environ.get("AUM_SCAN_BTILE")
        if env_bt and bsz % int(env_bt) == 0:
            b_tile = int(env_bt)
        elif direct:
            # Scratch is just the two carry states; per-step math wants the
            # batch tile to fill the VPU sublanes (see the kernel docstring).
            b_tile = 1
            for cand in (8, 4, 2):
                if bsz % cand == 0:
                    b_tile = cand
                    break
        elif fuse_y and inline_decay:
            # No (L_c, N, d_b) scratch left, but Mosaic stack temporaries
            # still scale with b_t·L_c·N·d_b (measured: 8.4M total at
            # bt1/l104/d768, 16.87M at bt2 — over the 16M scoped limit), so
            # the effective per-chain budget model keeps N in the product.
            # At model shapes this yields bt=1. Measured (trading chunk for
            # batch tile under 16M, sweep 2026-08): bt2 l88 395.5 / bt4 l48
            # 392.5 vs bt1 l104 408 clips/s. Re-measured at the 64M ceiling
            # where bt2 fits at the FULL l104 chunk (3 reps each, eval
            # B=64): bt1 419.9/424.7/422.1 vs bt2 426.6/418.2/421.8 —
            # statistically indistinguishable (±1% run noise swamps it) —
            # and bt4 (409.5) / l176-bt2 (409.5) regress. Halving grid
            # steps buys nothing the b_t=1 pipeline wasn't already hiding;
            # keep bt1, AUM_SCAN_BTILE overrides for sweeps.
            b_tile = _pick_b_tile(bsz, l_chunk, d_block, 8, n_bufs=8,
                                  budget_bytes=16 * 2 ** 20)
        else:
            b_tile = _pick_b_tile(bsz, l_chunk, d_block, n_pad, n_bufs=6,
                                  budget_bytes=26 * 2 ** 20)
    n_b = bsz // b_tile

    def spec_of(rev):
        def lmap(li):
            return (n_l - 1 - li) if rev else li

        seq = pl.BlockSpec((b_tile, l_chunk, d_block),
                           lambda di, bi, li: (bi, lmap(li), di),
                           memory_space=pltpu.VMEM)
        bc = pl.BlockSpec((b_tile, l_chunk, n_pad),
                          lambda di, bi, li: (bi, lmap(li), 0),
                          memory_space=pltpu.VMEM)
        if not fuse_dt:
            return seq, bc, seq  # dt streams like a sequence tensor
        dtr = pl.BlockSpec((b_tile, l_chunk, r_pad),
                           lambda di, bi, li: (bi, lmap(li), 0),
                           memory_space=pltpu.VMEM)
        return seq, bc, dtr

    at_spec = pl.BlockSpec((n_pad, d_block), lambda di, bi, li: (0, di),
                           memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, d_block), lambda di, bi, li: (0, di),
                            memory_space=pltpu.VMEM)
    seq_f, bc_f, dt_f = spec_of(False)
    seq_r, bc_r, dt_r = spec_of(True)
    wdt_spec = (pl.BlockSpec((r_pad, d_block), lambda di, bi, li: (0, di),
                             memory_space=pltpu.VMEM) if fuse_dt else None)

    def xb_spec(rev):
        del rev
        return pl.BlockSpec((b_tile, 1, n_pad, d_block),
                            lambda di, bi, li: (bi, li, 0, di),
                            memory_space=pltpu.VMEM)

    out_shapes = [
        jax.ShapeDtypeStruct((bsz, seq_len, d), u.dtype),
        jax.ShapeDtypeStruct((bsz, seq_len, d), u.dtype),
    ]
    out_specs = [seq_f, seq_r]
    if save_states:
        for rev in (False, True):
            out_shapes.append(
                jax.ShapeDtypeStruct((bsz, n_l, n_pad, d), jnp.float32))
            out_specs.append(xb_spec(rev))
    else:
        for rev in (False, True):
            out_shapes.append(
                jax.ShapeDtypeStruct((b_tile, 1, n_pad, d), jnp.float32))
            out_specs.append(pl.BlockSpec(
                (b_tile, 1, n_pad, d_block), lambda di, bi, li: (0, 0, 0, di),
                memory_space=pltpu.VMEM))

    if inline_decay and not fuse_y:
        raise ValueError("inline_decay requires fuse_y")
    if fuse_dt and (direct or not (fuse_y and inline_decay)):
        raise ValueError("dt_fold requires the fuse_y+inline_decay kernel")
    if direct:
        kernel = functools.partial(_fwd_kernel_dual_direct, l_chunk=l_chunk,
                                   save_states=save_states, seq_len=seq_len)
    else:
        kernel = functools.partial(_fwd_kernel_dual, l_chunk=l_chunk,
                                   save_states=save_states, seq_len=seq_len,
                                   fuse_y=fuse_y, inline_decay=inline_decay,
                                   fuse_dt=fuse_dt, bf16_stage=bf16_stage)
    cost = pl.CostEstimate(
        flops=20 * bsz * seq_len * d * n_pad,
        bytes_accessed=8 * bsz * seq_len * d * 4,
        transcendentals=2 * bsz * seq_len * d * n_pad,
    )
    if direct:
        scratch = [pltpu.VMEM((b_tile, n_pad, d_block), jnp.float32)] * 2
    else:
        if fuse_y:
            # x never round-trips through scratch: the two big (L_c, N, d_b)
            # buffers become (L_c, d_b) y accumulators, plus masked-C chunks.
            x_or_y_scr = [pltpu.VMEM((b_tile, l_chunk, d_block),
                                     jnp.float32)] * 2
            extra_scr = [pltpu.VMEM((b_tile, l_chunk, n_pad),
                                    stage_dtype)] * 2
        else:
            x_or_y_scr = [pltpu.VMEM((b_tile, l_chunk, n_pad, d_block),
                                     jnp.float32)] * 2
            extra_scr = []
        if inline_decay:
            # af/ar hold the (L_c, d_b) dt·log2(e) factors, not the decay.
            a_scr = [pltpu.VMEM((b_tile, l_chunk, d_block), stage_dtype)] * 2
        else:
            a_scr = [pltpu.VMEM((b_tile, l_chunk, n_pad, d_block),
                                jnp.float32)] * 2
        scratch = (
            [pltpu.VMEM((b_tile, n_pad, d_block), jnp.float32)] * 2
            + a_scr
            + x_or_y_scr
            + [pltpu.VMEM((b_tile, l_chunk, d_block), stage_dtype)] * 2
            + [pltpu.VMEM((b_tile, l_chunk, n_pad), stage_dtype)] * 2
            + extra_scr
        )
    kw = _scoped_vmem_kw(interpret)
    if direct and not interpret and not kw:
        # The direct kernel's fully-unrolled loop holds per-step stack
        # temporaries Mosaic does not slot-reuse; raise the scoped-VMEM
        # ceiling past the 16M default (v5e has 128M VMEM and the direct
        # kernel's declared scratch is only the two carry states).
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20)
    in_specs = [seq_f, dt_f, at_spec, bc_f, bc_f, vec_spec, seq_f,
                seq_r, dt_r, at_spec, bc_r, bc_r, vec_spec, seq_r]
    args = list(args_f) + list(args_r)
    if fuse_dt:
        in_specs += [wdt_spec, vec_spec, wdt_spec, vec_spec]
        args += list(dt_fold)
    outs = pl.pallas_call(
        kernel,
        grid=(n_d, n_b, n_l),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        cost_estimate=cost,
        interpret=interpret,
        **kw,
    )(*args)
    return outs  # out_f, out_r, xb_f, xb_r


@functools.cache
def _make_dual_scan(d_block_target: int, l_chunk_target: int,
                    interpret: bool):
    """custom-VJP dual scan: forward chains fused, backward as two
    checkpointed adjoint passes (one per direction)."""

    def prep_both(uf, df, af, bf, cf, dskf, zf, biasf,
                  ur, dr, ar, br, cr, dskr, zr, biasr, l_target):
        pf = _prep(uf, df, af, bf, cf, dskf, zf, biasf,
                   d_block_target, l_target)
        pr = _prep(ur, dr, ar, br, cr, dskr, zr, biasr,
                   d_block_target, l_target)
        return pf, pr

    @jax.custom_vjp
    def dual(uf, df, af, bf, cf, dskf, zf, biasf,
             ur, dr, ar, br, cr, dskr, zr, biasr):
        pf, pr = prep_both(uf, df, af, bf, cf, dskf, zf, biasf,
                           ur, dr, ar, br, cr, dskr, zr, biasr,
                           l_chunk_target)
        (upf, dtpf, atf, bpf, cpf, dskpf, zpf,
         dbt, l_chunk, l, _) = pf
        (upr, dtpr, atr, bpr, cpr, dskpr, zpr, *_rest) = pr
        fuse_y = _env_int("AUM_SCAN_FUSED_Y", 1) != 0
        inline_decay = fuse_y and _env_int("AUM_SCAN_INLINE_DECAY", 1) != 0
        direct = _env_int("AUM_SCAN_DIRECT", 0) != 0
        op = _get_dual_fwd_op(False, dbt, l_chunk, interpret, fuse_y,
                              inline_decay, direct)
        outf, outr = op(upf, dtpf, atf, bpf, cpf, dskpf, zpf,
                        upr, dtpr, atr, bpr, cpr, dskpr, zpr)
        return outf, outr

    def dual_fwd(uf, df, af, bf, cf, dskf, zf, biasf,
                 ur, dr, ar, br, cr, dskr, zr, biasr):
        pf, pr = prep_both(uf, df, af, bf, cf, dskf, zf, biasf,
                           ur, dr, ar, br, cr, dskr, zr, biasr,
                           _train_l_target(l_chunk_target))
        (upf, dtpf, atf, bpf, cpf, dskpf, zpf,
         dbt, l_chunk, l, nf) = pf
        (upr, dtpr, atr, bpr, cpr, dskpr, zpr,
         _db2, _lc2, _l2, nr) = pr
        fuse_y = _env_int("AUM_SCAN_FUSED_Y", 1) != 0
        inline_decay = fuse_y and _env_int("AUM_SCAN_INLINE_DECAY", 1) != 0
        direct = _env_int("AUM_SCAN_DIRECT", 0) != 0
        op = _get_dual_fwd_op(True, dbt, l_chunk, interpret, fuse_y,
                              inline_decay, direct)
        outf, outr, xbf, xbr = op(
            upf, dtpf, atf, bpf, cpf, dskpf, zpf,
            upr, dtpr, atr, bpr, cpr, dskpr, zpr)
        res = (pf[:7], pr[:7], xbf, xbr, dbt, l_chunk, l, nf, nr)
        return (outf, outr), res

    def dual_bwd(res, gout):
        return _dual_bwd_impl(res, gout, interpret)

    dual.defvjp(dual_fwd, dual_bwd)
    return dual


def _dual_bwd_impl(res, gout, interpret):
    """Shared dual-scan backward: two checkpointed adjoint passes (or the
    measured-slower fused dual kernel behind AUM_SCAN_DUAL_BWD). Returns
    the 8 forward-direction grads + the 8 reverse-direction grads."""
    argsf, argsr, xbf, xbr, dbt, l_chunk, l, nf, nr = res
    gf, gr = gout
    n_pad = argsf[2].shape[0]

    def finish(o8, args, n):
        du, ddelta, dz, dat, ddsk, dbias, dbsum, dcsum = o8
        dA = jnp.swapaxes(dat, 0, 1)[:, :n]
        dB = dbsum[..., :n].astype(args[3].dtype)
        dC = dcsum[..., :n].astype(args[4].dtype)
        return (du, ddelta, dA, dB, dC, ddsk[0], dz, dbias[0])

    if _env_int("AUM_SCAN_DUAL_BWD", 0):
        # One fused backward kernel interleaving both adjoint chains
        # (BiMambaInnerFn.backward, selective_scan_interface.py:519-603).
        # ~2x the scoped VMEM of a single-direction pass -> smaller
        # calibrated d-tile target. MEASURED SLOWER than the two-pass
        # backward on v5e (B=12 base train step: 235.6 ms fused vs
        # 208.4 ms two-pass; the halved d-tile (128 vs 256) costs more
        # than the interleaved chains save), so OFF by default —
        # AUM_SCAN_DUAL_BWD=1 opts in.
        budget = int(_scoped_vmem_budget() / (16.8 * l_chunk * n_pad * 4))
        bwd_target = _env_int("AUM_SCAN_BWD_DBLOCK",
                              min(dbt, max(128, (budget // 128) * 128)))
        op = _get_dual_bwd_op(bwd_target, l_chunk, interpret)
        outs = op(*argsf, *argsr, gf, gr, xbf, xbr)
        return finish(outs[:8], argsf, nf) + finish(outs[8:], argsr, nr)

    # Two sequential single-direction passes (AUM_SCAN_DUAL_BWD=0).
    fused = _env_int("AUM_SCAN_BWD_FUSED", 0) != 0
    dla_mode = _bwd_dla_mode()
    eq = 3.0 if fused else 8.4  # calibrated buffer-equivalents/chain
    budget = int(_scoped_vmem_budget() / (eq * l_chunk * n_pad * 4))
    bwd_target = _env_int("AUM_SCAN_BWD_DBLOCK",
                          min(dbt, max(128, (budget // 128) * 128)))

    def one(args, xb, g, reverse, n):
        up, dtp, a_t, bp, cp, dsk, zp = args
        op = _get_bwd_op(reverse, bwd_target, l_chunk, interpret, fused,
                         dla_mode=dla_mode)
        return finish(op(up, dtp, a_t, bp, cp, dsk, zp, g, xb),
                      args, n)

    return one(argsf, xbf, gf, False, nf) + one(argsr, xbr, gr, True, nr)


@functools.cache
def _make_dual_scan_fdt(d_block_target: int, l_chunk_target: int,
                        interpret: bool):
    """Dual scan with the dt_proj matmul folded into the forward kernel.

    Primal (eval): streams the (B, L, R) dt-rank slice and computes
    softplus(dtr @ wdt + bias) in-kernel (fp32 matmul on the MXU) — no
    (B, L, D) dt tensor ever exists. Under AD the fwd rule materializes
    delta in XLA instead (the residuals and the proven streamed-dt backward
    need it anyway; same cost as the un-folded path) and the bwd rule
    chain-rules the matmul: ddtr = ddelta @ W^T, dW = dtrᵀ @ ddelta.
    Eval-vs-train numerics differ by the matmul accumulation (fp32
    in-kernel vs the model-dtype XLA matmul) — the eval side is the more
    precise one."""

    def _pad_r(rt, w):
        r = rt.shape[-1]
        r_pad = max(128, _round_up(r, 128))
        if r_pad != r:
            rt = jnp.pad(rt, [(0, 0), (0, 0), (0, r_pad - r)])
            w = jnp.pad(w, [(0, r_pad - r), (0, 0)])
        return rt, w

    @jax.custom_vjp
    def dual(uf, rtf, wdtf, af, bf, cf, dskf, zf, biasf,
             ur, rtr, wdtr, ar, br, cr, dskr, zr, biasr):
        pf = _prep(uf, None, af, bf, cf, dskf, zf, None,
                   d_block_target, l_chunk_target)
        pr = _prep(ur, None, ar, br, cr, dskr, zr, None,
                   d_block_target, l_chunk_target)
        (upf, _, atf, bpf, cpf, dskpf, zpf, dbt, l_chunk, l, _) = pf
        (upr, _, atr, bpr, cpr, dskpr, zpr, *_r) = pr
        rtfp, wfp = _pad_r(rtf, wdtf)
        rtrp, wrp = _pad_r(rtr, wdtr)
        op = _get_dual_fdt_op(dbt, l_chunk, interpret)
        return op(upf, rtfp, atf, bpf, cpf, dskpf, zpf,
                  upr, rtrp, atr, bpr, cpr, dskpr, zpr,
                  wfp, biasf.astype(jnp.float32)[None, :],
                  wrp, biasr.astype(jnp.float32)[None, :])

    def dual_fwd(uf, rtf, wdtf, af, bf, cf, dskf, zf, biasf,
                 ur, rtr, wdtr, ar, br, cr, dskr, zr, biasr):
        df = rtf @ wdtf
        dr = rtr @ wdtr
        l_target = _train_l_target(l_chunk_target)
        pf = _prep(uf, df, af, bf, cf, dskf, zf, biasf,
                   d_block_target, l_target)
        pr = _prep(ur, dr, ar, br, cr, dskr, zr, biasr,
                   d_block_target, l_target)
        (upf, dtpf, atf, bpf, cpf, dskpf, zpf,
         dbt, l_chunk, l, nf) = pf
        (upr, dtpr, atr, bpr, cpr, dskpr, zpr,
         _db2, _lc2, _l2, nr) = pr
        fuse_y = _env_int("AUM_SCAN_FUSED_Y", 1) != 0
        inline_decay = fuse_y and _env_int("AUM_SCAN_INLINE_DECAY", 1) != 0
        op = _get_dual_fwd_op(True, dbt, l_chunk, interpret, fuse_y,
                              inline_decay, False)
        outf, outr, xbf, xbr = op(
            upf, dtpf, atf, bpf, cpf, dskpf, zpf,
            upr, dtpr, atr, bpr, cpr, dskpr, zpr)
        res = (pf[:7], pr[:7], xbf, xbr, dbt, l_chunk, l, nf, nr,
               rtf, wdtf, rtr, wdtr)
        return (outf, outr), res

    def dual_bwd(res, gout):
        rtf, wdtf, rtr, wdtr = res[9:]
        g = _dual_bwd_impl(res[:9], gout, interpret)
        (duf, ddf, dAf, dBf, dCf, ddskf, dzf, dbf) = g[:8]
        (dur, ddr, dAr, dBr, dCr, ddskr, dzr, dbr) = g[8:]

        def mat_grads(ddelta, rt, w):
            # precision=HIGHEST: on TPU the fp32 casts alone don't force
            # fp32 MXU passes (default precision uses bf16 passes —
            # measured 1e-3 vs 6e-5 grad relerr on-chip,
            # scripts/smoke_fdt_tpu.py). These contractions are tiny
            # (R=48), so exact fp32 is free.
            hi = jax.lax.Precision.HIGHEST
            dd32 = ddelta.astype(jnp.float32)
            drt = jnp.einsum("bld,rd->blr", dd32, w.astype(jnp.float32),
                             precision=hi).astype(rt.dtype)
            dw = jnp.einsum("blr,bld->rd", rt.astype(jnp.float32),
                            dd32, precision=hi).astype(w.dtype)
            return drt, dw

        drtf, dwf = mat_grads(ddf, rtf, wdtf)
        drtr, dwr = mat_grads(ddr, rtr, wdtr)
        return (duf, drtf, dwf, dAf, dBf, dCf, ddskf, dzf, dbf,
                dur, drtr, dwr, dAr, dBr, dCr, ddskr, dzr, dbr)

    dual.defvjp(dual_fwd, dual_bwd)
    return dual


import os as _os


def _env_int(name, default):
    v = _os.environ.get(name)
    return int(v) if v else default


def selective_scan_dual(
    args_fwd: tuple,
    args_rev: tuple,
    d_block: int | None = None,
    l_chunk: int | None = None,
    use_kernel: bool | None = None,
    interpret: bool | None = None,
    dt_fold: tuple | None = None,
):
    """Fused bidirectional selective scan.

    args_fwd / args_rev: (u, delta, A, B, C, D, z, delta_bias) for the
    forward-scanning and reverse-scanning direction respectively (pass the
    same tensors in both for bimamba v1; autodiff sums the cotangents).
    Returns (y_fwd, y_rev) — the caller sums them (and halves for
    if_devide_out).

    dt_fold = ((dtr_f, wdt_f), (dtr_r, wdt_r)) folds the dt_proj matmul
    into the forward kernel (eval hot path): pass the (B, L, R) x_dbl
    dt-rank slice + the (R, D) dt_proj weight per direction and None in
    the delta slots; delta_bias keeps its pre-softplus role. Bimamba v1
    passes the same (dtr, wdt) for both directions.
    """
    if use_kernel is None:
        use_kernel = True
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if dt_fold is not None and (not use_kernel):
        # jnp fallback: materialize delta and take the standard path.
        (rtf, wf), (rtr, wr) = dt_fold
        args_fwd = args_fwd[:1] + (rtf @ wf,) + args_fwd[2:]
        args_rev = args_rev[:1] + (rtr @ wr,) + args_rev[2:]
        dt_fold = None
    if not use_kernel:
        uf, df, af, bf, cf, dskf, zf, biasf = args_fwd
        ur, dr, ar, br, cr, dskr, zr, biasr = args_rev
        yf = selective_scan_ref(uf, df, af, bf, cf, dskf, zf, biasf,
                                delta_softplus=True)
        yr = selective_scan_ref(ur, dr, ar, br, cr, dskr, zr, biasr,
                                delta_softplus=True, reverse=True)
        return yf, yr
    # Measured-best tiling (docs/DESIGN.md §6 + ROOFLINE.md): d-tile 768,
    # chunk target 128 (_choose_l picks the minimal-overhang chunk, 104 at
    # L=513), b_tile=1, fused y-readout + inline decay. The fused y-readout
    # freed the two (L_c, N, d_b) x scratch buffers (d-tile could grow past
    # 512: 391.6 vs 388.8 clips/s B=64 eval); inline decay then removed the
    # two decay buffers (408.2 clips/s, +4.2%). Trading chunk size for batch
    # tile LOSES (bt2 l88: 395.5, bt4 l48: 392.5 — grid-step overhead is
    # smaller than overhang waste), so b_tile stays 1 at model shapes.
    # Overridable via AUM_SCAN_DBLOCK / AUM_SCAN_LCHUNK / AUM_SCAN_BTILE /
    # AUM_SCAN_FUSED_Y / AUM_SCAN_INLINE_DECAY.
    if d_block is None:
        d_block = _env_int("AUM_SCAN_DBLOCK", 768)
    if l_chunk is None:
        l_chunk = _env_int("AUM_SCAN_LCHUNK", 128)
    uf, df, af, bf, cf, dskf, zf, biasf = args_fwd
    ur, dr, ar, br, cr, dskr, zr, biasr = args_rev
    if biasf is None:
        biasf = jnp.zeros((uf.shape[-1],), jnp.float32)
    if biasr is None:
        biasr = jnp.zeros((ur.shape[-1],), jnp.float32)
    if dt_fold is not None:
        (rtf, wf), (rtr, wr) = dt_fold
        dual = _make_dual_scan_fdt(d_block, l_chunk, bool(interpret))
        return dual(uf, rtf, wf, af, bf, cf, dskf, zf, biasf,
                    ur, rtr, wr, ar, br, cr, dskr, zr, biasr)
    dual = _make_dual_scan(d_block, l_chunk, bool(interpret))
    return dual(uf, df, af, bf, cf, dskf, zf, biasf,
                ur, dr, ar, br, cr, dskr, zr, biasr)
