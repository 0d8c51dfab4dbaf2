"""Can independent MXU matmul work overlap the VPU scan kernel on this TPU?

VERDICT r2 item 2 asks for a two-microbatch software pipeline so layer k's
projections (MXU) for microbatch B run while layer k's scan (VPU) runs for
microbatch A — premised on the units being independently schedulable across
XLA ops. This probe measures that premise directly:

  T_scan  = chained iterations of one dual-scan layer (B=64 eval shape)
  T_mm    = chained iterations of a projection-sized bf16 matmul
            ((B*L, 768) @ (768, 3072) — the in_proj of the same layer)
  T_both  = chained iterations computing BOTH per step, with independent
            data-dependence chains (no ordering constraint between them
            inside an iteration)

If T_both ~= T_scan + T_mm the TPU executes the two ops serially (one core,
one instruction stream: no cross-op MXU/VPU overlap is available to XLA)
and the microbatch pipeline cannot win — that's the numbers-backed negative.
T_both ~= max(T_scan, T_mm) would mean overlap exists and the pipeline is
worth building.

Timing per CLAUDE.md: N iterations chained inside ONE jit, fresh inputs per
call, difference of two chain lengths, min of two runs each.

Usage: python scripts/overlap_probe.py  (on the TPU host)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from aum_tpu.ops.selective_scan import selective_scan_dual

B, L, D, N, DM = 64, 513, 1536, 16, 768


def make_scan_inputs(key):
    ks = jax.random.split(key, 8)
    u = jax.random.normal(ks[0], (B, L, D), jnp.float32) * 0.1
    dt = jax.random.normal(ks[1], (B, L, D), jnp.float32) * 0.05
    a = -jnp.exp(jax.random.normal(ks[2], (D, N), jnp.float32) * 0.5)
    ar = -jnp.exp(jax.random.normal(ks[3], (D, N), jnp.float32) * 0.5)
    bm = jax.random.normal(ks[4], (B, L, N), jnp.float32)
    cm = jax.random.normal(ks[5], (B, L, N), jnp.float32)
    dsk = jax.random.normal(ks[6], (D,), jnp.float32)
    z = jax.random.normal(ks[7], (B, L, D), jnp.float32)
    return u, dt, a, ar, bm, cm, dsk, z


def scan_once(u, dt, a, ar, bm, cm, dsk, z):
    args_f = (u, dt, a, bm, cm, dsk, z, None)
    args_r = (u, dt, ar, bm, cm, dsk, z, None)
    yf, yr = selective_scan_dual(args_f, args_r, interpret=False)
    return yf + yr


def timed(fn, args, n):
    t0 = time.perf_counter()
    float(fn(*args, n))
    return time.perf_counter() - t0


def chain_ms(fn, args_of, n_short, n_long):
    """Per-iteration ms via difference of two chain lengths (min of 2)."""
    for n in (n_short, n_long):
        float(fn(*args_of(0.0), n))  # compile+warm
    ts = min(timed(fn, args_of(0.11), n_short), timed(fn, args_of(0.12),
                                                      n_short))
    tl = min(timed(fn, args_of(0.13), n_long), timed(fn, args_of(0.14),
                                                     n_long))
    return (tl - ts) / (n_long - n_short) * 1e3


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    scan_in = make_scan_inputs(key)
    km = jax.random.split(key, 3)
    x_mm = jax.random.normal(km[0], (B * L, DM), jnp.bfloat16)
    w_mm = jax.random.normal(km[1], (DM, 2 * D), jnp.bfloat16) * 0.02

    def scan_loop(u, dt, a, ar, bm, cm, dsk, z, n):
        def body(_, u):
            y = scan_once(u, dt, a, ar, bm, cm, dsk, z)
            return u + jnp.mean(y).astype(u.dtype) * 1e-12
        return jnp.mean(jax.lax.fori_loop(0, n, body, u))

    def mm_loop(x, w, n):
        def body(_, x):
            y = x @ w
            return x + jnp.mean(y).astype(x.dtype) * 1e-12
        return jnp.mean(jax.lax.fori_loop(0, n, body, x)).astype(jnp.float32)

    def both_loop(u, dt, a, ar, bm, cm, dsk, z, x, w, n):
        def body(_, carry):
            u, x = carry
            y = scan_once(u, dt, a, ar, bm, cm, dsk, z)
            p = x @ w
            # Independent chains: scan feeds u, matmul feeds x. No data
            # dependence between the two inside an iteration.
            return (u + jnp.mean(y).astype(u.dtype) * 1e-12,
                    x + jnp.mean(p).astype(x.dtype) * 1e-12)
        u, x = jax.lax.fori_loop(0, n, body, (u, x))
        return jnp.mean(u) + jnp.mean(x).astype(jnp.float32)

    j_scan = jax.jit(scan_loop, static_argnums=8)
    j_mm = jax.jit(mm_loop, static_argnums=2)
    j_both = jax.jit(both_loop, static_argnums=10)

    ns, nl = 8, 24
    t_scan = chain_ms(
        j_scan, lambda o: (scan_in[0] + o,) + scan_in[1:], ns, nl)
    print(f"scan alone: {t_scan:.3f} ms/iter", flush=True)
    t_mm = chain_ms(j_mm, lambda o: (x_mm + o, w_mm), ns, nl)
    print(f"matmul alone: {t_mm:.3f} ms/iter", flush=True)
    t_both = chain_ms(
        j_both, lambda o: (scan_in[0] + o,) + scan_in[1:] + (x_mm + o, w_mm),
        ns, nl)
    print(f"both (independent): {t_both:.3f} ms/iter", flush=True)
    print(f"sum={t_scan + t_mm:.3f}  max={max(t_scan, t_mm):.3f}  "
          f"overlap_fraction="
          f"{(t_scan + t_mm - t_both) / min(t_scan, t_mm):.2f}",
          flush=True)


if __name__ == "__main__":
    main()
