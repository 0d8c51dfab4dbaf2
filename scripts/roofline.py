"""Measured roofline for the selective-scan kernel on this chip.

Produces the numbers behind docs/ROOFLINE.md (VERDICT r1 #5): measured VPU
elementwise peak, exp/transcendental throughput, HBM bandwidth, and the scan
kernel's achieved rates at model shape — so the throughput ceiling claim is
measurement-backed, not an estimate stack.

All timings use the only method that survives the relay (CLAUDE.md): N
iterations chained inside ONE jit via data dependence, fresh inputs per
timed call, difference of two loop lengths, min of two runs.

Usage: python scripts/roofline.py [--quick]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import aum_tpu  # noqa: F401  (compilation cache)


def timed_chain(build_fn, x0, n_short, n_long, extra=()):
    """Per-iteration seconds of build_fn's loop body via chain-length diff.

    `extra` tensors are passed as jit ARGUMENTS, not closure constants —
    closure constants are embedded in the remote-compile payload and large
    ones trip its HTTP 413 size limit (see CLAUDE.md).
    """
    def chained(n):
        @jax.jit
        def f(x, *extra):
            return build_fn(x, n, *extra)
        return f

    times = {}
    for n in (n_short, n_long):
        fn = chained(n)
        float(jnp.sum(fn(x0, *extra)))  # compile+warm
        best = None
        for rep in range(3):
            x = x0 + 1e-6 * (rep + 1 + n)
            t0 = time.perf_counter()
            float(jnp.sum(fn(x, *extra)))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[n] = best
    return (times[n_long] - times[n_short]) / (n_long - n_short)


def measure_vpu_fma(quick=False):
    """Chained multiply-adds on a VMEM-resident block.

    Uses the logistic map x <- 3.7*x*(1-x) (3 flops/element/step): bounded,
    chaotic, and NOT algebraically collapsible — an affine x*a+b chain gets
    folded by XLA to a single fma (measured: chain length had no effect).
    """
    shape = (512, 1024)  # 2 MB fp32 — lives in VMEM across the fused chain
    x0 = jnp.ones(shape, jnp.float32) * 0.3
    k = 256  # map steps per outer iteration (fused into one kernel pass)

    def body(x, n):
        def it(_, x):
            for i in range(k):
                x = 3.7 * x * (1.0 - x)
            return x
        return jax.lax.fori_loop(0, n, it, x)

    # Chain lengths sized so the long-short diff is ~0.4 s of device time —
    # far above the relay's per-dispatch jitter (negative/2x-off rates were
    # measured with millisecond-scale diffs).
    per_iter = timed_chain(body, x0, 200 if quick else 1000,
                           1000 if quick else 5000)
    flops = 3 * k * shape[0] * shape[1]
    return flops / per_iter


def measure_exp(quick=False):
    shape = (512, 1024)
    x0 = jnp.ones(shape, jnp.float32) * -0.5
    k = 256

    def body(x, n):
        def it(_, x):
            for i in range(k):
                x = jnp.exp(x * 1e-6) * -0.5
            return x
        return jax.lax.fori_loop(0, n, it, x)

    per_iter = timed_chain(body, x0, 200 if quick else 1000,
                           1000 if quick else 5000)
    return k * shape[0] * shape[1] / per_iter  # exps/sec


def measure_hbm_bw(quick=False):
    n_el = 64 * 2**20  # 256 MB fp32
    x0 = jnp.full((n_el,), 0.999, jnp.float32)

    def body(x, n):
        def it(_, x):
            # Nonlinear (x*(2-x), fixed point 1.0): an affine body gets
            # algebraically folded once XLA unrolls the loop.
            return x * (2.0 - x)
        return jax.lax.fori_loop(0, n, it, x)

    per_iter = timed_chain(body, x0, 50 if quick else 200,
                           250 if quick else 800)
    return 2 * 4 * n_el / per_iter  # bytes/sec (1 read + 1 write)


def measure_scan(quick=False, bsz=None):
    """Dual fwd kernel + full VJP at model shape (B=64 eval tiling)."""
    from aum_tpu.ops.selective_scan import selective_scan_dual

    _b, l, d, n = (16, 513, 1536, 16) if quick else (64, 513, 1536, 16)
    bsz = bsz or _b
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    u = jax.random.normal(ks[0], (bsz, l, d), jnp.bfloat16)
    delta = jax.random.normal(ks[1], (bsz, l, d), jnp.bfloat16) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (d, n), jnp.float32) * 0.5)
    B = jax.random.normal(ks[3], (bsz, l, n), jnp.bfloat16)
    C = jax.random.normal(ks[4], (bsz, l, n), jnp.bfloat16)
    D = jax.random.normal(ks[5], (d,), jnp.float32)
    z = jax.random.normal(ks[6], (bsz, l, d), jnp.bfloat16)
    db = jax.random.normal(ks[7], (d,), jnp.float32) * 0.3
    args = (u, delta, A, B, C, D, z, db)

    rest = (delta, A, B, C, D, z, db)

    def fwd_once(x, n_it, *rest):
        delta, A, B, C, D, z, db = rest

        def it(_, carry):
            uu = carry
            yf, yr = selective_scan_dual(
                (uu, delta, A, B, C, D, z, db),
                (uu, delta, A, B, C, D, z, db))
            return uu + (jnp.mean(yf + yr) * 1e-12).astype(uu.dtype)
        return jax.lax.fori_loop(0, n_it, it, x)

    t_fwd = timed_chain(fwd_once, u, 2, 6, extra=rest)

    def vjp_once(x, n_it, *rest):
        delta, A, B, C, D, z, db = rest

        def loss(uu):
            yf, yr = selective_scan_dual(
                (uu, delta, A, B, C, D, z, db),
                (uu, delta, A, B, C, D, z, db))
            return jnp.mean((yf + yr).astype(jnp.float32))

        def it(_, carry):
            uu = carry
            g = jax.grad(loss)(uu)
            return uu + g.astype(uu.dtype) * 1e-12
        return jax.lax.fori_loop(0, n_it, it, x)

    t_full = timed_chain(vjp_once, u, 2, 6, extra=rest)
    return bsz, l, d, n, t_fwd, t_full


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--bsz", type=int, default=None)
    ap.add_argument("--scan-only", action="store_true")
    a = ap.parse_args()

    print("backend:", jax.default_backend())
    if a.scan_only:
        bsz, l, d, n, t_fwd, t_full = measure_scan(a.quick, a.bsz)
        print(f"dual scan fwd (B={bsz}): {t_fwd*1e3:.2f} ms "
              f"({t_fwd/bsz*1e6:.1f} us/clip); fwd+bwd {t_full*1e3:.2f} ms "
              f"({t_full/bsz*1e6:.1f} us/clip)")
        return
    fma = measure_vpu_fma(a.quick)
    print(f"VPU fma throughput:      {fma/1e12:.2f} TFLOP/s (fp32 elementwise)")
    expt = measure_exp(a.quick)
    print(f"exp throughput:          {expt/1e9:.1f} Gexp/s")
    bw = measure_hbm_bw(a.quick)
    print(f"HBM bandwidth:           {bw/1e9:.0f} GB/s (1R+1W streaming)")
    bsz, l, d, n, t_fwd, t_full = measure_scan(a.quick, a.bsz)
    el = bsz * l * d
    # Per-(b,l,d) element the dual fwd does ~2 directions x (n ops of exp2
    # input prep + fma scan + C-readout + dBu) + gating: see DESIGN.md §6.
    print(f"dual scan fwd (B={bsz}, L={l}, D={d}, N={n}): {t_fwd*1e3:.2f} ms"
          f" -> {el/t_fwd/1e9:.1f} Gelem/s"
          f" ({2*el*n/t_fwd/1e9:.0f} G(n,d)-lanes/s)")
    print(f"dual scan fwd+bwd:       {t_full*1e3:.2f} ms")
    hbm_fwd = el * 2 * (4 * 2 + 2)   # ~4 bf16 seq reads + 1 bf16 write x2dir
    print(f"fwd HBM (approx {hbm_fwd/1e9:.1f} GB) at measured BW: "
          f"{hbm_fwd/bw*1e3:.2f} ms")


if __name__ == "__main__":
    main()
