"""Backward-kernel issue-rate audit (VERDICT r2 item 5).

Decomposes the training-path cost of one dual selective-scan layer at the
production eval/train shape (B=64, L=513, D=1536, N=16, bf16 streams) into:

  t_fwd        primal dual forward (no state saving)        [eval path]
  t_fwd_save   differentiated forward (saves chunk-boundary states)
  t_vjp        full fwd+bwd (value_and_grad of a scalar readout)

so t_bwd_pair = t_vjp - t_fwd_save is the two single-direction adjoint
kernels (_bwd_kernel, d-tile from the calibrated budget), measured with the
chained-iteration harness (CLAUDE.md timing rules).

The per-pass budget model this feeds (docs/ROOFLINE.md "Backward"):
_bwd_kernel makes ~21 full-(L_c, N, d_b) VPU traversals + 1 full exp pass
per chunk (vs ~6 + 1 for the forward), so the issue-bound prediction is
t_bwd ~= (21/6) * t_fwd_issue. Run on the TPU host:
  python scripts/audit_bwd.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from aum_tpu.ops.selective_scan import selective_scan_dual

B, L, D, N = 64, 513, 1536, 16


def make_inputs(key, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 9)
    u = (jax.random.normal(ks[0], (B, L, D), jnp.float32) * 0.1).astype(dtype)
    dt = jax.nn.softplus(
        jax.random.normal(ks[1], (B, L, D), jnp.float32) * 0.5 - 1.0
    ).astype(dtype)
    a = -jnp.exp(jax.random.normal(ks[2], (D, N), jnp.float32) * 0.5)
    ar = -jnp.exp(jax.random.normal(ks[3], (D, N), jnp.float32) * 0.5)
    bm = jax.random.normal(ks[4], (B, L, N), dtype)
    cm = jax.random.normal(ks[5], (B, L, N), dtype)
    dsk = jax.random.normal(ks[6], (D,), jnp.float32)
    z = jax.random.normal(ks[7], (B, L, D), dtype)
    return u, dt, a, ar, bm, cm, dsk, z


def dual(u, dt, a, ar, bm, cm, dsk, z):
    args_f = (u, dt, a, bm, cm, dsk, z, None)
    args_r = (u, dt, ar, bm, cm, dsk, z, None)
    yf, yr = selective_scan_dual(args_f, args_r, interpret=False)
    return yf, yr


def chain(fn_step, args, n):
    """n iterations chained through the first operand."""
    def body(_, u):
        out = fn_step(u, *args[1:])
        return u + (out * 1e-12).astype(u.dtype)
    return jnp.mean(jax.lax.fori_loop(0, n, body, args[0])
                    .astype(jnp.float32))


def measure(fn_step, args, ns=6, nl=18):
    run = jax.jit(lambda u, n: chain(fn_step, (u,) + args[1:], n),
                  static_argnums=1)
    for n in (ns, nl):
        for attempt in range(4):
            try:
                float(run(args[0] + 0.0, n))
                break
            except Exception as e:  # transient remote-compile hiccups
                if attempt == 3:
                    raise
                print(f"  compile retry {attempt + 1}: {e}", flush=True)
                time.sleep(30)

    def t(n, off):
        t0 = time.perf_counter()
        float(run(args[0] + off, n))
        return time.perf_counter() - t0

    ts = min(t(ns, 0.011), t(ns, 0.012))
    tl = min(t(nl, 0.013), t(nl, 0.014))
    return (tl - ts) / (nl - ns) * 1e3


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    args = make_inputs(jax.random.PRNGKey(0))

    def fwd_step(u, *rest):
        yf, yr = dual(u, *rest)
        return jnp.mean(yf + yr)

    t_fwd = measure(fwd_step, args)
    print(f"t_fwd (primal dual)        : {t_fwd:8.3f} ms/layer", flush=True)

    def vjp_step(u, *rest):
        def loss(u, dt, z, bm, cm):
            yf, yr = dual(u, dt, rest[1], rest[2], bm, cm, rest[5], z)
            return jnp.mean((yf + yr).astype(jnp.float32) ** 2)

        l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
            u, rest[0], rest[6], rest[3], rest[4])
        return l + sum(jnp.mean(g.astype(jnp.float32)) for g in grads)

    t_vjp = measure(vjp_step, args)
    print(f"t_vjp (fwd+bwd, 5 grads)   : {t_vjp:8.3f} ms/layer", flush=True)

    # Differentiated forward alone: trace through jax.vjp (so the
    # state-saving kernel + residual plumbing run) but never call the
    # cotangent function. The pallas_call is opaque to XLA, so its unused
    # xb outputs still execute; only the adjoint kernels are absent.
    def fwd_save_step(u, *rest):
        def f(u):
            yf, yr = dual(u, rest[0], rest[1], rest[2], rest[3], rest[4],
                          rest[5], rest[6])
            return jnp.mean((yf + yr).astype(jnp.float32))

        y, _vjp = jax.vjp(f, u)
        return y

    t_fwd_save = measure(fwd_save_step, args)
    print(f"t_fwd_save (linearize fwd) : {t_fwd_save:8.3f} ms/layer",
          flush=True)
    t_bwd = t_vjp - t_fwd_save
    print(f"t_bwd = vjp - fwd_save     : {t_bwd:8.3f} ms "
          f"({t_bwd / 2:.3f} per direction)", flush=True)
    print(f"ratios: bwd/fwd={t_bwd / t_fwd:.2f}  vjp/fwd={t_vjp / t_fwd:.2f}",
          flush=True)


if __name__ == "__main__":
    main()
