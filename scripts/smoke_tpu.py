"""On-TPU smoke test for the Pallas selective-scan kernel.

Runs the kernel on the real chip (model-sized shapes) and checks forward and
backward against the jnp oracle. Usage: python scripts/smoke_tpu.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from aum_tpu.ops import selective_scan, selective_scan_ref


def main():
    print("backend:", jax.default_backend(), jax.devices())
    key = jax.random.PRNGKey(0)
    bsz, l, d, n = 4, 513, 1536, 16
    ks = jax.random.split(key, 8)
    u = jax.random.normal(ks[0], (bsz, l, d), jnp.float32)
    delta = jax.random.normal(ks[1], (bsz, l, d), jnp.float32) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (d, n), jnp.float32) * 0.5)
    B = jax.random.normal(ks[3], (bsz, l, n), jnp.float32)
    C = jax.random.normal(ks[4], (bsz, l, n), jnp.float32)
    D = jax.random.normal(ks[5], (d,), jnp.float32)
    z = jax.random.normal(ks[6], (bsz, l, d), jnp.float32)
    db = jax.random.normal(ks[7], (d,), jnp.float32) * 0.3
    args = (u, delta, A, B, C, D, z, db)

    for reverse in (False, True):
        fn = jax.jit(lambda *a: selective_scan(
            *a, delta_softplus=True, reverse=reverse))
        t0 = time.time()
        out = fn(*args)
        out.block_until_ready()
        print(f"reverse={reverse} first call (compile+run): "
              f"{time.time()-t0:.1f}s")
        ref = selective_scan_ref(*args, delta_softplus=True, reverse=reverse)
        err = float(jnp.max(jnp.abs(out - ref)))
        rel = err / float(jnp.max(jnp.abs(ref)))
        print(f"  fwd max abs err {err:.2e} (rel {rel:.2e})")
        assert rel < 1e-4, "forward mismatch"

        def loss(*a):
            return jnp.sum(jnp.sin(selective_scan(
                *a, delta_softplus=True, reverse=reverse)))

        def loss_ref(*a):
            return jnp.sum(jnp.sin(selective_scan_ref(
                *a, delta_softplus=True, reverse=reverse)))

        gk = jax.jit(jax.grad(loss, argnums=tuple(range(8))))(*args)
        gr = jax.jit(jax.grad(loss_ref, argnums=tuple(range(8))))(*args)
        # Tolerance note (measured 2026-08): on these inputs the *oracle*
        # computed on TPU deviates 4.3e-3 (max-rel-to-global-max) from the
        # float64 CPU oracle, the kernel 4.2e-3 — TPU f32 exp/accumulation
        # numerics dominate, and kernel-vs-oracle lands ~1.2e-3 inside that
        # envelope. The tight (2e-4) correctness checks live in
        # tests/test_selective_scan.py against the near-exact (1.6e-7 from
        # f64) CPU oracle; this on-chip smoke asserts the TPU envelope.
        for name, a_, b_ in zip("u delta A B C D z db".split(), gk, gr):
            scale = float(jnp.max(jnp.abs(b_))) + 1e-30
            e = float(jnp.max(jnp.abs(a_ - b_))) / scale
            print(f"  grad {name}: rel err {e:.2e}")
            assert e < 2.5e-3, f"grad mismatch for {name}"

    # quick timing (fwd only)
    fn = jax.jit(lambda *a: selective_scan(*a, delta_softplus=True))
    fn(*args)[0].block_until_ready()
    t0 = time.time()
    for _ in range(10):
        out = fn(*args)
    out.block_until_ready()
    dt = (time.time() - t0) / 10
    print(f"fwd kernel time (B={bsz}, L={l}, D={d}, N={n}): {dt*1e3:.2f} ms")
    print("OK")


if __name__ == "__main__":
    main()
