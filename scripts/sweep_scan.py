"""Sweep selective-scan kernel tilings on the real TPU chip."""

import sys, os, time, itertools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from aum_tpu.ops import selective_scan

def bench(bsz, l, d, n, d_block, l_chunk, iters=20):
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    u = jax.random.normal(ks[0], (bsz, l, d), jnp.float32)
    delta = jax.random.normal(ks[1], (bsz, l, d), jnp.float32) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (d, n), jnp.float32) * 0.5)
    B = jax.random.normal(ks[3], (bsz, l, n), jnp.float32)
    C = jax.random.normal(ks[4], (bsz, l, n), jnp.float32)
    D = jax.random.normal(ks[5], (d,), jnp.float32)
    z = jax.random.normal(ks[6], (bsz, l, d), jnp.float32)
    db = jax.random.normal(ks[7], (d,), jnp.float32) * 0.3
    fn = jax.jit(lambda *a: selective_scan(
        *a, delta_softplus=True, d_block=d_block, l_chunk=l_chunk))
    args = (u, delta, A, B, C, D, z, db)
    t0 = time.time()
    fn(*args).block_until_ready()
    compile_t = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    out.block_until_ready()
    dt = (time.time() - t0) / iters
    print(f"B={bsz} L={l} D={d} d_block={d_block} l_chunk={l_chunk}: "
          f"{dt*1e3:.2f} ms  (compile {compile_t:.0f}s)", flush=True)

if __name__ == "__main__":
    for d_block, l_chunk in [(512, 128), (256, 64), (512, 256), (768, 128),
                             (1536, 64)]:
        try:
            bench(8, 513, 1536, 16, d_block, l_chunk)
        except Exception as e:
            print(f"d_block={d_block} l_chunk={l_chunk} FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
