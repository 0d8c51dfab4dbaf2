"""Sweep selective-scan kernel tilings on the real TPU chip.

Timing: N chained iterations inside one jit (data-dependent), one host-sync,
minus a 1-iteration baseline — see .claude/skills/verify/SKILL.md for why
(the relay backend caches identical runs and block_until_ready is unreliable).
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from aum_tpu.ops import selective_scan


def timed(fn, *args, iters=15):
    """Difference of two loop lengths, min-of-two runs each — the only
    timing method that is reproducible on this relay backend (single-run
    and 1-iter-baseline timings vary by 2-10x; see docs/DESIGN.md §6)."""
    def many(n, *args):
        def body(_, a):
            x = a[0]
            out = fn(*a)
            x = x + jnp.mean(out).astype(x.dtype) * 1e-12
            return (x,) + a[1:]
        return jnp.mean(jax.lax.fori_loop(0, n, body, args)[0])

    run = jax.jit(many, static_argnums=0)
    n_short = max(iters // 3, 1)
    for n in (n_short, iters):
        float(run(n, *((args[0] + n,) + args[1:])))  # compile + warm

    def t(n, off):
        a = (args[0] + off,) + args[1:]
        t0 = time.perf_counter()
        float(run(n, *a))
        return time.perf_counter() - t0

    ts = min(t(n_short, 11.0), t(n_short, 12.0))
    tl = min(t(iters, 13.0), t(iters, 14.0))
    return max(tl - ts, 0.0) / (iters - n_short)


def make_args(bsz, l, d, n, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    return (jax.random.normal(ks[0], (bsz, l, d), dtype),
            jax.random.normal(ks[1], (bsz, l, d), dtype) * 0.5,
            -jnp.exp(jax.random.normal(ks[2], (d, n), jnp.float32) * 0.5),
            jax.random.normal(ks[3], (bsz, l, n), dtype),
            jax.random.normal(ks[4], (bsz, l, n), dtype),
            jax.random.normal(ks[5], (d,), jnp.float32),
            jax.random.normal(ks[6], (bsz, l, d), dtype),
            jax.random.normal(ks[7], (d,), jnp.float32) * 0.3)


if __name__ == "__main__":
    bsz, l, d, n = 8, 513, 1536, 16
    configs = eval(sys.argv[1]) if len(sys.argv) > 1 else [
        (512, 128), (512, 256), (768, 64), (1536, 32), (256, 128)]
    for dtype in [jnp.float32, jnp.bfloat16]:
        args = make_args(bsz, l, d, n, dtype)
        for d_block, l_chunk in configs:
            try:
                fn = lambda *a: selective_scan(
                    *a, delta_softplus=True, d_block=d_block, l_chunk=l_chunk)
                dt = timed(fn, *args)
                print(f"{dtype.__name__} d_block={d_block} l_chunk={l_chunk}: "
                      f"{dt*1e3:.2f} ms", flush=True)
            except Exception as e:
                print(f"{dtype.__name__} d_block={d_block} l_chunk={l_chunk} "
                      f"FAILED: {str(e)[:150]}", flush=True)
