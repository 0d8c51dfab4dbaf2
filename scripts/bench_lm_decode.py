"""LM decode throughput on the real chip (tokens/s/chip).

One-token decode steps chained inside one jit (data dependence through the
caches and the greedy token), difference of two chain lengths — the relay-
safe harness (CLAUDE.md). The decode step is the compiled-program
equivalent of the reference's CUDA-graph cached step (generation.py:
CUDAGraphCache; vendored mamba_ssm).
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from aum_tpu.models.lm import (MambaLM, MambaLMConfig, decode_step,
                               init_decode_state)


def main():
    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = MambaLMConfig(d_model=768, n_layer=24, vocab_size=50277,
                        dtype="bfloat16")
    model = MambaLM(cfg)
    tok = jnp.zeros((bsz,), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tok[:, None])
    state0 = init_decode_state(cfg, bsz)

    def chained(n):
        # params passed as jit ARGUMENTS (closure constants are embedded in
        # the remote-compile payload -> HTTP 413, see CLAUDE.md).
        @jax.jit
        def f(params, tok, state):
            def body(_, carry):
                tok, state = carry
                logits, state = decode_step(params, cfg, tok, state)
                return (jnp.argmax(logits, -1).astype(jnp.int32), state)
            return jax.lax.fori_loop(0, n, body, (tok, state))
        return f

    times = {}
    for n in (4, 16):
        fn = chained(n)
        t, s = fn(params, tok, state0)
        float(jnp.sum(t))  # compile + warm
        best = None
        for rep in range(2):
            t0 = time.perf_counter()
            t, s = fn(params, tok + rep + n, state0)
            float(jnp.sum(t))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[n] = best
    per = (times[16] - times[4]) / 12
    print(f"LM decode (d_model=768, 24 layers, B={bsz}): "
          f"{per * 1e3:.2f} ms/token-step -> {bsz / per:.0f} tokens/s/chip")

    # Parallel prefill (fused-scan final-state port, models/lm.py prefill):
    # same chained harness over whole-prompt prefills. Measured 2026-08:
    # 12.2 ms for B=8 x L=512 (335k tok/s/chip) vs 215 ms stepwise at the
    # 0.42 ms/token decode rate above -> ~18x.
    from aum_tpu.models.lm import prefill
    l = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    ids = jax.random.randint(jax.random.PRNGKey(1), (bsz, l), 0,
                             cfg.vocab_size)

    def chained_prefill(n):
        @jax.jit
        def f(params, ids):
            def body(_, ids):
                logits, st = prefill(params, cfg, ids)
                bump = (jnp.argmax(logits, -1)[:, None] * 0).astype(ids.dtype)
                return ids + bump + (jnp.sum(st["ssm"]) * 1e-20).astype(
                    ids.dtype)
            return jnp.sum(jax.lax.fori_loop(0, n, body, ids))
        return f

    times = {}
    for n in (2, 6):
        fn = chained_prefill(n)
        float(fn(params, ids + n))
        best = None
        for rep in range(2):
            t0 = time.perf_counter()
            float(fn(params, ids + 10 + rep + n))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[n] = best
    per = (times[6] - times[2]) / 4
    print(f"LM parallel prefill (B={bsz}, L={l}): {per * 1e3:.2f} ms "
          f"-> {bsz * l / per:.0f} tokens/s/chip "
          f"(stepwise would be ~{l * 0.42:.0f} ms)")


if __name__ == "__main__":
    main()
