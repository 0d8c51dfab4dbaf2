"""A/B: exported serving-bundle throughput vs in-process model.apply.

Run on the real TPU. Confirms AOT export is perf-neutral (it should be:
the same XLA program, minus Python model construction at load time).

Method: the calibrated difference-of-chain-lengths harness (CLAUDE.md) is
not directly usable on a deserialized graph (we cannot rebuild the chained
loop inside it), so this measures N sequential predict() calls with fresh
inputs per call and reports the per-call delta vs the same loop over
jit(model.apply) — relative comparison under identical dispatch overhead.

Usage: python scripts/bench_serving.py [--batch 64] [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_loop(fn, xs):
    # Warm (compile/cache) on the first input, then time the rest.
    fn(xs[0])
    t0 = time.perf_counter()
    for x in xs[1:]:
        float(fn(x).sum())
    return (time.perf_counter() - t0) / (len(xs) - 1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from aum_tpu.models import AudioMamba, AudioMambaConfig
    from aum_tpu.serving import export_bundle, load_bundle

    cfg = AudioMambaConfig.from_variant(
        "base", "Fo-Bi", num_classes=527, dtype="bfloat16")
    model = AudioMamba(cfg)
    x0 = jnp.zeros((args.batch, 1024, 128), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)

    blob = export_bundle(model, params, audio_length=1024, melbins=128,
                         batch_sizes=(args.batch,))
    print(f"bundle: {len(blob) / 1e6:.1f} MB")
    sm = load_bundle(blob)

    key = jax.random.PRNGKey(1)
    xs = [jax.random.normal(jax.random.fold_in(key, i),
                            (args.batch, 1024, 128)) for i in range(args.iters)]

    # params must ride as a jit ARGUMENT, not a closure constant — 332 MB
    # of closure constants in the compile payload trips the relay's
    # HTTP 413 limit (CLAUDE.md gotcha).
    apply_jit = jax.jit(model.apply)
    t_apply = timed_loop(lambda x: apply_jit(params, x), xs)
    t_serve = timed_loop(sm.predict, xs)
    print(f"apply:  {t_apply * 1e3:8.2f} ms/call "
          f"({args.batch / t_apply:7.1f} clips/s)")
    print(f"serve:  {t_serve * 1e3:8.2f} ms/call "
          f"({args.batch / t_serve:7.1f} clips/s)  "
          f"delta {100 * (t_serve / t_apply - 1):+.1f}%")


if __name__ == "__main__":
    main()
