"""Benchmark: AuM-Base Fo-Bi eval throughput, clips/sec/chip on 10s clips.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput numbers. The denominator is
an estimated 650 clips/s for the reference PyTorch eval path on one A100
(plausible range 500-850) — full FLOPs/bytes/dispatch derivation in
BASELINE.md "The A100 eval-throughput denominator" (VERDICT r2 #8), so
`vs_baseline` carries documented ±25% error bars. See docs/DESIGN.md §6 for
the TPU-side speed-of-light analysis and the measurement-methodology caveats
of this environment.
"""

import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

A100_REFERENCE_CLIPS_PER_SEC = 650.0
# BASELINE.json's program target is >=5x the A100 denominator. Carry it in
# the JSON so vs_baseline=0.64 can never read as "64% of goal" (VERDICT r4
# #3): vs_target = value / (5 * 650). The denominator itself is a modeled
# estimate (+-25%), not a measurement — derivation in BASELINE.md "The A100
# eval-throughput denominator".
TARGET_MULTIPLE = 5.0


def main():
    from aum_tpu.models import AudioMamba, AudioMambaConfig

    cfg = AudioMambaConfig.from_variant(
        "base", "Fo-Bi", num_classes=527, dtype="bfloat16")
    model = AudioMamba(cfg)

    bsz = int(os.environ.get("BENCH_BATCH", "64"))
    x = jax.random.normal(jax.random.PRNGKey(1), (bsz, 1024, 128),
                          jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])

    # Timing harness note: the execution backend used here dispatches via a
    # relay with ~50ms fixed overhead per synchronized call, and
    # block_until_ready does not reliably await completion. So: run all
    # iterations inside ONE jit with a data dependence chaining them (no
    # elision possible), sync once via host transfer, and subtract the
    # single-dispatch overhead measured with iters=0-equivalent.
    iters = int(os.environ.get("BENCH_ITERS", "10"))

    def many(params, x, n):
        def body(_, carry):
            x = carry
            out = model.apply(params, x)
            # Feed a scalar back so iterations are serialized.
            return x + jnp.mean(out).astype(x.dtype) * 1e-12

        return jnp.mean(jax.lax.fori_loop(0, n, body, x))

    run = jax.jit(many, static_argnums=2)
    # Fresh input per timed call: identical (executable, args) pairs can be
    # served from a result cache by the backend. Per-iteration time is the
    # difference of two loop lengths (min over two runs each), which cancels
    # the fixed dispatch/sync overhead without trusting any single run.
    n_short, n_long = max(iters // 3, 1), iters
    for n in (n_short, n_long):
        float(run(params, x + n, n))  # compile + warm

    def timed(n, off):
        t0 = time.perf_counter()
        float(run(params, x + off, n))
        return time.perf_counter() - t0

    t_short = min(timed(n_short, 11.0), timed(n_short, 12.0))
    t_long = min(timed(n_long, 13.0), timed(n_long, 14.0))
    dt = max(t_long - t_short, 1e-9) / (n_long - n_short)

    clips_per_sec = bsz / dt
    print(json.dumps({
        "metric": "clips/sec/chip (10s AudioSet eval, AuM-Base Fo-Bi, bf16)",
        "value": round(clips_per_sec, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(clips_per_sec / A100_REFERENCE_CLIPS_PER_SEC, 3),
        "vs_target": round(
            clips_per_sec / (TARGET_MULTIPLE * A100_REFERENCE_CLIPS_PER_SEC),
            3),
        "baseline_note": ("denominator 650 clips/s = modeled A100 estimate "
                          "(+-25%, BASELINE.md); target = 5x that"),
    }))


if __name__ == "__main__":
    main()
