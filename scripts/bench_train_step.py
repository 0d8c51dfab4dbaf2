"""Robust train-step timing on the real chip.

Measures the full jitted GSPMD train step (fwd + bwd + Adam) for AuM-Base
Fo-Bi at a given batch size, using the only timing method that survives this
environment's relay (see docs/DESIGN.md §6 and CLAUDE.md): N steps chained
inside one jit with a data dependence, difference of two chain lengths,
min-of-two runs with fresh inputs, and a host transfer to force completion
(block_until_ready does not reliably await through the relay).

Usage:  python scripts/bench_train_step.py [batch] [remat_mode] [dtype]
        remat_mode: auto (default) | split | block | none
        dtype: bfloat16 (default, = the production ExperimentConfig) | float32
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import aum_tpu  # noqa: F401  (sets the persistent compilation cache)
from aum_tpu.models.audio_mamba import AudioMamba, AudioMambaConfig
from aum_tpu.parallel.mesh import make_mesh
from aum_tpu.train.loop import AugmentConfig, init_train_state, make_train_step
from aum_tpu.train.optim import TrainHyperParams, make_optimizer


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    remat_mode = sys.argv[2] if len(sys.argv) > 2 else "auto"
    dtype = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"

    cfg = AudioMambaConfig.from_variant(
        "base", "Fo-Bi", num_classes=527, spectrogram_size=(128, 1024),
        remat=remat_mode != "none", remat_mode=remat_mode,
        dtype=dtype)
    model = AudioMamba(cfg)
    mesh = make_mesh(1, 1)
    hp = TrainHyperParams(lr=5e-5, weight_decay=5e-7)
    tx = make_optimizer(hp, steps_per_epoch=1000)

    x0 = jnp.ones((batch, 128, 1024), jnp.float32) * 0.1
    state = init_train_state(model, tx, jax.random.PRNGKey(0), x0[:1], mesh)
    step = make_train_step(model, tx, mesh, "BCE", AugmentConfig())
    y = jax.nn.one_hot(jnp.arange(batch) % 527, 527)
    rng = jax.random.PRNGKey(1)

    def sync(s):
        # Host transfer forces completion through the relay.
        return float(jnp.sum(s.params["params"]["head_weight"]))

    def chained(n):
        @jax.jit
        def f(state, x):
            s = state
            for i in range(n):
                s, _ = step(s, {"x": x, "y": y}, jax.random.fold_in(rng, i))
            return s
        return f

    times = {}
    for n in (2, 6):
        fn = chained(n)
        sync(fn(state, x0))  # compile + warm
        best = None
        for rep in range(2):
            x = x0 + 1e-4 * (rep + 1) * n  # fresh inputs dodge result cache
            t0 = time.perf_counter()
            sync(fn(state, x))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[n] = best

    per = (times[6] - times[2]) / 4
    print(f"train step B={batch} remat={remat_mode}: {per * 1e3:.1f} ms "
          f"-> {batch / per:.1f} clips/s  (raw {times})")


if __name__ == "__main__":
    main()
