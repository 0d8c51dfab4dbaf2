"""Bisect the train step's time budget on the real chip.

This harness times nested subsets of the step with the chained-iteration
methodology (CLAUDE.md: N iterations data-chained inside one jit, fresh
inputs per call, difference of two chain lengths, min of reps):

  fwd        — model.apply + loss
  grad       — value_and_grad of the same (adds the backward + remat)
  grad+opt   — adds tx.update/apply_updates
  step       — the production train step (adds the nonfinite guard)

Measured (2026-08-17, v5e, B=32 base Fo-Bi, remat=auto->block):
  fwd 88.0 ms | grad 554.2 | grad+opt 556.9 | step 557.7
  => backward+remat 466.2 ms, optimizer 2.7 ms, guard 0.8 ms.
This CLOSES the train-step budget that previously looked ~180 ms short:
at B=32 the auto remat policy falls back to "block" (split needs ~16.1 GB
> HBM budget), so the backward re-runs the 24 dual-scan forwards
(~43 ms), and the non-scan backward is ~2x the non-scan forward
(~89 ms) plus the block-remat recompute of projections/conv/norms
(~45 ms): 247 (scan bwd) + 43 + 89 + 45 + spills ~= 466 ms. The
optimizer and guard are negligible — there is no hidden overhead in the
production step vs plain value_and_grad.

Usage: python scripts/bisect_train_step.py [batch] [remat_mode] [dtype]
   dtype defaults to bfloat16 — the production ExperimentConfig dtype.
   (The measured numbers above are float32: the harness predated the flag.)
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax

import aum_tpu  # noqa: F401  (persistent compilation cache)
from aum_tpu.models.audio_mamba import AudioMamba, AudioMambaConfig
from aum_tpu.parallel.mesh import make_mesh
from aum_tpu.train.loop import AugmentConfig, init_train_state, \
    loss_fn_of, make_train_step
from aum_tpu.train.optim import TrainHyperParams, make_optimizer


def timed(make_chain, n_short=2, n_long=6, reps=2):
    times = {}
    for n in (n_short, n_long):
        fn, run = make_chain(n)
        run(fn, 0)  # compile + warm
        best = None
        for rep in range(reps):
            t0 = time.perf_counter()
            run(fn, rep + 1)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[n] = best
    return (times[n_long] - times[n_short]) / (n_long - n_short)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
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
    loss_of = loss_fn_of("BCE")

    x0 = jnp.ones((batch, 128, 1024), jnp.float32) * 0.1
    state = init_train_state(model, tx, jax.random.PRNGKey(0), x0[:1], mesh)
    y = jax.nn.one_hot(jnp.arange(batch) % 527, 527)
    params = state.params

    def loss_f(p, x):
        return loss_of(model.apply(p, x), y)

    # --- fwd: loss only, chained through the input. -------------------------
    def make_fwd(n):
        @jax.jit
        def f(p, x):
            l = jnp.float32(0)
            for _ in range(n):
                li = loss_f(p, x)
                x = x + li * 1e-12
                l = l + li
            return l
        return f, lambda fn, rep: float(fn(params, x0 + 1e-4 * rep))

    # --- grad: value_and_grad, chained through the params. ------------------
    def make_grad(n):
        @jax.jit
        def f(p, x):
            l = jnp.float32(0)
            for _ in range(n):
                li, g = jax.value_and_grad(loss_f)(p, x)
                p = jax.tree.map(lambda a, b: a + 1e-12 * b.astype(a.dtype),
                                 p, g)
                l = l + li
            return l
        return f, lambda fn, rep: float(fn(params, x0 + 1e-4 * rep))

    # --- grad+opt: adds tx.update/apply (no nonfinite guard). ---------------
    def make_gradopt(n):
        @jax.jit
        def f(p, opt, x):
            for _ in range(n):
                _, g = jax.value_and_grad(loss_f)(p, x)
                upd, opt = tx.update(g, opt, p)
                p = optax.apply_updates(p, upd)
            return p
        def run(fn, rep):
            out = fn(params, state.opt_state, x0 + 1e-4 * rep)
            return float(jnp.sum(out["params"]["head_weight"]))
        return f, run

    # --- step: the production train step. -----------------------------------
    step = make_train_step(model, tx, mesh, "BCE", AugmentConfig(),
                           donate=False)
    rng = jax.random.PRNGKey(1)

    def make_step(n):
        @jax.jit
        def f(s, x):
            for i in range(n):
                s, _ = step(s, {"x": x, "y": y}, jax.random.fold_in(rng, i))
            return s
        def run(fn, rep):
            out = fn(state, x0 + 1e-4 * rep)
            return float(jnp.sum(out.params["params"]["head_weight"]))
        return f, run

    results = {}
    for name, mk in (("fwd", make_fwd), ("grad", make_grad),
                     ("grad+opt", make_gradopt), ("step", make_step)):
        per = timed(mk)
        results[name] = per
        print(f"{name:9s} B={batch} remat={remat_mode} {dtype}: "
              f"{per * 1e3:7.1f} ms")
    print(f"bwd+remat = grad - fwd        = "
          f"{(results['grad'] - results['fwd']) * 1e3:7.1f} ms")
    print(f"optimizer = grad+opt - grad   = "
          f"{(results['grad+opt'] - results['grad']) * 1e3:7.1f} ms")
    print(f"guard/etc = step - grad+opt   = "
          f"{(results['step'] - results['grad+opt']) * 1e3:7.1f} ms")


if __name__ == "__main__":
    main()
