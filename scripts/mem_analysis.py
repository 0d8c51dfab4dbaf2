"""AOT-compile the train step and print XLA's memory analysis.

Localizes the split-remat HBM footprint (the `auto` policy's calibrated
27 B per depth*B*L*d_inner element at bf16 — roughly 2x the analytic sum
of the remat-boundary outputs + scan custom_vjp residuals) by asking the
compiler instead of estimating: argument/output/temp/peak bytes for the
full production train step at a given batch and remat mode.

Found this way (2026-08-17, v5e, B=32 base Fo-Bi):
  fp32  split: temp 14.42 GiB (args 1.05, out 1.03) — three fp32
        (24,32,513,1536) stacked residuals (u/dt/z) dominate
  fp32  block: temp 4.54 GiB
and the "27 B/element at bf16" constant in AudioMambaConfig.remat_mode
was calibrated against an fp32 harness (scripts/bench_train_step.py
predated the dtype flag) — at real bf16 the residuals halve.

Usage: python scripts/mem_analysis.py [batch] [dtype] [remat_mode...]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import aum_tpu  # noqa: F401
from aum_tpu.models.audio_mamba import AudioMamba, AudioMambaConfig
from aum_tpu.parallel.mesh import make_mesh
from aum_tpu.train.loop import AugmentConfig, init_train_state, \
    make_train_step
from aum_tpu.train.optim import TrainHyperParams, make_optimizer


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    modes = sys.argv[3:] or ["split", "block"]

    mesh = make_mesh(1, 1)
    hp = TrainHyperParams(lr=5e-5, weight_decay=5e-7)
    tx = make_optimizer(hp, steps_per_epoch=1000)
    x0 = jnp.ones((batch, 128, 1024), jnp.float32) * 0.1
    y = jax.nn.one_hot(jnp.arange(batch) % 527, 527)
    rng = jax.random.PRNGKey(1)

    for mode in modes:
        cfg = AudioMambaConfig.from_variant(
            "base", "Fo-Bi", num_classes=527, spectrogram_size=(128, 1024),
            remat=mode != "none", remat_mode=mode, dtype=dtype)
        model = AudioMamba(cfg)
        state = init_train_state(model, tx, jax.random.PRNGKey(0), x0[:1],
                                 mesh)
        step = make_train_step(model, tx, mesh, "BCE", AugmentConfig(),
                               donate=False)
        lowered = jax.jit(step).lower(state, {"x": x0, "y": y}, rng)
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        gib = 1024 ** 3
        print(f"mode={mode} B={batch} {dtype}: "
              f"args {ma.argument_size_in_bytes / gib:.2f} GiB, "
              f"out {ma.output_size_in_bytes / gib:.2f} GiB, "
              f"temp {ma.temp_size_in_bytes / gib:.2f} GiB, "
              f"alias {ma.alias_size_in_bytes / gib:.2f} GiB, "
              f"peak(gen) {ma.generated_code_size_in_bytes / gib:.3f} GiB")
        tot = (ma.argument_size_in_bytes + ma.output_size_in_bytes
               + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
        print(f"  total live ~= {tot / gib:.2f} GiB")


if __name__ == "__main__":
    main()
