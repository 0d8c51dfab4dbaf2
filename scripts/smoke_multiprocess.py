"""True multi-process (multi-controller) smoke test on CPU.

The unit tests (tests/test_multihost.py) exercise the global-batch assembly
and gather APIs on one process, where they are exact no-op-equivalents. This
script runs the REAL thing: two OS processes, `jax.distributed.initialize`
against a local coordinator, 4 virtual CPU devices per process (8 global),
a (8,)-data mesh spanning both processes, one jitted train step on a batch
assembled from per-process shards (aum_tpu/parallel/multihost.py), and the
eval-side `to_host_global` gather — the accelerate-launch equivalent of the
reference (/root/reference/src/run.py:32, traintest.py:39) end to end.

Parent mode (default): spawns the two children, checks both print
MULTIPROC_OK with the SAME loss, exits 0/1.
Child mode (--process-id): runs one controller.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/smoke_multiprocess.py
"""

import argparse
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(process_id: int, port: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # newer jax defaults to gloo for CPU multiprocess

    sys.path.insert(0, REPO)
    from aum_tpu.parallel.multihost import (
        global_batch,
        maybe_initialize_distributed,
        to_host_global,
    )

    assert maybe_initialize_distributed(
        "on", coordinator_address=f"127.0.0.1:{port}",
        num_processes=2, process_id=process_id)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    import jax.numpy as jnp
    import numpy as np

    from aum_tpu.models import AudioMamba, AudioMambaConfig
    from aum_tpu.parallel import make_mesh
    from aum_tpu.train import TrainHyperParams, make_eval_step, \
        make_optimizer
    from aum_tpu.train.loop import AugmentConfig, init_train_state, \
        make_train_step

    cfg = AudioMambaConfig(depth=1, embed_dim=96, spectrogram_size=(128, 32),
                           num_classes=3, d_state=8)
    model = AudioMamba(cfg, use_kernel=False)
    mesh = make_mesh(n_data=8, n_model=1)
    tx = make_optimizer(
        TrainHyperParams(lr=1e-3, warmup=False, lrscheduler_start=100),
        steps_per_epoch=2)

    # Deterministic GLOBAL batch; each process contributes rows
    # [4*pid : 4*pid+4] — the same per-host sharding the pipelines produce
    # (data/pipeline.py:136).
    rng = np.random.default_rng(0)
    x_all = rng.standard_normal((8, 32, 128)).astype(np.float32)
    y_all = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 8)]
    lo = 4 * process_id
    batch = global_batch(mesh, {"x": x_all[lo:lo + 4], "y": y_all[lo:lo + 4]})
    assert batch["x"].shape == (8, 32, 128)  # global shape, local shard 4

    state = init_train_state(model, tx, jax.random.PRNGKey(0),
                             jnp.zeros((1, 32, 128), jnp.float32), mesh=mesh)
    step = make_train_step(model, tx, mesh, loss_type="CE",
                           augment=AugmentConfig(), donate=False)
    state2, loss = step(state, batch, jax.random.PRNGKey(1))
    loss = float(loss)
    assert np.isfinite(loss), loss
    assert int(state2.step) == 1

    # Eval-side gather: logits of the global batch, fully addressable on
    # every process (traintest.py:285-287 accelerator.gather equivalent).
    eval_step = make_eval_step(model, mesh)
    logits = to_host_global(eval_step(state2.params, batch["x"]))
    assert logits.shape == (8, 3), logits.shape
    assert np.all(np.isfinite(logits))

    print(f"MULTIPROC_OK pid={process_id} loss={loss:.8f}", flush=True)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--process-id", type=int)
    p.add_argument("--port", type=int)
    args = p.parse_args()
    if args.process_id is not None:
        child(args.process_id, args.port)
        return 0

    with socket.socket() as s:  # pick a free coordinator port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never dial the TPU relay
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # device count set via jax_num_cpu_devices

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--process-id", str(i), "--port", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO)
        for i in range(2)
    ]
    outs = []
    ok = True
    for i, pr in enumerate(procs):
        try:
            out, _ = pr.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            pr.kill()
            out, _ = pr.communicate()
            ok = False
        outs.append(out)
        if pr.returncode != 0 or "MULTIPROC_OK" not in out:
            ok = False
    losses = set()
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MULTIPROC_OK"):
                losses.add(line.split("loss=")[1])
    if len(losses) != 1:
        ok = False
    if not ok:
        for i, out in enumerate(outs):
            print(f"--- child {i} output ---\n{out}")
        print("MULTIPROC SMOKE FAIL")
        return 1
    print(f"2-process multi-controller smoke OK (shared loss {losses.pop()})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
