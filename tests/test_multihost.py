"""Multi-host wiring (VERDICT r2 item 3) on the virtual 8-device CPU mesh.

The reference scales out via `accelerate launch` (run.py:32, traintest.py:
39); the TPU-native equivalent is multi-controller JAX. These tests exercise
the pieces that differ from single-process execution — global-batch assembly
(jax.make_array_from_process_local_data), host gathers, and the runner's
initialize/no-op behavior — on one process, where every API is exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aum_tpu.models import AudioMamba, AudioMambaConfig
from aum_tpu.parallel import make_mesh
from aum_tpu.parallel.multihost import (
    global_batch,
    globalize_batches,
    maybe_initialize_distributed,
    to_host_global,
)
from aum_tpu.train import TrainHyperParams, make_optimizer
from aum_tpu.train.loop import AugmentConfig, init_train_state, \
    make_train_step


def test_global_batch_assembles_data_sharded_arrays():
    mesh = make_mesh(n_data=8, n_model=1)
    x = np.arange(8 * 4 * 3, dtype=np.float32).reshape(8, 4, 3)
    y = np.arange(8 * 5, dtype=np.float32).reshape(8, 5)
    batch = global_batch(mesh, {"x": x, "y": y})
    assert isinstance(batch["x"], jax.Array)
    assert batch["x"].sharding.spec == P("data", None, None)
    assert batch["y"].sharding.spec == P("data", None)
    np.testing.assert_array_equal(np.asarray(batch["x"]), x)
    np.testing.assert_array_equal(np.asarray(batch["y"]), y)
    # One row per device along 'data'.
    assert batch["x"].addressable_shards[0].data.shape == (1, 4, 3)


def test_train_step_consumes_globally_assembled_batch():
    """The full jitted DP+TP train step accepts global_batch outputs — the
    exact input form a multi-process run feeds it."""
    cfg = AudioMambaConfig(
        depth=1, embed_dim=96, spectrogram_size=(128, 32), num_classes=3,
        d_state=8)
    model = AudioMamba(cfg, use_kernel=False)
    mesh = make_mesh(n_data=4, n_model=2)
    tx = make_optimizer(
        TrainHyperParams(lr=1e-3, warmup=False, lrscheduler_start=100),
        steps_per_epoch=2)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 32, 128)).astype(np.float32)
    y = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 8)]
    state = init_train_state(model, tx, jax.random.PRNGKey(0),
                             jnp.asarray(x[:1]), mesh=mesh)
    step = make_train_step(model, tx, mesh, loss_type="CE",
                           augment=AugmentConfig(), donate=False)
    batch = global_batch(mesh, {"x": x, "y": y})
    state2, loss = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # And the result matches the plain (non-assembled) input exactly.
    _, loss_plain = step(state, {"x": jnp.asarray(x), "y": jnp.asarray(y)},
                         jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(loss), float(loss_plain), rtol=1e-6)


def test_globalize_batches_is_passthrough_on_one_process():
    mesh = make_mesh(n_data=8, n_model=1)
    items = [{"x": np.zeros((2, 3))}, {"x": np.ones((2, 3))}]
    out = list(globalize_batches(iter(items), mesh))
    assert out[0] is items[0] and out[1] is items[1]  # zero-copy hot path


def test_to_host_global_single_process_identity():
    x = jnp.arange(12.0).reshape(3, 4)
    np.testing.assert_array_equal(to_host_global(x), np.asarray(x))


def test_maybe_initialize_distributed_no_op_paths(monkeypatch):
    import aum_tpu.parallel.multihost as mh

    # Registered with monkeypatch so the test's _INITIALIZED = True side
    # effect is rolled back at teardown (no leak into later tests).
    monkeypatch.setattr(mh, "_INITIALIZED", False)
    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    assert maybe_initialize_distributed("off") is False
    assert maybe_initialize_distributed("auto") is False
    # "auto" becomes active when a coordinator env is present — verify the
    # detection logic without actually initializing (which would try to
    # bind a socket): monkeypatch jax.distributed.initialize.
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    assert maybe_initialize_distributed("auto") is True
    assert calls == [{}]
    # Idempotent: second call doesn't re-initialize.
    assert maybe_initialize_distributed("on") is True
    assert len(calls) == 1


def test_evaluate_accepts_globalized_batches():
    """evaluate() consumes global arrays (its logits/labels go through
    to_host_global) and produces the same metrics as host batches."""
    from aum_tpu.train import evaluate, make_eval_step

    cfg = AudioMambaConfig(
        depth=1, embed_dim=96, spectrogram_size=(128, 32), num_classes=3,
        d_state=8)
    model = AudioMamba(cfg, use_kernel=False)
    mesh = make_mesh(n_data=8, n_model=1)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((8, 32, 128)).astype(np.float32)
    y = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 8)]
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    eval_step = make_eval_step(model, mesh)
    m1, s1, _ = evaluate(eval_step, params,
                         [global_batch(mesh, {"x": x, "y": y})],
                         loss_type="CE", main_metric="acc")
    m2, s2, _ = evaluate(eval_step, params, [{"x": x, "y": y}],
                         loss_type="CE", main_metric="acc")
    np.testing.assert_allclose(s1, s2, rtol=1e-6)
    assert m1["acc"] == m2["acc"]


def test_two_process_multicontroller_smoke():
    """The REAL multi-process path: two OS processes, jax.distributed
    against a local coordinator, 4 CPU devices each (8 global), the jitted
    DP train step on a batch assembled from per-process shards, and the
    eval gather — scripts/smoke_multiprocess.py, exits 0 only when both
    controllers print the same finite loss."""
    import os
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                          "smoke_multiprocess.py")
    proc = subprocess.run(
        [sys.executable, script], capture_output=True, text=True,
        timeout=1500)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "multi-controller smoke OK" in proc.stdout


def test_ici_major_device_order_multi_slice():
    """DCN-aware mesh layout: 'model' groups must sit inside one slice so
    the mixers' per-token psums ride ICI; 'data' spans slices (DCN). The
    ordering function is tested with fake devices (real multi-slice
    hardware is not available here); single-slice devices degenerate to
    id order, leaving existing meshes unchanged."""
    import pytest

    from aum_tpu.parallel.mesh import _ici_major_order

    class Dev:
        def __init__(self, id, process_index, slice_index):
            self.id = id
            self.process_index = process_index
            self.slice_index = slice_index

        def __repr__(self):
            return f"d{self.id}"

    # Two slices x 4 devices, presented interleaved (worst case).
    devs = [Dev(i, process_index=i % 2, slice_index=i % 2) for i in range(8)]
    ordered = _ici_major_order(devs, n_model=2)
    # All of slice 0 first, then slice 1 — every consecutive pair (a
    # 'model' row after reshape) is same-slice.
    slices = [d.slice_index for d in ordered]
    assert slices == [0, 0, 0, 0, 1, 1, 1, 1]
    rows = np.asarray(ordered).reshape(4, 2)
    assert all(r[0].slice_index == r[1].slice_index for r in rows)

    # n_model that cannot fit inside a slice is rejected, not silently
    # spread over DCN.
    devs9 = [Dev(i, 0, 0) for i in range(3)] + [Dev(3 + i, 1, 1)
                                                for i in range(3)]
    with pytest.raises(ValueError, match="span DCN"):
        _ici_major_order(devs9, n_model=2)

    # Single-slice (slice_index None, e.g. CPU/1-slice TPU): id order.
    devs1 = [Dev(i, 0, None) for i in (3, 1, 2, 0)]
    assert [d.id for d in _ici_major_order(devs1, 1)] == [0, 1, 2, 3]
