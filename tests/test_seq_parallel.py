"""Sequence-parallel selective scan vs the single-device oracle.

The reference is DDP-only (SURVEY.md §5 — no long-context strategy); this is
the repo's TPU-native extension: length sharded over a 'seq' mesh axis with a
(decay-product, end-state) carry exchange (aum_tpu/ops/seq_parallel.py).
Checks exactness of outputs, the global final state, and gradients through
the two-pass construction on a virtual 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aum_tpu.ops import make_sharded_scan, selective_scan_ref


def _inputs(key, bsz=2, l=64, d=16, n=4):
    ks = jax.random.split(key, 8)
    u = jax.random.normal(ks[0], (bsz, l, d))
    delta = jax.random.normal(ks[1], (bsz, l, d)) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (d, n)) * 0.3)
    B = jax.random.normal(ks[3], (bsz, l, n))
    C = jax.random.normal(ks[4], (bsz, l, n))
    D = jax.random.normal(ks[5], (d,))
    z = jax.random.normal(ks[6], (bsz, l, d))
    db = jax.random.normal(ks[7], (d,)) * 0.2
    return u, delta, A, B, C, D, z, db


def _mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("seq",))


@pytest.mark.parametrize("reverse", [False, True])
def test_seq_parallel_matches_oracle(reverse):
    mesh = _mesh()
    args = _inputs(jax.random.PRNGKey(0))
    f = make_sharded_scan(mesh, "seq", reverse=reverse, use_kernel=True,
                          interpret=True, d_block=8, l_chunk=8)
    out = jax.jit(f)(*args)
    ref = selective_scan_ref(*args, delta_softplus=True, reverse=reverse)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_seq_parallel_grads():
    mesh = _mesh()
    args = _inputs(jax.random.PRNGKey(1))
    f = make_sharded_scan(mesh, "seq", use_kernel=True, interpret=True,
                          d_block=8, l_chunk=8)

    def loss_sp(args):
        return jnp.sum(jnp.sin(f(*args)))

    def loss_ref(args):
        return jnp.sum(jnp.sin(selective_scan_ref(
            *args, delta_softplus=True)))

    gk = jax.jit(jax.grad(loss_sp))(args)
    gr = jax.grad(loss_ref)(args)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_seq_parallel_runs_sharded():
    """Outputs respect the length sharding end-to-end under jit."""
    mesh = _mesh()
    args = _inputs(jax.random.PRNGKey(2))
    f = make_sharded_scan(mesh, "seq", use_kernel=True, interpret=True,
                          d_block=8, l_chunk=8)
    seq_sharding = NamedSharding(mesh, P(None, "seq", None))
    u = jax.device_put(args[0], seq_sharding)
    out = jax.jit(f)(u, *args[1:])
    assert out.sharding.is_equivalent_to(seq_sharding, out.ndim)


def _mesh3():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]).reshape(2, 2, 2),
                ("data", "seq", "model"))


def test_sharded_scan_in_jit_composes_with_dp_tp():
    """ops/seq_parallel.py::sharded_scan_in_jit — manual over 'seq' only,
    with 'data'/'model' placements left to GSPMD — is exact for fwd,
    reverse, and grads, including the L % n_seq != 0 padding path
    (L=63 over 4 seq shards)."""
    from aum_tpu.ops.seq_parallel import sharded_scan_in_jit

    mesh = _mesh3()
    u, delta, A, B, C, D, z, db = _inputs(jax.random.PRNGKey(5), l=63)
    ref = selective_scan_ref(u, delta, A, B, C, D, z, db,
                             delta_softplus=True)
    ref_r = selective_scan_ref(u, delta, A, B, C, D, z, db,
                               delta_softplus=True, reverse=True)

    def put(a):
        spec = {3: P("data", None, "model") if a.shape[-1] == u.shape[-1]
                else P("data", None, None),
                2: P("model", None), 1: P("model")}[a.ndim]
        return jax.device_put(a, NamedSharding(mesh, spec))

    args = tuple(put(a) for a in (u, delta, A, B, C, D, z, db))

    def f(reverse):
        return lambda *a: sharded_scan_in_jit(
            *a, axis="seq", reverse=reverse, use_kernel=True,
            interpret=True, d_block=8, l_chunk=8)

    with jax.set_mesh(mesh):
        out = jax.jit(f(False))(*args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        out_r = jax.jit(f(True))(*args)
        np.testing.assert_allclose(np.asarray(out_r), np.asarray(ref_r),
                                   rtol=2e-5, atol=2e-5)
        g = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.sin(f(False)(*a)))))(
            *args)
        gref = jax.grad(lambda *a: jnp.sum(jnp.sin(selective_scan_ref(
            *a, delta_softplus=True))))(u, delta, A, B, C, D, z, db)
        s = np.abs(np.asarray(gref)).max() + 1e-30
        np.testing.assert_allclose(np.asarray(g) / s, np.asarray(gref) / s,
                                   atol=5e-6)


def test_model_seq_parallel_matches_unsharded():
    """AudioMamba(seq_axis='seq') on the data x seq x model mesh == the
    plain model's logits with the same params (the framework wiring,
    VERDICT r3 #5). Token count 8*8+1=65 exercises the padding path."""
    from aum_tpu.models import AudioMamba, AudioMambaConfig
    from aum_tpu.parallel import shard_params

    mesh = _mesh3()
    cfg = AudioMambaConfig(
        depth=2, embed_dim=128, spectrogram_size=(128, 128), num_classes=5,
        d_state=8, bimamba_type="v2", remat=False)
    plain = AudioMamba(cfg, use_kernel=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 128, 128))
    params = plain.init(jax.random.PRNGKey(1), x[:1])
    ref = np.asarray(jax.jit(plain.apply)(params, x))

    sp_model = AudioMamba(cfg, use_kernel=True, seq_axis="seq")
    sharded = shard_params(params, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    with jax.set_mesh(mesh):
        out = np.asarray(jax.jit(sp_model.apply)(sharded, xs))
    np.testing.assert_allclose(out, ref, rtol=4e-5, atol=4e-5)


def test_train_step_loss_equality_seq_parallel():
    """ONE full train step (loss + grads + Adam update) with the mixers'
    scans sequence-parallel over 'seq' on the 2x2x2 mesh equals the
    unsharded step's loss and updated params."""
    import optax

    from aum_tpu.models import AudioMamba, AudioMambaConfig
    from aum_tpu.train import TrainHyperParams, make_optimizer
    from aum_tpu.train.loop import (
        AugmentConfig,
        init_train_state,
        make_train_step,
    )

    mesh = _mesh3()
    cfg = AudioMambaConfig(
        depth=2, embed_dim=128, spectrogram_size=(128, 128), num_classes=5,
        d_state=8, bimamba_type="v2", remat=False)
    tx = make_optimizer(TrainHyperParams(lr=1e-3, n_epochs=2),
                        steps_per_epoch=4)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 128, 128))
    y = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(3), (4,), 0, 5), 5)
    batch = {"x": x, "y": y}
    rng = jax.random.PRNGKey(4)

    plain = AudioMamba(cfg, use_kernel=True)
    state0 = init_train_state(plain, tx, jax.random.PRNGKey(5), x[:1])
    step0 = make_train_step(plain, tx, None, loss_type="CE",
                            augment=AugmentConfig(), donate=False)
    s_ref, loss_ref = step0(state0, batch, rng)

    sp_model = AudioMamba(cfg, use_kernel=True, seq_axis="seq")
    with jax.set_mesh(mesh):
        state1 = init_train_state(plain, tx, jax.random.PRNGKey(5), x[:1],
                                  mesh=mesh)
        step1 = make_train_step(sp_model, tx, mesh, loss_type="CE",
                                augment=AugmentConfig(), donate=False)
        s_sp, loss_sp = step1(state1, batch, rng)
        np.testing.assert_allclose(float(loss_sp), float(loss_ref),
                                   rtol=2e-6)
        for (pa, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(s_ref.params)[0],
                jax.tree_util.tree_flatten_with_path(s_sp.params)[0]):
            sc = np.abs(np.asarray(a)).max() + 1e-30
            np.testing.assert_allclose(
                np.asarray(b) / sc, np.asarray(a) / sc, atol=2e-6,
                err_msg=str(pa))


@pytest.mark.parametrize("bimamba_type", ["none", "v1"])
def test_model_seq_parallel_other_variants(bimamba_type):
    """seq_axis through the Fo-Fo (single-direction) and Fo-Bi (shared-
    activation reverse) mixer variants — the non-v2 scan dispatches."""
    from aum_tpu.models import AudioMamba, AudioMambaConfig
    from aum_tpu.parallel import shard_params

    mesh = _mesh3()
    cfg = AudioMambaConfig(
        depth=2, embed_dim=128, spectrogram_size=(128, 64), num_classes=5,
        d_state=8, bimamba_type=bimamba_type, remat=False)
    plain = AudioMamba(cfg, use_kernel=True)
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 64, 128))
    params = plain.init(jax.random.PRNGKey(7), x[:1])
    ref = np.asarray(jax.jit(plain.apply)(params, x))
    sp = AudioMamba(cfg, use_kernel=True, seq_axis="seq")
    sharded = shard_params(params, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    with jax.set_mesh(mesh):
        out = np.asarray(jax.jit(sp.apply)(sharded, xs))
    np.testing.assert_allclose(out, ref, rtol=4e-5, atol=4e-5)
