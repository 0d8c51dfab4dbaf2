"""GSPMD partitioning rules for the Pallas scan ops (multi-chip kernel path).

The reference trains its CUDA `selective_scan` multi-GPU under DDP
(/root/reference/exps/audioset/aum-base_scratch-audioset.sh:52, accelerate
launch); here the equivalent is the custom_partitioning rules in
aum_tpu/ops/selective_scan.py (batch over 'data', d_inner over 'model') —
these tests run the *kernel* path (interpret mode on the virtual CPU mesh)
sharded over 8 devices and require bit-comparable results with the
single-device kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aum_tpu.ops import selective_scan
from aum_tpu.ops.selective_scan import selective_scan_dual


def _mesh():
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    return Mesh(devs, ("data", "model"))


def _args(key, bsz=8, l=40, d=256, n=8):
    ks = jax.random.split(key, 8)
    u = jax.random.normal(ks[0], (bsz, l, d), jnp.float32)
    delta = jax.random.normal(ks[1], (bsz, l, d), jnp.float32) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (d, n), jnp.float32) * 0.5)
    B = jax.random.normal(ks[3], (bsz, l, n), jnp.float32)
    C = jax.random.normal(ks[4], (bsz, l, n), jnp.float32)
    D = jax.random.normal(ks[5], (d,), jnp.float32)
    z = jax.random.normal(ks[6], (bsz, l, d), jnp.float32)
    db = jax.random.normal(ks[7], (d,), jnp.float32) * 0.3
    return (u, delta, A, B, C, D, z, db)


def _shard(mesh, args):
    u, delta, A, B, C, D, z, db = args
    seq = NamedSharding(mesh, P("data", None, "model"))
    bc = NamedSharding(mesh, P("data", None, None))
    dm = NamedSharding(mesh, P("model", None))
    vec = NamedSharding(mesh, P("model"))
    return (jax.device_put(u, seq), jax.device_put(delta, seq),
            jax.device_put(A, dm), jax.device_put(B, bc),
            jax.device_put(C, bc), jax.device_put(D, vec),
            jax.device_put(z, seq), jax.device_put(db, vec))


@pytest.mark.parametrize("reverse", [False, True])
def test_partitioned_forward_matches_single_device(reverse):
    args = _args(jax.random.PRNGKey(0))
    fn = jax.jit(lambda *a: selective_scan(
        *a, delta_softplus=True, reverse=reverse, use_kernel=True))
    ref = np.asarray(fn(*args))
    mesh = _mesh()
    with jax.set_mesh(mesh):
        out = np.asarray(fn(*_shard(mesh, args)))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_partitioned_grads_match_single_device():
    args = _args(jax.random.PRNGKey(1))

    def loss(*a):
        return jnp.sum(jnp.sin(selective_scan(
            *a, delta_softplus=True, use_kernel=True)))

    gfn = jax.jit(jax.grad(loss, argnums=tuple(range(8))))
    ref = [np.asarray(g) for g in gfn(*args)]
    mesh = _mesh()
    with jax.set_mesh(mesh):
        got = [np.asarray(g) for g in gfn(*_shard(mesh, args))]
    for name, r, g in zip("u delta A B C D z db".split(), ref, got):
        scale = np.abs(r).max() + 1e-30
        np.testing.assert_allclose(g / scale, r / scale, atol=5e-6,
                                   err_msg=f"grad {name}")


def test_partitioned_dual_grads_match_single_device():
    """The fused bidirectional op (the production path) under the mesh."""
    a_f = _args(jax.random.PRNGKey(2))
    a_r = _args(jax.random.PRNGKey(3))

    def pack(args):
        u, delta, A, B, C, D, z, db = args
        return (u, delta, A, B, C, D, z, db)

    def loss(*flat):
        f, r = flat[:8], flat[8:]
        yf, yr = selective_scan_dual(
            (f[0], f[1], f[2], f[3], f[4], f[5], f[6], f[7]),
            (r[0], r[1], r[2], r[3], r[4], r[5], r[6], r[7]))
        return jnp.sum(jnp.sin(yf + yr))

    gfn = jax.jit(jax.grad(loss, argnums=tuple(range(16))))
    ref = [np.asarray(g) for g in gfn(*pack(a_f), *pack(a_r))]
    mesh = _mesh()
    with jax.set_mesh(mesh):
        got = [np.asarray(g)
               for g in gfn(*_shard(mesh, a_f), *_shard(mesh, a_r))]
    for i, (r, g) in enumerate(zip(ref, got)):
        scale = np.abs(r).max() + 1e-30
        # atol 2e-5: the fused y-readout reassociates the C-contraction, so
        # sharded vs single-device sums differ by a few fp32 ulps.
        np.testing.assert_allclose(g / scale, r / scale, atol=2e-5,
                                   err_msg=f"dual grad #{i}")


def test_model_kernel_path_sharded_matches_single_device():
    """AudioMamba with use_kernel=True (interpret) DP+TP-sharded over 8
    virtual devices == the single-device kernel forward (VERDICT r1 #2)."""
    from aum_tpu.models import AudioMamba, AudioMambaConfig
    from aum_tpu.parallel import shard_params

    cfg = AudioMambaConfig(
        depth=2, embed_dim=128, spectrogram_size=(128, 64), num_classes=5,
        d_state=8, bimamba_type="v1", remat=False)
    model = AudioMamba(cfg, use_kernel=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 64, 128))
    params = model.init(jax.random.PRNGKey(1), x[:1])
    ref = np.asarray(jax.jit(model.apply)(params, x))

    mesh = _mesh()
    sp = shard_params(params, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    with jax.set_mesh(mesh):
        out = np.asarray(jax.jit(model.apply)(sp, xs))
    np.testing.assert_allclose(out, ref, rtol=3e-5, atol=3e-5)
