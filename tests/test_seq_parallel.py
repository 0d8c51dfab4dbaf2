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
