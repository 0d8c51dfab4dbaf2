"""Pallas causal-conv kernel vs the XLA pad-once form.

The XLA form is itself oracle-tested in tests/test_ops.py against a numpy
direct convolution (reference semantics: causal_conv1d_cuda,
mamba_simple.py:271-280); here the kernel path (interpret mode on CPU) must
match it — forward and all grads, both directions, with and without bias.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aum_tpu.ops.conv1d import causal_conv1d, causal_conv1d_xla


def _inputs(key, b, l, d, k, dtype):
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (b, l, d), dtype)
    w = (jax.random.normal(ks[1], (d, k), jnp.float32) * 0.5).astype(dtype)
    bias = (jax.random.normal(ks[2], (d,), jnp.float32) * 0.2).astype(dtype)
    return x, w, bias


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("shape", [(2, 64, 128), (3, 35, 24)])
def test_conv_kernel_forward_matches_xla(reverse, shape):
    b, l, d = shape
    x, w, bias = _inputs(jax.random.PRNGKey(0), b, l, d, 4, jnp.float32)
    ref = causal_conv1d_xla(x, w, bias, activation="silu", reverse=reverse)
    got = causal_conv1d(x, w, bias, activation="silu", reverse=reverse,
                        use_kernel=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("activation", ["silu", None])
def test_conv_kernel_grads_match_xla(reverse, activation):
    x, w, bias = _inputs(jax.random.PRNGKey(1), 2, 48, 16, 4, jnp.float32)

    def loss(fn):
        def f(x, w, bias):
            out = fn(x, w, bias)
            return jnp.sum(out * jnp.cos(out.astype(jnp.float32)))
        return f

    ref_fn = loss(lambda x, w, b: causal_conv1d_xla(
        x, w, b, activation=activation, reverse=reverse))
    got_fn = loss(lambda x, w, b: causal_conv1d(
        x, w, b, activation=activation, reverse=reverse,
        use_kernel=True, interpret=True))
    ref = jax.grad(ref_fn, argnums=(0, 1, 2))(x, w, bias)
    got = jax.grad(got_fn, argnums=(0, 1, 2))(x, w, bias)
    for name, r, g in zip("x w bias".split(), ref, got):
        scale = np.abs(np.asarray(r)).max() + 1e-30
        np.testing.assert_allclose(np.asarray(g) / scale,
                                   np.asarray(r) / scale, atol=2e-6,
                                   err_msg=f"grad {name}")


def test_conv_kernel_no_bias_bf16():
    # The kernel computes in f32 for bf16 inputs (cheap sublane shifts,
    # see _conv_kernel); compare against the f32 XLA form at bf16 rounding
    # tolerance rather than the bf16-accumulated XLA form.
    x, w, _ = _inputs(jax.random.PRNGKey(2), 2, 40, 128, 4, jnp.bfloat16)
    ref = causal_conv1d_xla(x.astype(jnp.float32), w.astype(jnp.float32),
                            None, activation="silu")
    got = causal_conv1d(x, w, None, activation="silu",
                        use_kernel=True, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=4e-2, rtol=4e-2)


def test_conv_kernel_partitioned_matches_single_device():
    """Sharded (batch over 'data', channels over 'model') == unsharded."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    x, w, bias = _inputs(jax.random.PRNGKey(3), 8, 33, 256, 4, jnp.float32)
    ref = causal_conv1d(x, w, bias, use_kernel=True, interpret=True)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("data", "model"))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, "model")))
    ws = jax.device_put(w, NamedSharding(mesh, P("model", None)))
    bs = jax.device_put(bias, NamedSharding(mesh, P("model")))

    @jax.jit
    def run(x, w, b):
        return causal_conv1d(x, w, b, use_kernel=True, interpret=True)

    got = run(xs, ws, bs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    # Grads through the partitioned op (XLA-form backward under GSPMD).
    def l(fn_args):
        return jnp.sum(causal_conv1d(*fn_args, use_kernel=True,
                                     interpret=True) ** 2)

    gref = jax.grad(l)((x, w, bias))
    ggot = jax.jit(jax.grad(l))((xs, ws, bs))
    for r, g in zip(gref, ggot):
        scale = np.abs(np.asarray(r)).max() + 1e-30
        np.testing.assert_allclose(np.asarray(g) / scale,
                                   np.asarray(r) / scale, atol=1e-5)
