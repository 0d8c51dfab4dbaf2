"""A/B the Pallas conv kernel vs the XLA pad-once form on the real TPU.

Same robust timing as sweep_scan.py (chained iterations, difference of two
loop lengths, min-of-two).
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from aum_tpu.ops.conv1d import causal_conv1d, causal_conv1d_xla
from sweep_scan import timed  # noqa: E402


if __name__ == "__main__":
    bsz, l, d = (int(x) for x in (sys.argv[1:4] or [64, 513, 1536]))
    for dtype in [jnp.bfloat16, jnp.float32]:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        x = jax.random.normal(ks[0], (bsz, l, d), dtype)
        w = (jax.random.normal(ks[1], (d, 4)) * 0.5).astype(dtype)
        b = (jax.random.normal(ks[2], (d,)) * 0.2).astype(dtype)
        for rev in (False, True):
            t_xla = timed(lambda x, w, b: causal_conv1d_xla(
                x, w, b, "silu", rev), x, w, b)
            t_ker = timed(lambda x, w, b: causal_conv1d(
                x, w, b, "silu", rev, use_kernel=True), x, w, b)
            print(f"{dtype.__name__} rev={rev}: xla {t_xla*1e3:.3f} ms  "
                  f"kernel {t_ker*1e3:.3f} ms  "
                  f"({t_xla/max(t_ker,1e-12):.2f}x)", flush=True)
