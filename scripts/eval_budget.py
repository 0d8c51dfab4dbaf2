"""Per-component millisecond budget of one eval step (VERDICT r4 #1).

Decomposes the B=64 AuM-Base Fo-Bi bf16 eval step (the bench.py shape,
~153 ms at the recorded 417-425 clips/s floor) into measured parts:

  full       the whole model forward (the bench computation)
  noscan     the model with the selective scan replaced by a shape-correct
             surrogate (AUM_SCAN_BYPASS=1, models/mamba.py::_scan_bypass)
             that consumes every scan input at ~HBM-floor cost, so the
             projections feeding the scan are NOT dead-coded
  scan_op    one dual-scan kernel at the layer shape (B=64, L=513, D=1536,
             N=16), standalone; x24 = the stack's kernel share
  matmuls    the per-layer projection chain standalone (in_proj x/z,
             x_proj, dt_proj, out_proj at model shapes, bf16)
  conv       the depthwise causal conv pair at the layer shape
  norms      fused add+RMS-norm at (64, 513, 768) fp32-residual

Identity checked: full - noscan + 24*surrogate_floor ~= 24*scan_op, and
noscan ~= 24*(matmuls + conv + norms + surrogate) + stem/head remainder.
Each mode runs in its OWN process (env knobs are trace-time; the jitted
ops are lru_cached per process): `--all` spawns the single-mode runs
serially and prints the combined table.

Timing: every number uses the repo's robust harness — N iterations chained
inside ONE jit by a data dependence, fresh inputs per call, per-iteration
time from the difference of two loop lengths, min of two runs each
(CLAUDE.md "Timing"). Run on-chip: python scripts/eval_budget.py --all
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, L, D_MODEL, D_INNER, N, DEPTH = 64, 513, 768, 1536, 16, 24
DT_RANK = 48


_ITERS = 8  # set from --iters in main(); modes read it via timed_chain


def timed_chain(build_fn, iters=None):
    """build_fn() -> (step, x0, consts); step(consts, x) -> x-like carry.

    All big arrays ride as jit ARGUMENTS (consts), never closure constants —
    closure constants get serialized into the remote-compile payload and
    blow the relay's HTTP 413 limit (CLAUDE.md gotcha). Returns ms/iter via
    the difference-of-chain-lengths harness.
    """
    iters = iters or _ITERS
    import jax
    import jax.numpy as jnp

    step, x0, consts = build_fn()

    def many_simple(consts, x, n):
        def body(_, c):
            return step(consts, c)

        out = jax.lax.fori_loop(0, n, body, x)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.mean(l.astype(jnp.float32)) for l in leaves)

    run = jax.jit(many_simple, static_argnums=2)
    n_s, n_l = max(iters // 3, 1), iters
    for n in (n_s, n_l):
        float(run(consts, jax.tree.map(lambda a: a + 0.001, x0), n))

    def t(n, off):
        xs = jax.tree.map(lambda a: a + off, x0)
        t0 = time.perf_counter()
        float(run(consts, xs, n))
        return time.perf_counter() - t0

    ts = min(t(n_s, 0.01), t(n_s, 0.02))
    tl = min(t(n_l, 0.03), t(n_l, 0.04))
    return max(tl - ts, 1e-9) / (n_l - n_s) * 1e3


def mode_full():
    import jax
    import jax.numpy as jnp

    from aum_tpu.models import AudioMamba, AudioMambaConfig

    cfg = AudioMambaConfig.from_variant(
        "base", "Fo-Bi", num_classes=527, dtype="bfloat16")
    model = AudioMamba(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 1024, 128), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])

    def build():
        def step(params, c):
            out = model.apply(params, c)
            return c + jnp.mean(out).astype(c.dtype) * 1e-12

        return step, x, params

    return timed_chain(build)


def mode_scan_op():
    import jax
    import jax.numpy as jnp

    from aum_tpu.ops.selective_scan import selective_scan_dual

    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    bf = jnp.bfloat16

    def args_of(k):
        # Match the IN-MODEL operand configuration exactly: delta is the
        # bf16 dt_proj output (mamba.py pre_fn) — _prep streams dt "in
        # delta's place (identical bytes)", so an fp32 delta here would
        # double the dt HBM stream per direction vs what the model runs.
        kk = jax.random.split(k, 8)
        return (
            jax.random.normal(kk[0], (B, L, D_INNER), bf),          # u
            (jax.random.normal(kk[1], (B, L, D_INNER), bf) * 0.5
             - 4.0).astype(bf),                                     # delta
            -jnp.exp(jax.random.normal(kk[2], (D_INNER, N)) * 0.3), # A
            jax.random.normal(kk[3], (B, L, N), bf),                # B
            jax.random.normal(kk[4], (B, L, N), bf),                # C
            jax.random.normal(kk[5], (D_INNER,)),                   # D
            jax.random.normal(kk[6], (B, L, D_INNER), bf),          # z
            None,                                                   # dt_bias
        )

    args_f, args_r = args_of(ks[0]), args_of(ks[1])

    def build():
        def step(consts, c):
            a_f, a_r = consts
            # Chain the data dependence through the SMALL (B, L, N) input
            # and read back only output slices: the extra per-iteration HBM
            # work must not be charged to the kernel (the full (B, L, D)
            # carry-add + full-output means in the first version of this
            # leg cost ~0.8 ms/iter on their own).
            bm = a_f[3] + c.astype(jnp.bfloat16)
            af = a_f[:3] + (bm,) + a_f[4:]
            y_f, y_b = selective_scan_dual(af, a_r)
            dep = jnp.mean(y_f[:, :4].astype(jnp.float32)) \
                + jnp.mean(y_b[:, :4].astype(jnp.float32))
            return c + dep.astype(c.dtype) * 1e-12

        return step, jnp.zeros((), jnp.bfloat16), (args_f, args_r)

    return timed_chain(build)


def mode_matmuls():
    import jax
    import jax.numpy as jnp

    bf = jnp.bfloat16
    k = jax.random.split(jax.random.PRNGKey(2), 8)
    h = jax.random.normal(k[0], (B, L, D_MODEL), bf)
    w_x = jax.random.normal(k[1], (D_MODEL, D_INNER), bf) * 0.02
    w_z = jax.random.normal(k[2], (D_MODEL, D_INNER), bf) * 0.02
    w_xp = jax.random.normal(k[3], (D_INNER, DT_RANK + 2 * N), bf) * 0.02
    w_dt = jax.random.normal(k[4], (DT_RANK, D_INNER), bf) * 0.02
    w_out = jax.random.normal(k[5], (D_INNER, D_MODEL), bf) * 0.02

    def build():
        def step(consts, c):
            w_x, w_z, w_xp, w_dt, w_out = consts
            u = c @ w_x
            z = c @ w_z
            xdb = u @ w_xp
            dt = xdb[..., :DT_RANK] @ w_dt
            y = (u * jax.nn.sigmoid(z) + dt) @ w_out
            return c + y * jnp.asarray(1e-12, bf)

        return step, h, (w_x, w_z, w_xp, w_dt, w_out)

    return timed_chain(build)


def mode_conv():
    import jax
    import jax.numpy as jnp

    from aum_tpu.ops import causal_conv1d

    k = jax.random.split(jax.random.PRNGKey(3), 3)
    u = jax.random.normal(k[0], (B, L, D_INNER), jnp.bfloat16)
    w = jax.random.normal(k[1], (D_INNER, 4), jnp.bfloat16) * 0.2
    bias = jax.random.normal(k[2], (D_INNER,), jnp.bfloat16) * 0.1

    def build():
        def step(consts, c):
            w, bias = consts
            y = causal_conv1d(c, w, bias, activation="silu")
            return c + y * jnp.asarray(1e-12, jnp.bfloat16)

        return step, u, (w, bias)

    return timed_chain(build)


def mode_norms():
    import jax
    import jax.numpy as jnp

    from aum_tpu.ops import fused_add_norm

    k = jax.random.split(jax.random.PRNGKey(4), 3)
    h = jax.random.normal(k[0], (B, L, D_MODEL), jnp.bfloat16)
    res = jax.random.normal(k[1], (B, L, D_MODEL), jnp.float32)
    w = 1.0 + jax.random.normal(k[2], (D_MODEL,), jnp.bfloat16) * 0.02

    def build():
        def step(consts, c):
            res, w = consts
            out, new_res = fused_add_norm(
                c, w, None, residual=res, prenorm=True,
                residual_in_fp32=True, norm_type="rms")
            return c + out * jnp.asarray(1e-12, jnp.bfloat16)

        return step, h, (res, w)

    return timed_chain(build)


def mode_surrogate():
    """The bypass surrogate standalone — so noscan can be corrected for it."""
    import jax
    import jax.numpy as jnp

    from aum_tpu.models.mamba import _scan_bypass

    bf = jnp.bfloat16

    def args_of(key):
        k = jax.random.split(key, 7)
        return (
            jax.random.normal(k[0], (B, L, D_INNER), bf),
            jax.random.normal(k[1], (B, L, D_INNER), bf),
            -jnp.exp(jax.random.normal(k[2], (D_INNER, N)) * 0.3),
            jax.random.normal(k[3], (B, L, N), bf),
            jax.random.normal(k[4], (B, L, N), bf),
            jax.random.normal(k[5], (D_INNER,)),
            jax.random.normal(k[6], (B, L, D_INNER), bf),
            None,
        )

    args = (args_of(jax.random.PRNGKey(5)), args_of(jax.random.PRNGKey(6)))

    def build():
        def step(consts, c):
            # Chain through the small (B, L, N) input. The two bypasses
            # (= the Fo-Bi pair) take DISTINCT operand sets, as the model's
            # two directions do — identical inputs would be CSE'd into one.
            # The readout is a FULL mean: the bypass is transparent jnp (not
            # an opaque kernel), so a sliced readout lets XLA dead-code all
            # but the sliced rows of the whole elementwise chain (measured:
            # 0.000 ms). The full mean fuses into the bypass's single output
            # pass, so it adds no extra traversal.
            a_f, a_r = consts
            a = a_f[:3] + (a_f[3] + c,) + a_f[4:]
            a2 = a_r[:3] + (a_r[3] + c,) + a_r[4:]
            y = _scan_bypass(a)
            y2 = _scan_bypass(a2)
            dep = jnp.mean(y.astype(jnp.float32)) \
                + jnp.mean(y2.astype(jnp.float32))
            return c + dep.astype(c.dtype) * 1e-12

        return step, jnp.zeros((), jnp.bfloat16), args

    return timed_chain(build)


MODES = {
    "full": mode_full,
    "noscan": mode_full,   # same computation; env does the ablation
    "scan_op": mode_scan_op,
    "matmuls": mode_matmuls,
    "conv": mode_conv,
    "norms": mode_norms,
    "surrogate": mode_surrogate,
}

# Per-mode chain lengths: sub-ms legs need LONG chains — at 8 iters the
# 6-iteration length difference carries only ~2 ms of signal against
# relay dispatch noise (measured run-to-run swings of 2-6x on norms/conv).
# 96 iters puts ~30 ms of signal behind each sub-ms number.
MODE_ITERS = {
    "full": 8, "noscan": 8, "scan_op": 24,
    "matmuls": 96, "conv": 96, "norms": 96, "surrogate": 96,
}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--mode", choices=sorted(MODES), default=None)
    p.add_argument("--all", action="store_true")
    p.add_argument("--iters", type=int, default=None,
                   help="chain length override (default: per-mode "
                        "MODE_ITERS)")
    args = p.parse_args(argv)

    if args.all:
        results = {}
        for mode in ("full", "noscan", "scan_op", "matmuls", "conv",
                     "norms", "surrogate"):
            env = dict(os.environ)
            if mode == "noscan":
                env["AUM_SCAN_BYPASS"] = "1"
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--mode", mode,
                 "--iters", str(args.iters or MODE_ITERS[mode])],
                # No timeout: killing a TPU client (even mid-compile) wedges
                # the remote lease for 30+ min (CLAUDE.md). The relay itself
                # fails starved clients after ~25 min.
                env=env, capture_output=True, text=True)
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("{")]
            if not line:
                print(f"mode {mode} FAILED:\n{out.stdout[-2000:]}"
                      f"{out.stderr[-2000:]}")
                return 1
            results[mode] = json.loads(line[-1])["ms"]
            print(f"{mode}: {results[mode]:.3f} ms")
        scan_insitu = results["full"] - results["noscan"] \
            + DEPTH * results["surrogate"]
        layer_other = results["matmuls"] + results["conv"] + results["norms"]
        print(json.dumps({
            "full_ms": round(results["full"], 2),
            "noscan_ms": round(results["noscan"], 2),
            "scan_insitu_ms": round(scan_insitu, 2),
            "scan_op_x24_ms": round(DEPTH * results["scan_op"], 2),
            "scan_op_ms_per_layer": round(results["scan_op"], 3),
            "matmuls_x24_ms": round(DEPTH * results["matmuls"], 2),
            "conv_x24_ms": round(DEPTH * results["conv"], 2),
            "norms_x24_ms": round(DEPTH * results["norms"], 2),
            "surrogate_x24_ms": round(DEPTH * results["surrogate"], 2),
            "stem_head_dispatch_ms": round(
                results["noscan"] - DEPTH * (layer_other
                                             + results["surrogate"]), 2),
            "identity_gap_ms": round(
                scan_insitu - DEPTH * results["scan_op"], 2),
        }))
        return 0

    if not args.mode:
        print("need --mode or --all")
        return 2
    global _ITERS
    _ITERS = args.iters or MODE_ITERS[args.mode]
    if args.mode == "noscan":
        # Standalone runs must get the ablation too, not just --all's
        # subprocesses — the knob is read at trace time, and jax has not
        # been imported yet here.
        os.environ["AUM_SCAN_BYPASS"] = "1"
    ms = MODES[args.mode]()
    print(json.dumps({"mode": args.mode, "ms": ms}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
