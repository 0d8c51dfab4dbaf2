"""Pallas selective-scan kernel vs the sequential jnp oracle.

Mirrors the reference's oracle-based test strategy (SURVEY.md §4): the CUDA
kernels there are checked against `selective_scan_ref`; here the Pallas kernel
is checked against the jnp port of that oracle, forward and backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aum_tpu.ops import selective_scan, selective_scan_ref


def _make_inputs(key, bsz=2, l=37, d=24, n=8, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    u = jax.random.normal(ks[0], (bsz, l, d), dtype)
    delta = jax.random.normal(ks[1], (bsz, l, d), dtype) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (d, n), jnp.float32) * 0.5)
    B = jax.random.normal(ks[3], (bsz, l, n), dtype)
    C = jax.random.normal(ks[4], (bsz, l, n), dtype)
    D = jax.random.normal(ks[5], (d,), jnp.float32)
    z = jax.random.normal(ks[6], (bsz, l, d), dtype)
    delta_bias = jax.random.normal(ks[7], (d,), jnp.float32) * 0.3
    return u, delta, A, B, C, D, z, delta_bias


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize(
    "shape", [(2, 37, 24, 8), (1, 128, 128, 16), (2, 65, 48, 16)])
def test_forward_matches_oracle(reverse, shape):
    bsz, l, d, n = shape
    args = _make_inputs(jax.random.PRNGKey(0), bsz, l, d, n)
    ref = selective_scan_ref(*args, delta_softplus=True, reverse=reverse)
    out = selective_scan(*args, delta_softplus=True, reverse=reverse,
                         d_block=8, l_chunk=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("reverse", [False, True])
def test_grads_match_oracle(reverse):
    args = _make_inputs(jax.random.PRNGKey(1), bsz=2, l=37, d=24, n=8)

    def loss_ref(*a):
        out = selective_scan_ref(*a, delta_softplus=True, reverse=reverse)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    def loss_ker(*a):
        out = selective_scan(*a, delta_softplus=True, reverse=reverse,
                             d_block=8, l_chunk=16)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    g_ref = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    g_ker = jax.grad(loss_ker, argnums=tuple(range(8)))(*args)
    names = ["u", "delta", "A", "B", "C", "D", "z", "delta_bias"]
    for name, gr, gk in zip(names, g_ref, g_ker):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gr), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name}")


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_forward_random_shapes(seed):
    """Property-style sweep over odd lengths / channel counts / tilings —
    exercises the overhang-masking and tile-selection edges (chunk >,=,<
    L; d_block dividing and not dividing the d-tile target; N pad)."""
    rng = np.random.RandomState(seed + 100)
    bsz = int(rng.choice([1, 2, 3]))
    l = int(rng.randint(9, 120))
    d = int(rng.choice([8, 16, 24, 40]))
    n = int(rng.choice([4, 8, 16]))
    l_chunk = int(rng.choice([8, 16, 48]))
    reverse = bool(rng.randint(2))
    args = _make_inputs(jax.random.PRNGKey(seed), bsz, l, d, n)
    ref = selective_scan_ref(*args, delta_softplus=True, reverse=reverse)
    out = selective_scan(*args, delta_softplus=True, reverse=reverse,
                         d_block=8, l_chunk=l_chunk)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5,
        err_msg=f"shape=({bsz},{l},{d},{n}) l_chunk={l_chunk} rev={reverse}")


def test_reverse_equals_flip_scan_flip():
    args = _make_inputs(jax.random.PRNGKey(2))
    u, delta, A, B, C, D, z, db = args
    rev = selective_scan(u, delta, A, B, C, D, z, db, delta_softplus=True,
                         reverse=True, d_block=8, l_chunk=16)
    flipped = selective_scan_ref(
        u[:, ::-1], delta[:, ::-1], A, B[:, ::-1], C[:, ::-1], D, z[:, ::-1],
        db, delta_softplus=True)[:, ::-1]
    np.testing.assert_allclose(np.asarray(rev), np.asarray(flipped),
                               rtol=2e-5, atol=2e-5)


def test_bf16_inputs():
    args = _make_inputs(jax.random.PRNGKey(3), dtype=jnp.bfloat16)
    ref = selective_scan_ref(*args, delta_softplus=True)
    out = selective_scan(*args, delta_softplus=True, d_block=8, l_chunk=16)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2)


def test_fallback_no_z():
    u, delta, A, B, C, D, _, db = _make_inputs(jax.random.PRNGKey(4))
    out = selective_scan(u, delta, A, B, C, D, None, db, delta_softplus=True)
    ref = selective_scan_ref(u, delta, A, B, C, D, None, db,
                             delta_softplus=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_kernel_no_softplus():
    """delta_softplus=False now runs on the kernel path (softplus is hoisted
    out of the kernels entirely — see _prep); fwd and grads must match."""
    u, delta, A, B, C, D, z, _ = _make_inputs(jax.random.PRNGKey(5))
    dpos = jnp.abs(delta) + 0.05  # positive dt, as a raw-dt caller would use

    def loss_k(dpos):
        return jnp.sum(jnp.sin(selective_scan(
            u, dpos, A, B, C, D, z, None, delta_softplus=False,
            use_kernel=True, d_block=8, l_chunk=16)))

    def loss_r(dpos):
        return jnp.sum(jnp.sin(selective_scan_ref(
            u, dpos, A, B, C, D, z, None, delta_softplus=False)))

    np.testing.assert_allclose(float(loss_k(dpos)), float(loss_r(dpos)),
                               rtol=1e-5)
    gk = jax.grad(loss_k)(dpos)
    gr = jax.grad(loss_r)(dpos)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               rtol=2e-4, atol=2e-4)


def test_choose_l_fallback_is_8_aligned():
    """Env-knob chunk targets that defeat the divisor search must still
    yield Mosaic-legal (8-aligned) chunks (regression: target 52 at L=513
    used to return chunk 52 → lowering rejects the block shape)."""
    from aum_tpu.ops.selective_scan import _choose_l

    for l in (513, 127, 1000):
        for target in (52, 20, 60, 100):
            pad, c = _choose_l(l, target)
            assert c % 8 == 0, (l, target, c)
            assert pad % c == 0 and pad >= l, (l, target, pad, c)


def test_lchunk_exact_pin(monkeypatch):
    """AUM_SCAN_LCHUNK_EXACT pins the chunk (8-rounded) regardless of
    overhang waste, and the kernel stays exact with the larger overhang
    (e.g. 176 at L=37: one chunk, 139 invalid tail steps)."""
    from aum_tpu.ops.selective_scan import _choose_l, selective_scan_dual

    monkeypatch.setenv("AUM_SCAN_LCHUNK_EXACT", "176")
    pad, c = _choose_l(513, 104)
    assert c == 176 and pad == 528
    pad, c = _choose_l(37, 104)
    assert c == 176 and pad == 176
    monkeypatch.setenv("AUM_SCAN_LCHUNK_EXACT", "52")
    _, c = _choose_l(513, 104)
    assert c == 56  # 8-rounded

    args_f = _make_inputs(jax.random.PRNGKey(11), bsz=2, l=37, d=24, n=8)
    monkeypatch.setenv("AUM_SCAN_LCHUNK_EXACT", "176")
    yf, yr = selective_scan_dual(args_f, args_f, d_block=8, l_chunk=104)
    rf = selective_scan_ref(*args_f, delta_softplus=True)
    rr = selective_scan_ref(*args_f, delta_softplus=True, reverse=True)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(rf),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(rr),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("knob", ["AUM_SCAN_BWD_XMINUS", "AUM_SCAN_BWD_DBU"])
def test_bwd_dla_variant_grads_match_default(knob, monkeypatch):
    """The measured-negative dla-form variants (ROOFLINE.md 'Backward'
    round-6 addendum) stay oracle-exact: xminus (recurrence-identity
    pass-merge) and dbu (epilogue-dBu concat removal) must reproduce the
    default xprev form's grads exactly-ish, so the A/B knobs keep
    measuring the same math."""
    from aum_tpu.ops.selective_scan import selective_scan

    u, delta, A, B, C, D, z, bias = _make_inputs(
        jax.random.PRNGKey(11), bsz=2, l=37, d=24, n=8)

    def loss(*flat):
        y = selective_scan(*flat, delta_softplus=True, d_block=8, l_chunk=16,
                           use_kernel=True)
        return jnp.sum(jnp.cos(y))

    gfn = jax.grad(loss, argnums=tuple(range(8)))
    monkeypatch.delenv(knob, raising=False)
    ref = [np.asarray(g) for g in gfn(u, delta, A, B, C, D, z, bias)]
    monkeypatch.setenv(knob, "1")
    got = [np.asarray(g) for g in gfn(u, delta, A, B, C, D, z, bias)]
    for i, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(g, r, rtol=2e-5, atol=2e-5,
                                   err_msg=f"{knob} grad #{i}")


@pytest.mark.parametrize("fused", ["0", "1"])
def test_bwd_bf16_partials_runs_and_tracks_oracle(fused, monkeypatch):
    """AUM_SCAN_BWD_BF16_PARTIALS=1 (measured: no timing gain AND a
    precision kill at production shapes — default off) must still lower
    and produce grads that TRACK fp32 at bf16-rounding tolerance, in both
    the chunk-vectorized and the fused-loop (AUM_SCAN_BWD_FUSED=1)
    backward — the fused kernel's partial stores need an explicit cast to
    the bf16 refs."""
    from aum_tpu.ops.selective_scan import selective_scan

    u, delta, A, B, C, D, z, bias = _make_inputs(
        jax.random.PRNGKey(12), bsz=2, l=37, d=24, n=8)

    def loss(*flat):
        y = selective_scan(*flat, delta_softplus=True, d_block=8, l_chunk=16,
                           use_kernel=True)
        return jnp.sum(jnp.cos(y))

    gfn = jax.grad(loss, argnums=tuple(range(8)))
    monkeypatch.setenv("AUM_SCAN_BWD_FUSED", fused)
    monkeypatch.delenv("AUM_SCAN_BWD_BF16_PARTIALS", raising=False)
    ref = [np.asarray(g) for g in gfn(u, delta, A, B, C, D, z, bias)]
    monkeypatch.setenv("AUM_SCAN_BWD_BF16_PARTIALS", "1")
    got = [np.asarray(g) for g in gfn(u, delta, A, B, C, D, z, bias)]
    for i, (r, g) in enumerate(zip(ref, got)):
        if i in (3, 4):  # dB, dC: flow through the bf16 partial stores
            np.testing.assert_allclose(g, r, rtol=5e-2, atol=5e-2,
                                       err_msg=f"grad #{i} (bf16 partial)")
        else:
            np.testing.assert_allclose(g, r, rtol=2e-5, atol=2e-5,
                                       err_msg=f"grad #{i}")


@pytest.mark.parametrize("shared", [True, False])
def test_dual_scan_matches_two_single_scans(shared):
    from aum_tpu.ops.selective_scan import selective_scan_dual

    args_f = _make_inputs(jax.random.PRNGKey(5), bsz=2, l=37, d=24, n=8)
    args_r = args_f if shared else _make_inputs(
        jax.random.PRNGKey(6), bsz=2, l=37, d=24, n=8)
    yf, yr = selective_scan_dual(args_f, args_r, d_block=8, l_chunk=16)
    rf = selective_scan_ref(*args_f, delta_softplus=True)
    rr = selective_scan_ref(*args_r, delta_softplus=True, reverse=True)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(rf),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(rr),
                               rtol=2e-5, atol=2e-5)


def test_dual_scan_grads_shared_inputs():
    """v1 pattern: the same tensors feed both directions; cotangents must
    sum correctly through the dual op."""
    from aum_tpu.ops.selective_scan import selective_scan_dual

    args = _make_inputs(jax.random.PRNGKey(7), bsz=1, l=21, d=16, n=8)

    def loss_dual(*a):
        yf, yr = selective_scan_dual(a, a, d_block=8, l_chunk=8)
        return jnp.sum(jnp.sin(yf + yr))

    def loss_ref(*a):
        yf = selective_scan_ref(*a, delta_softplus=True)
        yr = selective_scan_ref(*a, delta_softplus=True, reverse=True)
        return jnp.sum(jnp.sin(yf + yr))

    gk = jax.grad(loss_dual, argnums=tuple(range(8)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    for name, a_, b_ in zip("u delta A B C D z bias".split(), gk, gr):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=3e-4, atol=3e-4,
                                   err_msg=f"grad {name}")


@pytest.mark.parametrize("shared", [True, False])
def test_fused_dual_backward_matches_two_pass(shared, monkeypatch):
    """The fused dual-direction backward kernel (AUM_SCAN_DUAL_BWD=1;
    default-off after v5e measurement showed the two-pass form faster) must
    produce identical grads to the two-pass backward."""
    from aum_tpu.ops.selective_scan import selective_scan_dual

    args_f = _make_inputs(jax.random.PRNGKey(8), bsz=2, l=37, d=24, n=8)
    args_r = args_f if shared else _make_inputs(
        jax.random.PRNGKey(9), bsz=2, l=37, d=24, n=8)

    def loss(*flat):
        yf, yr = selective_scan_dual(flat[:8], flat[8:], d_block=8,
                                     l_chunk=16)
        return jnp.sum(jnp.sin(yf + 2 * yr))

    gfn = jax.grad(loss, argnums=tuple(range(16)))
    monkeypatch.setenv("AUM_SCAN_DUAL_BWD", "0")
    ref = [np.asarray(g) for g in gfn(*args_f, *args_r)]
    monkeypatch.setenv("AUM_SCAN_DUAL_BWD", "1")
    got = [np.asarray(g) for g in gfn(*args_f, *args_r)]
    for i, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(g, r, rtol=2e-5, atol=2e-5,
                                   err_msg=f"grad #{i}")


def test_fused_loop_backward_matches_v1(monkeypatch):
    """The fused-loop backward kernel (AUM_SCAN_BWD_FUSED=1; default-off
    after v5e measurement — see _bwd_kernel_fused docstring) must produce
    the same grads as the chunk-vectorized v1 backward."""
    from aum_tpu.ops.selective_scan import selective_scan

    u, delta, A, B, C, D, z, bias = _make_inputs(
        jax.random.PRNGKey(10), bsz=2, l=37, d=24, n=8)

    def loss(*flat):
        y = selective_scan(*flat, delta_softplus=True, d_block=8, l_chunk=16,
                           use_kernel=True)
        return jnp.sum(jnp.cos(y))

    gfn = jax.grad(loss, argnums=tuple(range(8)))
    monkeypatch.setenv("AUM_SCAN_BWD_FUSED", "0")
    ref = [np.asarray(g) for g in gfn(u, delta, A, B, C, D, z, bias)]
    monkeypatch.setenv("AUM_SCAN_BWD_FUSED", "1")
    got = [np.asarray(g) for g in gfn(u, delta, A, B, C, D, z, bias)]
    for i, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(g, r, rtol=2e-5, atol=2e-5,
                                   err_msg=f"grad #{i}")


@pytest.mark.parametrize("shared", [True, False])
def test_direct_dual_forward_matches_staged(shared, monkeypatch):
    """The direct-streaming dual forward (AUM_SCAN_DIRECT=1; default-off
    after v5e measurement showed Mosaic spills the unrolled per-step
    temporaries — see _fwd_kernel_dual_direct docstring) must match the
    staged kernel, including reverse-overhang masking and the save_states
    port the backward consumes."""
    from aum_tpu.ops.selective_scan import selective_scan_dual

    args_f = _make_inputs(jax.random.PRNGKey(11), bsz=2, l=37, d=24, n=8)
    args_r = args_f if shared else _make_inputs(
        jax.random.PRNGKey(12), bsz=2, l=37, d=24, n=8)

    def loss(*flat):
        yf, yr = selective_scan_dual(flat[:8], flat[8:], d_block=8,
                                     l_chunk=16)
        return jnp.sum(jnp.sin(yf + 2 * yr))

    gfn = jax.grad(loss, argnums=tuple(range(16)))
    monkeypatch.setenv("AUM_SCAN_DIRECT", "0")
    yf0, yr0 = selective_scan_dual(args_f, args_r, d_block=8, l_chunk=16)
    ref = [np.asarray(g) for g in gfn(*args_f, *args_r)]
    monkeypatch.setenv("AUM_SCAN_DIRECT", "1")
    yf1, yr1 = selective_scan_dual(args_f, args_r, d_block=8, l_chunk=16)
    got = [np.asarray(g) for g in gfn(*args_f, *args_r)]
    np.testing.assert_allclose(np.asarray(yf1), np.asarray(yf0),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(yr1), np.asarray(yr0),
                               rtol=2e-5, atol=2e-5)
    for i, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(g, r, rtol=2e-5, atol=2e-5,
                                   err_msg=f"grad #{i}")


def _make_fold_inputs(key, bsz=2, l=37, d=24, n=8, r=6, dtype=jnp.float32):
    """Inputs for the dt_fold (in-kernel dt_proj) path: delta is replaced
    by the (B, L, R) dt-rank slice + the (R, D) dt_proj weight."""
    ks = jax.random.split(key, 9)
    u = jax.random.normal(ks[0], (bsz, l, d), dtype)
    dtr = jax.random.normal(ks[1], (bsz, l, r), dtype) * 0.5
    wdt = jax.random.normal(ks[8], (r, d), dtype) * 0.4
    A = -jnp.exp(jax.random.normal(ks[2], (d, n), jnp.float32) * 0.5)
    B = jax.random.normal(ks[3], (bsz, l, n), dtype)
    C = jax.random.normal(ks[4], (bsz, l, n), dtype)
    D = jax.random.normal(ks[5], (d,), jnp.float32)
    z = jax.random.normal(ks[6], (bsz, l, d), dtype)
    bias = jax.random.normal(ks[7], (d,), jnp.float32) * 0.3
    return u, dtr, wdt, A, B, C, D, z, bias


@pytest.mark.parametrize("shared", [True, False])
def test_dual_scan_dt_fold_matches_oracle(shared):
    """In-kernel dt_proj (dt_fold, VERDICT r2 #2): the primal kernel that
    computes softplus(dtr @ wdt + bias) itself must match the oracle fed
    the materialized delta."""
    from aum_tpu.ops.selective_scan import selective_scan_dual

    u, dtr, wdt, A, B, C, D, z, bias = _make_fold_inputs(
        jax.random.PRNGKey(13))
    if shared:
        dtr2, wdt2, A2 = dtr, wdt, A
    else:
        dtr2 = jax.random.normal(jax.random.PRNGKey(14), dtr.shape) * 0.5
        wdt2 = jax.random.normal(jax.random.PRNGKey(15), wdt.shape) * 0.4
        A2 = A * 0.7
    args_f = (u, None, A, B, C, D, z, bias)
    args_r = (u, None, A2, B, C, D, z, bias)
    yf, yr = selective_scan_dual(args_f, args_r, d_block=8, l_chunk=16,
                                 dt_fold=((dtr, wdt), (dtr2, wdt2)))
    rf = selective_scan_ref(u, dtr @ wdt, A, B, C, D, z, bias,
                            delta_softplus=True)
    rr = selective_scan_ref(u, dtr2 @ wdt2, A2, B, C, D, z, bias,
                            delta_softplus=True, reverse=True)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(rf),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(rr),
                               rtol=2e-5, atol=2e-5)


def test_dual_scan_dt_fold_grads():
    """dt_fold grads (shared v1 pattern: one dtr/wdt feeds both
    directions): the matmul chain rule in dual_bwd must match
    differentiating the oracle through the explicit matmul."""
    from aum_tpu.ops.selective_scan import selective_scan_dual

    u, dtr, wdt, A, B, C, D, z, bias = _make_fold_inputs(
        jax.random.PRNGKey(16), bsz=1, l=21, d=16, n=8, r=4)

    def loss_fold(u, dtr, wdt, A, B, C, D, z, bias):
        yf, yr = selective_scan_dual(
            (u, None, A, B, C, D, z, bias), (u, None, A, B, C, D, z, bias),
            d_block=8, l_chunk=8, dt_fold=((dtr, wdt), (dtr, wdt)))
        return jnp.sum(jnp.sin(yf + 2 * yr))

    def loss_ref(u, dtr, wdt, A, B, C, D, z, bias):
        delta = dtr @ wdt
        yf = selective_scan_ref(u, delta, A, B, C, D, z, bias,
                                delta_softplus=True)
        yr = selective_scan_ref(u, delta, A, B, C, D, z, bias,
                                delta_softplus=True, reverse=True)
        return jnp.sum(jnp.sin(yf + 2 * yr))

    args = (u, dtr, wdt, A, B, C, D, z, bias)
    gk = jax.grad(loss_fold, argnums=tuple(range(9)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    for name, a_, b_ in zip("u dtr wdt A B C D z bias".split(), gk, gr):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=3e-4, atol=3e-4,
                                   err_msg=f"grad {name}")


def test_dual_scan_dt_fold_jnp_fallback():
    """use_kernel=False with dt_fold materializes delta and matches the
    kernel path."""
    from aum_tpu.ops.selective_scan import selective_scan_dual

    u, dtr, wdt, A, B, C, D, z, bias = _make_fold_inputs(
        jax.random.PRNGKey(17))
    args = (u, None, A, B, C, D, z, bias)
    fold = ((dtr, wdt), (dtr, wdt))
    yf0, yr0 = selective_scan_dual(args, args, d_block=8, l_chunk=16,
                                   dt_fold=fold)
    yf1, yr1 = selective_scan_dual(args, args, use_kernel=False,
                                   dt_fold=fold)
    np.testing.assert_allclose(np.asarray(yf0), np.asarray(yf1),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(yr0), np.asarray(yr1),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shared", [True, False])
def test_dual_scan_bf16_stage_matches_oracle(shared, monkeypatch):
    """bf16 scratch staging (AUM_SCAN_BF16_STAGE=1, VERDICT r2 #4): the
    dual kernel staging its chunk operands (dt·log2e, dt·u, B, C) in bf16
    scratch must track the fp32-staged kernel within bf16 rounding (the
    output dtype is bf16 anyway, so ~1e-2 is the noise floor — interpret
    mode measured 6.7e-3 at these shapes) and leave fp32 runs untouched."""
    from aum_tpu.ops.selective_scan import selective_scan_dual

    args_f = _make_inputs(jax.random.PRNGKey(21), bsz=2, l=37, d=24, n=8,
                          dtype=jnp.bfloat16)
    args_r = args_f if shared else _make_inputs(
        jax.random.PRNGKey(22), bsz=2, l=37, d=24, n=8, dtype=jnp.bfloat16)
    monkeypatch.setenv("AUM_SCAN_BF16_STAGE", "0")
    yf0, yr0 = selective_scan_dual(args_f, args_r, d_block=8, l_chunk=16)
    monkeypatch.setenv("AUM_SCAN_BF16_STAGE", "1")
    yf1, yr1 = selective_scan_dual(args_f, args_r, d_block=8, l_chunk=16)
    assert yf1.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(yf1, np.float32),
                               np.asarray(yf0, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(yr1, np.float32),
                               np.asarray(yr0, np.float32),
                               rtol=2e-2, atol=2e-2)
    # Differentiable with the knob on: the custom_vjp backward reads the
    # fp32-prepped residuals, so grads stay at the unstaged path's accuracy.
    # Linear loss => the incoming cotangent is exactly 1 on both paths (a
    # quadratic would feed each path ITS OWN bf16-rounded y as cotangent,
    # amplifying the forward's rounding into the comparison); what remains
    # differing is only the staged forward's saved boundary states.
    def loss(uf, ur):
        a_f = (uf,) + args_f[1:]
        a_r = (ur,) + args_r[1:]
        yf, yr = selective_scan_dual(a_f, a_r, d_block=8, l_chunk=16)
        return jnp.sum((yf + yr).astype(jnp.float32))

    g1 = jax.grad(loss, argnums=(0, 1))(args_f[0], args_r[0])
    monkeypatch.setenv("AUM_SCAN_BF16_STAGE", "0")
    g0 = jax.grad(loss, argnums=(0, 1))(args_f[0], args_r[0])
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=5e-2, atol=5e-2)


def test_dual_scan_bf16_stage_noop_on_fp32():
    """The knob must not change fp32 runs (staging degenerates to fp32)."""
    import os

    from aum_tpu.ops.selective_scan import selective_scan_dual

    args = _make_inputs(jax.random.PRNGKey(23), bsz=2, l=37, d=24, n=8)
    os.environ["AUM_SCAN_BF16_STAGE"] = "1"
    try:
        y1 = selective_scan_dual(args, args, d_block=8, l_chunk=16)
    finally:
        os.environ.pop("AUM_SCAN_BF16_STAGE", None)
    y0 = selective_scan_dual(args, args, d_block=8, l_chunk=16)
    np.testing.assert_allclose(np.asarray(y1[0]), np.asarray(y0[0]),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(y1[1]), np.asarray(y0[1]),
                               rtol=0, atol=0)


def test_ssd_factored_form_matches_oracle():
    """The chunked-matmul (SSD) feasibility prototype (docs/ROOFLINE.md
    "The chunked-matmul (SSD) route") is exact vs the oracle at range-safe
    dt — keeps the memo's correctness claim reproducible."""
    from aum_tpu.ops.scan_ref import selective_scan_ref
    from scripts.ssd_probe import make_args, ssd_factored_fwd

    u, delta, A, B, C, D, z, db = make_args(2, 64, 48, 8, dt_scale=0.3)
    ref = selective_scan_ref(u, delta, A, B, C, D, z, db,
                             delta_softplus=True)
    for lc in (16, 64):
        got = ssd_factored_fwd(u, delta, A, B, C, D, z, db, lc=lc)
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err / float(jnp.max(jnp.abs(ref))) < 2e-4, (lc, err)
